package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.util.Random
import graft.operators.{Bpe, Drift, Ids, Joins}

/** Seeded randomized witnesses: each new operator checked against an
  * independent in-memory reference implementation over random inputs
  * (deterministic seeds — failures reproduce). */
class FuzzOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy BPE over a token-list word table: overlapping
    * adjacent pair counts, (cnt DESC, lhs, rhs) argmax, left-to-right
    * merge continuing AFTER each replacement. */
  private def refBpe(texts: Seq[String], nMerges: Int,
                     maxLen: Int): Seq[(Long, String, String, Long)] = {
    val words = mutable.Map.empty[List[String], Long].withDefaultValue(0L)
    for (t <- texts; w <- t.toLowerCase.split("[^a-z]+") if w.nonEmpty && w.length <= maxLen)
      words(w.map(_.toString).toList) += 1L
    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var state = words.toMap
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((ts, f) <- state; Seq(a, b) <- ts.sliding(2) if ts.length >= 2)
        counts((a, b)) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((round.toLong, l, r, c))
        def merge(ts: List[String]): List[String] = ts match {
          case a :: b :: rest if a == l && b == r => (l + r) :: merge(rest)
          case a :: rest => a :: merge(rest)
          case Nil => Nil
        }
        state = state.groupMapReduce { case (ts, _) => merge(ts) } { case (_, f) => f }(_ + _)
        round += 1
      }
    }
    out.toSeq
  }

  test("BPE matches the reference implementation on random corpora (seeds 1-5)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val alphabet = "abc"
      def word() = Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(3))).mkString
      val texts = Seq.fill(8)(Seq.fill(6)(word()).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.trainMerges(spark, docs, 4)
        .select("round", "lhs", "rhs", "cnt").as[(Long, String, String, Long)]
        .collect().sortBy(_._1).toSeq
      got shouldBe refBpe(texts, 4, 12)
    }
  }

  test("denseIds equals row_number on random shuffled keys (seeds 1-3)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val keys = rnd.shuffle((0L until 500L).toVector)
      val df = keys.toDF("k")
      val got = Ids.denseIds(df, Seq(col("k")))
        .select("k", "uid").as[(Long, Long)].collect().toMap
      keys.sorted.zipWithIndex.foreach { case (k, i) =>
        got(k) shouldBe i.toLong
      }
    }
  }

  test("saltedEquiJoin equals the plain join on random skewed logs (seeds 1-3)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // Zipf-ish: 70% of rows on 3 hot keys, rest uniform over 40.
      val facts = (0 until 800).map { i =>
        val k = if (rnd.nextDouble() < 0.7) rnd.nextInt(3).toLong
                else rnd.nextInt(40).toLong
        (k, i.toLong)
      }.toDF("k", "line")
      val dim = (0L until 40L).map(k => (k, k * 7)).toDF("k", "v")
      val salts = 1 + rnd.nextInt(8)
      val salted = Joins.saltedEquiJoin(facts, dim, "k", col("line"), salts)
        .select("k", "line", "v").as[(Long, Long, Long)].collect().sorted.toSeq
      val plain = facts.join(dim, "k")
        .select("k", "line", "v").as[(Long, Long, Long)].collect().sorted.toSeq
      salted shouldBe plain
    }
  }

  test("psiBins matches a direct computation on random data (seeds 1-3)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val base = Seq.fill(600)(rnd.nextInt(200).toLong)
      val cur = Seq.fill(400)((rnd.nextInt(150) + 30).toLong)
      val nBins = 5; val width = 40L
      def binned(vs: Seq[Long]) = vs.groupBy(v => math.min(nBins - 1L, math.max(0L, v / width)))
        .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
      val (bb, cc) = (binned(base), binned(cur))
      val expTotal = (0L until nBins).map { i =>
        val p = (bb(i) + 1.0) / (base.size + nBins.toDouble)
        val q = (cc(i) + 1.0) / (cur.size + nBins.toDouble)
        (q - p) * math.log(q / p)
      }.sum
      val got = Drift.psiBins(base.toDF("v"), cur.toDF("v"), "v", width, nBins)
      got.count() shouldBe nBins.toLong
      val gotTotal = got.select("psi_total").head().getDouble(0)
      approx(gotTotal, math.rint(expTotal * 1e6) / 1e6, 2e-6) shouldBe true
      got.select("bin", "n_base").as[(Long, Long)].collect().foreach {
        case (b, n) => n shouldBe bb(b)
      }
    }
  }
}
