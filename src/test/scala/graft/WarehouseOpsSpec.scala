package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import graft.operators.{Bpe, Ids, Joins, Layout}

/** Witnesses for the warehouse/layout operators: Morton interleave,
  * Z-clustered layout, two-phase dense IDs, skew-salted join, and BPE
  * merge training. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Layout ------------------------------------------------------------

  test("zValue interleaves bits exactly (x even positions, y odd)") {
    // Hand-computed: x=5 (101), y=3 (011), bits=3 →
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    //   = 1 | 2 | 0 | 8 | 16 | 0 = 27
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .head()
    row.getLong(0) shouldBe 27L
  }

  test("zValue is a bijection on the bounded grid") {
    val n = 32
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val zs = grid.select(Layout.zValue(col("x"), col("y"), 5).as("z"))
    zs.distinct().count() shouldBe n.toLong * n
    val mm = zs.agg(min("z"), max("z")).head()
    mm.getLong(0) shouldBe 0L
    mm.getLong(1) shouldBe (n.toLong * n - 1)
  }

  test("clusterByZ bounds each partition's (x, y) rectangle") {
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val clustered = Layout.clusterByZ(grid, col("x"), col("y"), 6)
    // Partition-local z-ranges are contiguous and sorted: within every
    // partition z must be nondecreasing in row order.
    val ok = clustered.select(col("zv"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect()
    all(ok) shouldBe true
  }

  test("sizedClusteredWrite lands the computed file count, Z-clustered") {
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft_zw").toString
    val nFiles = graft.operators.Layout.sizedClusteredWrite(
      grid, col("x"), col("y"), 6, out, targetFileBytes = 16 * 1024)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.length shouldBe nFiles
    nFiles should be > 1
    // Each file covers a contiguous, non-overlapping z-range (the footer
    // stat a scan prunes on).
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("zv").as("lo"), max("zv").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => hi1 should be < lo2
      case _ => ()
    }
  }

  test("bloomFilteredWrite emits parquet blooms for exactly the requested columns; lookups stay exact") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val df = spark.range(0L, 2000L).select(
      col("id").as("k"), (col("id") * 7L % 1000L).as("v"))
    graft.operators.Layout.bloomFilteredWrite(df, out, Seq("k"), expectedNdv = 2000L)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(out)
    val file = p.getFileSystem(conf).listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val byPath = block.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
      // footer carries a bloom for k, none for v
      assert(byPath("k").getBloomFilterOffset >= 0,
        "requested column must carry a bloom filter")
      assert(byPath("v").getBloomFilterOffset < 0,
        "unrequested column must not pay bloom bytes")
      // the filter answers membership for every key in THIS file (no
      // false negatives; other part files carry their own blooms)
      val bf = reader.getBloomFilterDataReader(block).readBloomFilter(byPath("k"))
      val ids = spark.read.parquet(out)
        .where(input_file_name().contains(file.getName))
        .select("k").as[Long].collect()
      ids should not be empty
      ids.foreach(id => assert(bf.findHash(bf.hash(id))))
    } finally reader.close()
    // point lookup through the scan stays exact with the pushed predicate
    spark.read.parquet(out).where(col("k") === 1234L)
      .select("v").as[Long].collect().toSeq shouldBe Seq(1234L * 7L % 1000L)
    spark.read.parquet(out).where(col("k") === 999999L).count() shouldBe 0L
  }

  // ---- Ids ---------------------------------------------------------------

  test("denseIds is a dense 0-based permutation in the given order") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("payload"))
    val ids = Ids.denseIds(df, Seq(col("k")))
    val got = ids.orderBy("uid").select("uid", "k").as[(Long, Long)].collect()
    got.map(_._1).toSeq shouldBe (0L until 1000L)
    got.map(_._2).toSeq shouldBe got.map(_._2).sorted.toSeq
  }

  test("denseIds plans no single-partition exchange and no unpartitioned window") {
    val df = spark.range(1000).select(col("id").as("k"))
    val plan = Ids.denseIds(df, Seq(col("k"))).queryExecution.executedPlan
    val bad = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    bad shouldBe empty
  }

  // ---- saltedEquiJoin ----------------------------------------------------

  test("saltedEquiJoin equals the plain join row-for-row (skewed facts)") {
    // 900 rows on one hot key + 100 spread keys; dim covers half the keys.
    val facts = spark.range(1000).select(
      when(col("id") < 900, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("line"))
    val dim = spark.range(25).select(col("id").as("k"), (col("id") * 10).as("v"))
    val salted = Joins.saltedEquiJoin(facts, dim, "k", col("line"), salts = 8)
      .select("k", "line", "v").as[(Long, Long, Long)].collect().sorted
    val plain = facts.join(dim, "k")
      .select("k", "line", "v").as[(Long, Long, Long)].collect().sorted
    salted shouldBe plain
  }

  test("saltedEquiJoin spreads a hot key across salt buckets") {
    val facts = spark.range(1000).select(lit(7L).as("k"), col("id").as("line"))
    val dim = Seq((7L, 1L)).toDF("k", "v")
    // Re-derive the salt the operator assigns and count distinct values:
    // a hot key must occupy every bucket for the skew split to help.
    val nSalts = facts.withColumn("__salt",
        pmod(pmod(col("line"), lit(1000003L)) * lit(2654435761L), lit(8L)))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    nSalts shouldBe 8L
    Joins.saltedEquiJoin(facts, dim, "k", col("line"), 8).count() shouldBe 1000L
  }

  // ---- Bpe ---------------------------------------------------------------

  test("BPE greedy merge handles overlapping pairs left-to-right") {
    // Corpus "aaa": pairs (a,a) ×2 → merge 1 = (a,a). Greedy rewrite of
    // [a,a,a] gives [aa,a] (NOT [a,aa]), so round 2 sees (aa,a).
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(spark, docs, 2)
      .select("round", "lhs", "rhs", "cnt").as[(Long, String, String, Long)]
      .collect().sortBy(_._1)
    m(0) shouldBe ((1L, "a", "a", 2L))
    m(1) shouldBe ((2L, "aa", "a", 1L))
  }

  test("BPE weights pairs by word frequency and breaks ties lexicographically") {
    // "to" ×3, "go" ×2: pair (t,o)=3 beats (g,o)=2; after merging "to",
    // the next best is (g,o)=2.
    val docs = Seq((1L, "to to go"), (2L, "to go")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(spark, docs, 2)
      .select("round", "merged", "cnt").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    m(0) shouldBe ((1L, "to", 3L))
    m(1) shouldBe ((2L, "go", 2L))
  }

  test("BPE stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    Bpe.trainMerges(spark, docs, 5).count() shouldBe 0L
  }

  test("preTokenTable: category regex splits, case/space preserved, contractions split") {
    val docs = Seq((1L, "The cat won't stop, 42 cats!")).toDF("doc_id", "text")
    val words = Bpe.preTokenTable(docs)
      .select("word").as[String].collect().toSet
    // space-prefixed words are DISTINCT pre-tokens; contraction suffix
    // splits off; digit and punctuation runs are their own tokens
    words should contain allOf ("The", " cat", " won", "'t", " stop", ",", " 42", " cats", "!")
    words should not contain "won't"
  }

  test("preTokenTable byte fallback seeds non-ASCII chars as <0xNN> UTF-8 bytes") {
    val docs = Seq((1L, "café")).toDF("doc_id", "text")
    val toks = Bpe.preTokenTable(docs)
      .where($"word" === "café").select("toks").as[Seq[String]].head()
    // é = UTF-8 0xC3 0xA9 → two byte symbols; ASCII chars stay themselves
    toks shouldBe Seq("c", "a", "f", "<0xC3>", "<0xA9>")
  }

  test("merge machinery carries unchanged over the pre-token table") {
    // " to" ×3 dominates: first merge is (space, t) or (t, o) by count —
    // replicate by hand: toks(" to") = [" ", "t", "o"], pairs ( ,t)=3,
    // (t,o)=3, tie → lexicographic: " t" < "to" wins round 1.
    val docs = Seq((1L, "to to to")).toDF("doc_id", "text")
    // pre-tokens: "to" ×1 (first, no space), " to" ×2
    val m = Bpe.trainMergesFrom(spark, Bpe.preTokenTable(docs), 2)
      .select("round", "lhs", "rhs", "cnt").as[(Long, String, String, Long)]
      .collect().sortBy(_._1)
    // pairs: ("t","o") = 3 (all three), (" ","t") = 2 → (t,o) first
    m(0) shouldBe ((1L, "t", "o", 3L))
    m(1) shouldBe ((2L, " ", "to", 2L))
  }

  test("preTokenizerEval matches tokenizerEval's report shape on the pre-token stream") {
    val docs = Seq((1L, "en", "The cat"), (2L, "de", "Die Katze"))
      .toDF("doc_id", "lang", "text")
    val got = Bpe.preTokenizerEval(docs, Seq(("h", "e")))
      .select("lang", "n_words", "n_subwords", "n_chars")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // en: "The"(3ch) " cat"(4ch); de: "Die"(3ch) " Katze"(6ch)
    // merge (h,e): "The" → [T,he] 2 subwords; others unchanged
    got(0) shouldBe (("de", 2L, 9L, 9L))
    got(1) shouldBe (("en", 2L, 6L, 7L))
  }

  test("encodedIds assigns dense lexicographic piece ids and flattens in word order") {
    // merge (t,o): "to"→[to], "go"→[g,o], "tot"→[to,t]; distinct pieces
    // sorted: g=0, o=1, t=2, to=3
    val docs = Seq((1L, "to go tot"), (2L, "go go")).toDF("doc_id", "text")
    val got = Bpe.encodedIds(docs, Seq(("t", "o")))
      .orderBy("doc_id").select("ids").as[Seq[Long]].collect()
    got(0) shouldBe Seq(3L, 0L, 1L, 3L, 2L)
    got(1) shouldBe Seq(0L, 1L, 0L, 1L)
    // sequence length equals the count face for every document
    val lens = Bpe.encodedLengths(docs, Seq(("t", "o")))
      .orderBy("doc_id").select("n_subwords").as[Long].collect()
    got.map(_.size.toLong).toSeq shouldBe lens.toSeq
  }

  test("BPE trainMerges checkpointEvery yields the identical merge table") {
    val docs = Seq((1L, "to to go tog banana ban"), (2L, "to go banana"))
      .toDF("doc_id", "text")
    val plain = Bpe.trainMerges(spark, docs, 6)
      .select("round", "lhs", "rhs", "merged", "cnt")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val sealed_ = Bpe.trainMerges(spark, docs, 6, checkpointEvery = 2)
      .select("round", "lhs", "rhs", "merged", "cnt")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    sealed_ shouldBe plain
  }

  test("tokenizerEval reports per-language fertility and compression") {
    // merge (t,o): en "to to tog" → pieces to(1)+to(1)+[to,g](2) = 4
    // over 3 words / 7 chars; fr "go go" → [g,o]×2 = 4 pieces over
    // 2 words / 4 chars.
    val docs = Seq(
      (1L, "to to tog", "en"), (2L, "go go", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = Bpe.tokenizerEval(docs, Seq(("t", "o")))
      .orderBy("lang")
      .select("lang", "n_words", "n_subwords", "n_chars", "fertility",
        "chars_per_piece")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    got(0) shouldBe (("en", 3L, 4L, 7L, 1.333333, 1.75))
    got(1) shouldBe (("fr", 2L, 4L, 4L, 2.0, 1.0))
  }

  test("BPE encode reports sequence lengths under the learned merges") {
    // Merges (t,o) then (g,o): "to"→1 subword, "go"→1, "tog"→[to,g]→2.
    val docs = Seq((1L, "to to go tog"), (2L, "to go")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(spark, docs, 2)
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    val got = Bpe.encodedLengths(docs, ms)
      .select("doc_id", "n_words", "n_subwords").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    got(0) shouldBe ((1L, 4L, 5L)) // to(1) to(1) go(1) tog(2)
    got(1) shouldBe ((2L, 2L, 2L))
  }

  test("epochOrder: every epoch is a full permutation, steps globally dense") {
    val n = 40
    val df = (1L to n.toLong).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val out = graft.operators.Layout.epochOrder(df, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 3 * n
    out.map(_._3).sorted.toSeq shouldBe (0L until 3L * n).toSeq
    (0L to 2L).foreach { e =>
      val ids = out.filter(_._1 == e).map(_._2)
      ids.sorted.toSeq shouldBe (1L to n.toLong).toSeq
      // epoch blocks are contiguous in step order
      val steps = out.filter(_._1 == e).map(_._3)
      steps.min shouldBe e * n
      steps.max shouldBe (e + 1) * n - 1
    }
  }

  test("epochOrder: epochs differ, reruns and partitionings agree") {
    val df = (1L to 64L).map(i => (i, i)).toDF("doc_id", "x")
    def order(d: org.apache.spark.sql.DataFrame, e: Long) =
      graft.operators.Layout.epochOrder(d, "doc_id", 2)
        .where(col("epoch") === e).orderBy("step")
        .collect().map(_.getLong(1)).toSeq
    val e0 = order(df, 0L)
    val e1 = order(df, 1L)
    e0 should not be e1 // different epoch → different visit order
    e0 should not be (1L to 64L).toSeq // and not the identity order
    order(df.repartition(7), 0L) shouldBe e0 // layout-independent
    order(df, 0L) shouldBe e0 // rerun-stable
  }
}
