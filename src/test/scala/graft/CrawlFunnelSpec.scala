package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/**
 * The crawl funnel's fuzzy near-dup tier under a planted exact
 * mega-cluster — the failure mode real crawls hit hardest: K copies of
 * one boilerplate template share identical MinHash signatures, so an
 * UNCOLLAPSED band self-join lands K rows in the same bucket in every
 * band (K²/2 candidate pairs on one skewed key). `crawlFuzzy` must
 * (a) collapse the cluster to its min-id representative BEFORE the band
 * table exists, and (b) return exactly the dropped-id set the
 * uncollapsed plan would have produced (the collapse is a plan
 * optimization, never a semantics change — the q214/q215 oracles replay
 * the uncollapsed rule).
 */
class CrawlFunnelSpec extends SparkSpec {
  import spark.implicits._

  /** Independent witness: the UNCOLLAPSED fuzzy tier — signatures over
    * ALL docs, band self-join, signature-agreement refine, later doc of
    * a pair dropped. (The plan the funnel shipped before the collapse;
    * the oracle SQL replays exactly this.) */
  private def uncollapsedDropped(docs: DataFrame): Set[Long] = {
    import graft.operators.Dedup
    val sig = Dedup.minHashSignatures(docs, TextQueries.CrawlShingleN,
      TextQueries.CrawlPerms, "doc_id", "content")
    val bands = Dedup.lshBands(sig, TextQueries.CrawlBands,
      TextQueries.CrawlPerms / TextQueries.CrawlBands)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
      .join(sig.select(col("id").as("ida"), col("sig").as("siga")), Seq("ida"))
      .join(sig.select(col("id").as("idb"), col("sig").as("sigb")), Seq("idb"))
      .where(Dedup.estSim(col("siga"), col("sigb"), TextQueries.CrawlPerms)
        >= TextQueries.CrawlEstSim)
      .select(col("idb")).distinct().collect().map(_.getLong(0)).toSet
  }

  private val Template = "the quick brown fox jumps over the lazy dog " +
    "while seventeen startled pheasants scatter across the frozen meadow " +
    "under a pale winter moon tonight"

  private def fixture: DataFrame = {
    val copies = (1L to 20L).map(i => (i, Template))
    val shorts = (30L to 34L).map(i => (i, "too short")) // < n tokens: no shingles
    val uniques = (40L to 44L).map(i =>
      (i, s"unique document body number $i with plenty of distinct words ${i * 7} ${i * 13}"))
    val near = Seq((50L, Template + " tail")) // near-dup of the template cluster
    (copies ++ shorts ++ uniques ++ near).toDF("doc_id", "content")
  }

  test("planted 20-copy mega-cluster: band table collapses to the representative") {
    val (bands, _) = TextQueries.crawlFuzzy(fixture)
    // the cluster contributes ONE member (its min-id rep) to each band —
    // uncollapsed it would put 20 rows in the same bucket of EVERY band
    // (4 × C(20,2) = 760 self-join hits before distinct)
    bands.where(col("id") <= 20L).count() shouldBe TextQueries.CrawlBands.toLong
    // collapsed candidates: the cluster may still pair through its REP
    // (the near-dup doc 50 must reach it), but no pair may have BOTH ids
    // inside the cluster — uncollapsed there would be C(20,2) = 190 such
    val intra = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .where(col("a.id") <= 20L && col("b.id") <= 20L)
      .select(col("a.id"), col("b.id")).distinct().count()
    intra shouldBe 0L
  }

  test("q232 plant law: hot chrome struck, under-gate notice kept, body restored") {
    import graft.operators.Dedup
    // 40 docs shaped like crawlCcnet's plant: unique body line + cookie
    // banner (df = 40 > gate) + newsletter bar on every third (df ≈ 13
    // > gate) + per-4-id-group notice (df ≤ 4 ≤ gate → must SURVIVE)
    val docs = (0L until 40L).map { i =>
      val body = s"unique page body number $i with words ${i * 7}"
      val news = if (i % 3 == 0) "\n" + TextQueries.CrawlBannerNews else ""
      (i, body + "\n" + TextQueries.CrawlBannerCookie + news +
        "\n" + TextQueries.CrawlNoticePrefix + (i / 4))
    }.toDF("doc_id", "content")
    val out = Dedup.lineDedup(docs, TextQueries.CrawlLineMaxDf,
        "doc_id", "content")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("content"))).toMap
    (0L until 40L).foreach { i =>
      val (nLines, nRemoved, text) = out(i)
      nLines shouldBe (if (i % 3 == 0) 4L else 3L)
      nRemoved shouldBe (if (i % 3 == 0) 2L else 1L)
      // struck text = body + the surviving notice, in original order —
      // the digest downstream re-keys on exactly this
      text shouldBe s"unique page body number $i with words ${i * 7}\n" +
        TextQueries.CrawlNoticePrefix + (i / 4)
    }
  }

  test("collapse is result-neutral: dropped set equals the uncollapsed witness") {
    val docs = fixture
    val (_, dropped) = TextQueries.crawlFuzzy(docs)
    val got = dropped.collect().map(_.getLong(0)).toSet
    got shouldBe uncollapsedDropped(docs)
    // and the semantics the witness encodes hold explicitly:
    assert((2L to 20L).forall(got), "shinglable copies must drop (rep witness, est 1.0)")
    assert(!got.contains(1L), "the min-id representative survives")
    assert((30L to 34L).forall(i => !got.contains(i)),
      "copies too short to shingle never carried a signature — never drop")
  }
}
