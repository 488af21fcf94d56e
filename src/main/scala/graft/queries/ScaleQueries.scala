package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-machinery queries (SURVEY §2.11): interchange formats beyond
 * parquet/CSV/JSONL, sketch aggregates with in-engine accuracy gates, and
 * explicit join-pruning structures. These operators exist FOR the 100 TB
 * case; the oracles gate their exactness (round-trips, bloom-pruned
 * joins) or their measured accuracy (sketches vs the exact answer).
 */
object ScaleQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-J2: ORC round-trip — write a lineitem projection as ORC, read
    // it back. Columnar handover from Hive-era warehouses; the oracle is
    // the original table, so the round-trip must be byte-exact.
    "q68_orc_roundtrip" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_orc")
      val d = Tables.read(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"))
      graft.sources.Sources.saveOrc(d, out)
      graft.sources.Sources.orc(s, out)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // EXT-J4: WARC round-trip — the crawl-corpus front door. Stage every
    // document as a WARC response record (payload deliberately embeds a
    // fake `WARC/1.0` header + CRLFs, so Content-Length framing — not
    // magic-scanning — is what the oracle certifies), write with the
    // distributed per-partition sink, re-read via the binaryFile-backed
    // record parser. The oracle recomputes url/ts/type/length/md5
    // directly from `documents`: any framing slip shifts payload bytes
    // and breaks the md5 row-for-row.
    "q152_warc_roundtrip" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
      val crlf = lit("\r\n")
      val staged = d.select(
        concat(lit("http://crawl.test/doc/"), col("doc_id").cast("string")).as("url"),
        lit("2026-01-01T00:00:00Z").as("ts"),
        concat(lit("body: "), col("text"), crlf, crlf,
          lit("WARC/1.0"), crlf, lit("tail "), col("n_chars").cast("string"))
          .as("payload"))
      val out = graft.core.Scratch.dir("graft_warc")
      graft.sources.Warc.save(staged, out)
      graft.sources.Warc.read(s, out)
        .select(col("url"), col("ts"), col("warc_type"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
        .orderBy(col("url"))
    }),

    // EXT-X1: sketch profile with an in-engine accuracy gate — HLL++
    // approx-distinct (rsd 2%) and approx-percentile vs their exact
    // counterparts, per group. At 100 TB the sketches are the only
    // affordable path (fixed-size partial state, one pass, no expand);
    // this query MEASURES that they stay within tolerance, the same way
    // q41 gates ANN recall. The oracle pins the exact values and expects
    // both gates to hold (literal TRUE).
    //
    // The exact sides are deliberately NOT `countDistinct` + `percentile`
    // in one agg — that plans an Expand (row count × aggregates) feeding
    // a SortAggregate whose percentile buffer drags every value into the
    // handful of group partitions (measured 10.6s at sf0.1, the
    // workload's worst query). Instead: exact distinct count via a
    // two-level agg (partial distinct map-side), and the exact
    // interpolated median from a (group, value) HISTOGRAM — quantity has
    // ~50 distinct values, so the window/interpolation runs on ≤50 rows
    // per group while every full-data pass stays a map-side-combinable
    // hash agg. Same outputs, same oracle, ~5× faster.
    "q69_sketch_profile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.read(s, dir, "lineitem")
      val sketches = li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("hll"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("apx_p50"))
      val exactParts = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
      val hist = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      // Continuous-interpolation median (percentile/quantile_cont
      // semantics): target rank r = (n+1)/2 over the value-ordered
      // cumulative counts; interpolate between the values at ⌊r⌋ and ⌈r⌉.
      val med = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("l_returnflag"))))
        .groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") >= floor((col("n") + 1) / 2.0), col("l_quantity")))
            .as("vlow"),
          min(when(col("cum") >= ceil((col("n") + 1) / 2.0), col("l_quantity")))
            .as("vhigh"),
          ((max(col("n")) + 1) / 2.0 - floor((max(col("n")) + 1) / 2.0)).as("frac"))
        .select(col("l_returnflag"),
          (col("vlow") + col("frac") * (col("vhigh") - col("vlow"))).as("exact_p50"))
      exactParts.join(sketches, Seq("l_returnflag")).join(med, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("hll").cast("double") / col("exact_parts") - 1.0) <= 0.1)
            .as("hll_ok"),
          round(col("exact_p50"), 6).as("exact_p50"),
          (abs(col("apx_p50") - col("exact_p50")) <= 1.0).as("p50_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // EXT-X8: declarative data-quality constraint checks (the Deequ
    // tier) — the gate run before training jobs consume a landed table:
    // completeness, key uniqueness, referential integrity (both fact→dim
    // edges), value bounds, non-emptiness. One aggregate per check, one
    // anti-join per FK edge; verdicts compare exact counts.
    "q166_data_quality" -> ((s, dir) => {
      import graft.operators.DataQuality._
      val orders = Tables.read(s, dir, "orders")
      val customer = Tables.read(s, dir, "customer")
      val li = Tables.read(s, dir, "lineitem")
      report(Seq(
        nullFracCheck(orders, "o_custkey", "orders.o_custkey"),
        uniqueCheck(orders, "o_orderkey", "orders.o_orderkey"),
        fkCheck(orders, "o_custkey", customer, "c_custkey",
          "orders.o_custkey->customer.c_custkey"),
        fkCheck(li, "l_orderkey", orders, "o_orderkey",
          "lineitem.l_orderkey->orders.o_orderkey"),
        minBoundCheck(orders, "o_totalprice", 0.0, "orders.o_totalprice"),
        rowCountCheck(li, 1L, "lineitem")))
    }),

    // EXT-C10: bloom-pruned semi-join — lineitem pruned by the small-part
    // key set BELOW its shuffle via a broadcast bloom filter, then
    // exactly semi-joined (false positives removed). Result is identical
    // to the plain semi-join; the bloom only cuts what the exchange
    // carries.
    "q71_bloom_prune" -> ((s, dir) =>
      graft.operators.Joins.bloomSemiJoin(
          Tables.read(s, dir, "lineitem"),
          Tables.read(s, dir, "part").where(col("p_size") <= 5),
          "l_partkey", "p_partkey", expectedKeys = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
        .orderBy(col("l_returnflag"))),

    // EXT-C11: bucket-decomposed interval containment join — validity
    // windows derived from part (overlapping: width 10..353 at 50-apart
    // starts, so a point can land in several), probe points derived from
    // lineitem. The equi-join on bucket id + residual filter replaces the
    // BroadcastNestedLoopJoin Spark would otherwise plan; per-range
    // aggregate keeps the gate output compact while pinning every
    // containment decision (a wrong pair moves some range's count or
    // extrema).
    // EXT-X2: exact grouped quantiles from the value histogram — the
    // q69 rewrite generalized into an operator: every full-data pass is
    // a map-side hash agg on (group, value); rank/interpolation windows
    // run over the tiny histogram. The EXACT path that stays cheap when
    // value cardinality allows (l_quantity: ~50 distinct values).
    "q86_exact_quantiles" -> ((s, dir) =>
      graft.operators.Profiling.histQuantiles(
          Tables.read(s, dir, "lineitem"), "l_returnflag", "l_quantity",
          Seq(0.25, 0.5, 0.75, 0.9))
        .select(col("l_returnflag"), round(col("p"), 2).as("p"),
          round(col("q"), 6).as("q"))
        .orderBy(col("l_returnflag"), col("p"))),

    // EXT-C14: star-schema analytical join — revenue per nation over
    // lineitem ⋈ orders ⋈ customer ⋈ nation. The declarative plan lets
    // Catalyst order the joins and AQE broadcast every dimension side;
    // only the fact table streams. Money is quantized to integer cents
    // BEFORE the sum (floor of the identical stored double is
    // engine-deterministic; a 240k-term double sum rounded afterwards is
    // not), so the aggregate is exact integer arithmetic: revenue in
    // 10^-4 currency units.
    "q90_star_join" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .join(Tables.read(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.read(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.read(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100).cast("long")))
            .as("revenue_c4"))
        .orderBy(col("n_name"))),

    // EXT-X4: count-min-sketch heavy hitters with an in-engine accuracy
    // gate — exact top-10 part keys by row count, each CMS estimate
    // checked against the sketch's (ε, δ) contract: estimate ≥ exact and
    // estimate ≤ exact + ε·N. One distributed pass builds the sketch
    // (fixed-size state, the 100 TB shape); the oracle pins the exact
    // counts and expects the gate to hold (literal TRUE, like q69/q41).
    // CAVEAT on the TRUE pin: the upper bound holds per key only with
    // probability ≥ δ = 0.99 — the gate is deterministic for seed 42 on
    // the CURRENT fixture (verified at every SF the driver runs), but a
    // fixture or scale change can legitimately flip a key without any
    // code bug; if that happens, loosen the gate to a bounded miss count
    // rather than chasing a phantom regression.
    "q91_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.read(s, dir, "lineitem")
      val eps = 0.001
      val cms = li.stat.countMinSketch(col("l_partkey"), eps, 0.99, 42)
      val total = li.count()
      val top = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_rows"))
        .orderBy(col("n_rows").desc, col("l_partkey")).limit(10)
        .as[(Long, Long)].collect()
      top.map { case (k, n) =>
        val est = cms.estimateCount(k)
        (k, n, est >= n && est <= n + (eps * total).toLong)
      }.toSeq.toDF("l_partkey", "n_rows", "cms_ok")
        .orderBy(col("n_rows").desc, col("l_partkey"))
    }),

    // EXT-X3: IQR outlier fences — Tukey fences per group from the exact
    // histogram quantiles (EXT-X2 composed), then one map-side pass
    // counting rows outside [q1 − 1.5·IQR, q3 + 1.5·IQR]; a deterministic
    // slice of inflated quantities plants real outliers the oracle
    // replicates. The numeric-hygiene filter of a data pipeline.
    "q88_outlier_fences" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem").select(col("l_returnflag"),
        when(col("l_orderkey") % 997 === 0, col("l_quantity") * 10)
          .otherwise(col("l_quantity")).as("qv"))
      val qs = graft.operators.Profiling.histQuantiles(
          li, "l_returnflag", "qv", Seq(0.25, 0.75))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("p") === 0.25, col("q"))).as("q1"),
          min(when(col("p") === 0.75, col("q"))).as("q3"))
        .select(col("l_returnflag"), col("q1"), col("q3"),
          (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
          (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
      li.join(broadcast(qs), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("q1")).as("q1"), min(col("q3")).as("q3"),
          count(when(col("qv") < col("lo") || col("qv") > col("hi"), 1))
            .as("n_outliers"))
        .select(col("l_returnflag"), round(col("q1"), 6).as("q1"),
          round(col("q3"), 6).as("q3"), col("n_outliers"))
        .orderBy(col("l_returnflag"))
    }),

    // EXT-J3: partitioned dataset write + pruned scan — write documents
    // hive-partitioned by language, read back ONE partition; the filter
    // must resolve at PLANNING time (PartitionFilters, guarded in
    // PlanShapeSpec) so a 100 TB corpus scan touches only the requested
    // language's files.
    "q89_partitioned_scan" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_part")
      Tables.read(s, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .where(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // EXT-C12: corpus snapshot diff — the audit face of incremental
    // ingest: classify every doc id across two snapshot derivations as
    // added/removed/changed/unchanged by content digest. Bodies never
    // shuffle — each side reduces to (id, md5) map-side, then ONE
    // full-outer hash join on the id.
    "q81_snapshot_diff" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
      val base = d.where(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" OLD")))
            .otherwise(col("text")).as("text"))
      val current = d.where(col("doc_id") % 13 =!= 0)
      graft.operators.Snapshots.diff(base, current)
        .orderBy(col("doc_id"))
    }),

    // EXT-C13: the SAME interval join as q73 but written as declarative
    // SQL — the IntervalJoinRewrite optimizer rule (injected via
    // SparkSessionExtensions) turns the `p >= lo AND p < hi` theta join
    // into the bucket-decomposed equi join automatically; the oracle
    // gates that the rewritten plan computes the identical answer.
    "q82_interval_sql" -> ((s, dir) => {
      Tables.read(s, dir, "part").select(
          col("p_partkey").as("range_id"),
          (col("p_partkey") * 50L).as("lo"),
          (col("p_partkey") * 50L + col("p_size") * 7L + lit(3L)).as("hi"))
        .createOrReplaceTempView("g_ranges")
      Tables.read(s, dir, "lineitem").select(
          (col("l_partkey") * 50L +
            pmod(col("l_orderkey") * 13L + col("l_linenumber") * 29L, lit(400L)))
            .as("v"))
        .createOrReplaceTempView("g_points")
      s.sql("""SELECT range_id, COUNT(*) AS n_points,
               |       MIN(v) AS v_min, MAX(v) AS v_max
               |FROM g_points p JOIN g_ranges r ON p.v >= r.lo AND p.v < r.hi
               |GROUP BY range_id ORDER BY range_id""".stripMargin)
    }),

    // EXT-C13 closed-bound face: the same declarative interval join
    // written as BETWEEN — real SQL writes closed bounds constantly, and
    // round 3's rule only fired on the half-open `>= lo AND < hi` shape.
    // The widened trigger (any orientation, strict or closed bounds)
    // decomposes this too; the oracle gates the identical answer.
    "q100_interval_between" -> ((s, dir) => {
      Tables.read(s, dir, "part").select(
          col("p_partkey").as("range_id"),
          (col("p_partkey") * 50L).as("lo"),
          (col("p_partkey") * 50L + col("p_size") * 7L + lit(3L)).as("hi"))
        .createOrReplaceTempView("g_ranges_cl")
      Tables.read(s, dir, "lineitem").select(
          (col("l_partkey") * 50L +
            pmod(col("l_orderkey") * 13L + col("l_linenumber") * 29L, lit(400L)))
            .as("v"))
        .createOrReplaceTempView("g_points_cl")
      s.sql("""SELECT range_id, COUNT(*) AS n_points,
               |       MIN(v) AS v_min, MAX(v) AS v_max
               |FROM g_points_cl p JOIN g_ranges_cl r
               |  ON p.v BETWEEN r.lo AND r.hi
               |GROUP BY range_id ORDER BY range_id""".stripMargin)
    }),

    "q73_interval_join" -> ((s, dir) => {
      val ranges = Tables.read(s, dir, "part").select(
        col("p_partkey").as("range_id"),
        (col("p_partkey") * 50L).as("lo"),
        (col("p_partkey") * 50L + col("p_size") * 7L + lit(3L)).as("hi"))
      val points = Tables.read(s, dir, "lineitem").select(
        (col("l_partkey") * 50L +
          pmod(col("l_orderkey") * 13L + col("l_linenumber") * 29L, lit(400L)))
          .as("v"))
      graft.operators.Joins.intervalJoin(points, ranges, "v", "lo", "hi", 64L)
        .groupBy(col("range_id"))
        .agg(count(lit(1)).as("n_points"),
          min(col("v")).as("v_min"), max(col("v")).as("v_max"))
        .orderBy(col("range_id"))
    }),

    // EXT-C20: hierarchical ROLLUP — detail, per-flag subtotal, and
    // grand total in ONE aggregation pass (Catalyst expands the grouping
    // sets inside a single Expand + hash aggregate; three separate
    // GROUP BYs would scan the fact table three times). The OLAP report
    // face of the engine; `grouping_id` disambiguates NULL-keyed
    // subtotal rows from genuine NULL keys.
    "q109_rollup_report" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // EXT-T24: edit-distance similarity join over the part-name
    // vocabulary — FastSS deletion-neighborhood blocking turns the
    // naive all-pairs `levenshtein <= 1` theta join into an equi join
    // (complete by the pigeonhole argument in FuzzyJoin's doc). The
    // oracle runs the NAIVE all-pairs join, so this gate is also a
    // machine-checked losslessness proof of the blocking.
    "q110_fuzzy_names" -> ((s, dir) =>
      graft.operators.FuzzyJoin.levenshtein1Pairs(
          Tables.read(s, dir, "part"), "p_name")
        .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
        .orderBy(col("name_a"), col("name_b"))),

    // EXT-C23: Z-order layout — Morton-interleave (l_partkey, l_suppkey)
    // into one clustering key and report each coarse Z-bucket's (x, y)
    // bounding rectangle. The per-bucket min/max spans ARE the file-skip
    // stats a clustered write would give every parquet footer: 64 buckets
    // each covering a 128×128 rectangle of the 1024×1024 key space, so a
    // predicate on EITHER dimension prunes ~7/8 of the files — the
    // two-dimensional layout a lexicographic sort cannot provide. The
    // Z-value is pure shift/mask arithmetic (codegen'd, no UDF); the
    // oracle re-derives the interleave bit by bit.
    "q115_zorder_layout" -> ((s, dir) => {
      val x = pmod(col("l_partkey"), lit(1024L))
      val y = pmod(col("l_suppkey"), lit(1024L))
      Tables.read(s, dir, "lineitem")
        .select(graft.operators.Layout.zValue(x, y, 10).as("zv"),
          x.as("x"), y.as("y"))
        .groupBy(shiftright(col("zv"), 14).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy(col("bucket"))
    }),

    // EXT-C24: skew-salted equi join — lineitem ⋈ orders with the fact
    // side's salt spreading every hot orderkey across 8 reducers and the
    // dim side replicated ×8. The oracle runs the NAIVE unsalted join,
    // so this gate is a machine-checked losslessness proof of the salting
    // (the q110 pattern): same aggregate, row for row.
    "q117_salted_join" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val o = Tables.read(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Joins.saltedEquiJoin(li, o, "l_orderkey",
          col("l_linenumber"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // EXT-C25: two-phase dense ID assignment — contiguous 0-based ids
    // over documents in (source, doc_id) order with NO single-partition
    // stage (range exchange + per-partition numbering + broadcast prefix
    // sum; the `monotonically_increasing_id`/global-window trap is the
    // thing this operator exists to avoid). The oracle is the flat
    // row_number() definition — a shape DuckDB can afford at oracle SF.
    "q118_dense_ids" -> ((s, dir) =>
      graft.operators.Ids.denseIds(
          Tables.read(s, dir, "documents").select(col("doc_id"), col("source")),
          Seq(col("source"), col("doc_id")))
        .select(col("uid"), col("doc_id"), col("source"))
        .orderBy(col("uid"))),

    // EXT-X6: distribution drift (population stability index) between
    // two corpus snapshots — the q81 snapshot convention (base = id%11≠0,
    // current = id%13≠0) over the document-length distribution, 10
    // equi-width bins, add-one smoothing. Per-bin decomposition plus the
    // headline PSI riding on every row. Two scans, O(bins) state —
    // the standing data-quality monitor ahead of any training run.
    "q121_psi_drift" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
      graft.operators.Drift.psiBins(
          d.where(pmod(col("doc_id"), lit(11L)) =!= 0L),
          d.where(pmod(col("doc_id"), lit(13L)) =!= 0L),
          "n_chars", binWidth = 60L, nBins = 10)
        .orderBy(col("bin"))
    }),

    // EXT-X7: fixed-iteration PageRank — 3 rounds of random-walk
    // importance over the symmetrized customer↔part co-purchase graph
    // (nodes keyed 2·custkey / 2·partkey+1). Per round: the edge list
    // meets the rank vector in ONE src-keyed shuffle and contributions
    // aggregate map-side by dst — the canonical iterative join/agg the
    // oracle unrolls as chained CTEs. Output: top-20 nodes by
    // N-normalized rank (mean ≈ 1), rounded before ranking.
    // EXT-X10: key-skew diagnosis — the measurement behind every
    // salting/AQE-skew decision: hot-key shares, exact tail-to-median
    // per-key-count ratio (histogram path, no full key sort), and the
    // Gini coefficient via the two-phase distributed rank. One report
    // row for the l_partkey join key.
    "q174_key_skew" -> ((s, dir) =>
      graft.operators.Profiling.keySkew(
        Tables.read(s, dir, "lineitem"), "l_partkey", topK = 10)),

    // EXT-T75: Zipf rank-frequency fit over the documents vocabulary —
    // the corpus-health law natural language obeys and template spam
    // bends: least-squares ln f vs ln r over the top-K terms, ranks via
    // the two-phase distributed rank (no unpartitioned window). One
    // report row; the oracle replays vocabulary, ranks, and the exact
    // regression arithmetic.
    "q229_zipf_fit" -> ((s, dir) =>
      graft.operators.Profiling.zipfFit(
        Tables.read(s, dir, "documents"), ZipfTopK)),

    // EXT-T76: Heaps' law vocabulary-growth fit — q229's companion:
    // V(n) ≈ K·n^β over content-stable consumption order; β near 0
    // flags a closed template vocabulary, near 1 token soup. First-doc
    // per token is a min-struct hash aggregate (never a per-token
    // window); both running sums ride the two-phase distributed form.
    "q230_heaps_fit" -> ((s, dir) =>
      graft.operators.Profiling.heapsFit(Tables.read(s, dir, "documents"))),

    // EXT-T77: corpus entropy-rate report — the predictability health
    // number beside q229/q230: unigram entropy, bigram conditional
    // entropy over within-doc pairs (context should predict — h_cond ≈
    // h_unigram flags token soup, abnormally low h_cond flags
    // boilerplate), and Shannon redundancy vs the uniform maximum.
    "q231_entropy_rate" -> ((s, dir) =>
      graft.operators.Profiling.entropyReport(Tables.read(s, dir, "documents"))),

    // EXT-T78: persisted token-count ledger — the corpus-health
    // dashboard at delta cost: unigram + within-doc bigram counts are
    // losslessly additive, so the base corpus persists once, each crawl
    // delta folds in one pass over the delta only, and the ledger-served
    // Zipf fit and entropy report EQUAL the one-shot q229/q231 laws over
    // the union (the q209 equality-law gate — exact-integer counts, so
    // the rank order is identical, not merely close). Heaps (q230) is
    // excluded by design: consumption-order-dependent, not additive.
    "q233_token_ledger" -> ((s, dir) => {
      import graft.store.TokenCountLedger
      val store = graft.core.Scratch.dir("graft_tokledger")
      val d = Tables.read(s, dir, "documents")
      TokenCountLedger.write(d.where(col("doc_id") % 4 =!= 1), store)
      TokenCountLedger.append(d.where(col("doc_id") % 4 === 1), store,
        batchName = Some("delta1"))
      TokenCountLedger.zipf(s, store, ZipfTopK)
        .crossJoin(TokenCountLedger.entropy(s, store))
    }),

    // EXT-X9: fixed-iteration synchronous label propagation — trusted
    // seed labels (clamped) spread along the customer–part co-purchase
    // graph; each round non-seed nodes adopt the majority neighbor
    // label, ties to the smallest. The semi-supervised host-spam /
    // quality-propagation primitive; fully deterministic, all 3 rounds
    // replayed as chained CTEs.
    "q173_label_prop" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val ord = Tables.read(s, dir, "orders")
      val cp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_partkey") * 2L + 1L).as("dst"))
        .distinct()
      val edges = cp.unionAll(cp.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ord.where(col("o_custkey") % 19 === 1)
        .select((col("o_custkey") * 2L).as("node"),
          (col("o_custkey") % 2).as("label"))
        .distinct()
      graft.operators.Graph.labelPropagation(edges, seeds, LpIters)
        .orderBy(col("node"))
    }),

    // EXT-X17: synchronous label-propagation community detection — the
    // community face the graph tier lacked: spam rings are dense
    // COMMUNITIES inside one giant component, invisible to q169's
    // connected components. Deterministic by construction (the q133
    // convention): own-id seeds, synchronous rounds, (count DESC,
    // label ASC) majority tie-break, fixed round count — the oracle
    // unrolls the identical rounds.
    "q238_communities" -> ((s, dir) => {
      graft.operators.Graph.communities(blockCoPurchaseEdges(s, dir), CommRounds,
          CommPhases)
        .orderBy(col("node"))
    }),

    // EXT-X18: Newman–Girvan modularity of the detected partition —
    // the report card for q238 (Q near 0 = chance, 0.3+ = real
    // structure): intra-community edge fraction minus its
    // configuration-model expectation, exact-integer counts with one
    // final division pass.
    "q239_modularity" -> ((s, dir) => {
      val cp = blockCoPurchaseEdges(s, dir)
      graft.operators.Graph.modularity(cp,
        graft.operators.Graph.communities(cp, CommRounds, CommPhases))
    }),

    // EXT-X16: HITS hubs-and-authorities over the DIRECTED customer→part
    // co-purchase graph (the q133 edge recipe before symmetrization —
    // HITS is the rank that NEEDS direction: hubs and authorities are
    // different roles). Sum-normalized rounds, unrolled in the oracle
    // like q133/q208; output mixes both sides by total score so the top
    // hubs and top authorities are gated together.
    "q228_hits" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val ord = Tables.read(s, dir, "orders")
      val cp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_partkey") * 2L + 1L).as("dst"))
        .distinct()
      graft.operators.Graph.hits(cp, PrIters)
        .select(col("node"), round(col("hub"), 6).as("hub"),
          round(col("authority"), 6).as("authority"))
        .orderBy((col("hub") + col("authority")).desc, col("node"))
        .limit(PrTopK)
    }),

    "q133_pagerank" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val ord = Tables.read(s, dir, "orders")
      val cp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_partkey") * 2L + 1L).as("dst"))
        .distinct()
      val edges = cp.unionAll(cp.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, PrIters)
        .select(col("node"), round(col("rank_rel"), 6).as("rank_rel"))
        .orderBy(col("rank_rel").desc, col("node"))
        .limit(PrTopK)
    }),

    // EXT-C30: deterministic multi-epoch shuffle order — the data-loader
    // step after the token-shard write (q187): each epoch visits the
    // corpus in a different hash-permutation order (pure function of
    // (id, epoch), no RNG state — rerun/partitioning/engine stable), and
    // `step` is the global consumption index assigned by the two-phase
    // distributed rank (no unpartitioned window, no driver sort).
    "q197_epoch_order" -> ((s, dir) =>
      graft.operators.Layout.epochOrder(
          Tables.read(s, dir, "documents"), "doc_id", ShuffleEpochs)
        .orderBy(col("step"))),

    // EXT-C31: persisted quantile-histogram ledger — incremental
    // distribution state (HdrHistogram log-linear buckets, ≤ ~1 k rows
    // per scope) under the versioned marker-last protocol: base write +
    // delta append, then store-served p50/p90/p99 gated in-engine
    // against the exact quantile (the q69/q191 pattern). Counts add
    // exactly, so the fold is LOSSLESS — ledger ≡ one-shot histogram of
    // the union (split-invariance spec-gated); the only approximation is
    // the fixed bucket width (midpoint read-off ≤ 1/32 of the value).
    "q200_quantile_ledger" -> ((s, dir) => {
      import graft.store.QuantileLedger
      val store = graft.core.Scratch.dir("graft_qledger")
      val li = Tables.read(s, dir, "lineitem").select(
        col("l_returnflag").as("scope"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_orderkey"))
      QuantileLedger.write(li.where(col("l_orderkey") % 4 =!= 0),
        store, "scope", "cents")
      QuantileLedger.append(li.where(col("l_orderkey") % 4 === 0),
        store, "scope", "cents", Some("d1"))
      val est = QuantileLedger.quantiles(s, store, QPs)
      val exact = graft.operators.Profiling.histQuantiles(
          li.select(col("scope"), col("cents")), "scope", "cents", QPs)
        .select(col("scope"), col("p"), col("q").as("q_exact"))
      est.join(exact, Seq("scope", "p"))
        .select(col("scope"), col("p"), col("n"),
          round(col("q_est"), 6).as("q_est"),
          round(col("q_exact"), 6).as("q_exact"),
          round(abs(col("q_est") - col("q_exact")) / col("q_exact"), 6)
            .as("rel_err"))
        .withColumn("within_bound", col("rel_err") <= QBound)
        .orderBy(col("scope"), col("p"))
    }),

    // EXT-C32: persisted count-min frequency ledger — the third
    // mergeable ledger (distinct = q191 HLL, quantiles = q200 histogram,
    // frequencies = this): relational CMS cells under the marker-last
    // protocol, base write + delta append (cell counts add — the fold is
    // lossless, CMS linearity), store-served point estimates for the
    // exact top-10 token panel gated one-sided (est ≥ exact always) with
    // the measured slack reported against the corpus size.
    "q201_cms_ledger" -> ((s, dir) => {
      import graft.store.FrequencyLedger
      import graft.functions.TextFunctions.tokensWs
      val store = graft.core.Scratch.dir("graft_cmsledger")
      val toks = Tables.read(s, dir, "documents")
        .select(col("doc_id"), explode(tokensWs(col("text"))).as("tok"))
      FrequencyLedger.write(toks.where(col("doc_id") % 2 === 0), store, "tok")
      FrequencyLedger.append(toks.where(col("doc_id") % 2 === 1), store,
        "tok", Some("d1"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      val panel = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(CmsTopK)
      val est = FrequencyLedger.estimates(s, store, panel, "tok")
        .select(col("key").as("tok"), col("est"))
      val total = toks.agg(count(lit(1)).as("n"))
      panel.join(est, Seq("tok")).crossJoin(broadcast(total))
        .select(col("tok"), col("exact_cnt"), col("est"),
          (col("est") >= col("exact_cnt")).as("over"),
          round((col("est") - col("exact_cnt")).cast("double")
            / col("n").cast("double"), 6).as("slack"))
        .withColumn("tight", col("slack") <= CmsSlackBound)
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // EXT-X12: degree-oriented triangle counting over the REPEAT
    // co-purchase graph (parts sharing ≥ 2 orders — one-off
    // co-occurrence is noise, and the threshold keeps the projection
    // sparse: ~3.4 avg degree here vs ~300 unthresholded). Orientation
    // bounds each node's wedge fan-out by its out-degree (≤ O(√m)) —
    // the move that keeps power-law hubs off a single reducer.
    "q205_triangles" -> ((s, dir) => {
      val p = Tables.read(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey"))
      val e = p.as("x").join(p.as("y"), Seq("o"))
        .where(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("o"), col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        .distinct()
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
        .where(col("c") >= TriMinOrders)
        .select(col("src"), col("dst"))
      graft.operators.Graph.triangleCounts(e)
        .orderBy(col("node"))
    }),

    // EXT-X14: personalized PageRank — random-walk-with-restart
    // relevance to a seed cohort over the symmetrized co-purchase graph
    // (q133's fixture, q173's seed rule): the teleport mass lands on the
    // seeds, so the top ranks ARE the cohort's recommendation
    // neighborhood. Same per-round shuffle bill as q133.
    "q208_ppr" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val ord = Tables.read(s, dir, "orders")
      val cp = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_partkey") * 2L + 1L).as("dst"))
        .distinct()
      val edges = cp.unionAll(cp.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ord.where(col("o_custkey") % 19 === 1)
        .select((col("o_custkey") * 2L).as("node")).distinct()
      graft.operators.Graph.personalizedPageRank(edges, seeds, PrIters)
        .select(col("node"), round(col("rank_rel"), 6).as("rank_rel"))
        .orderBy(col("rank_rel").desc, col("node"))
        .limit(PrTopK)
    })
  )

  private val ZipfTopK = 1000 // q229 fitted vocabulary head
  private val PrIters = 3 // q133 PageRank rounds
  private val CommRounds = 4 // q238/q239 community rounds (2 full sweeps)
  private val CommPhases = 2 // q238/q239 semi-sync color classes (even/odd
  // ids = the bipartite co-purchase sides, so oscillation cannot start)

  /** The q238/q239 community fixture: the co-purchase graph restricted
    * to PLANTED blocks — edge (c, p) survives iff c ≡ p (mod 4), plus a
    * 5% keyed-hash sprinkle of cross-block noise. The raw co-purchase
    * graph is dense and structureless (any detector correctly floods it
    * to one community, Q ≈ 0); the block plant gives the detector real
    * structure to recover and the modularity gate a non-trivial Q. */
  private def blockCoPurchaseEdges(s: SparkSession, dir: String) = {
    val li = Tables.read(s, dir, "lineitem")
    val ord = Tables.read(s, dir, "orders")
    // cacheOnce'd (r13): the build pays a fact join + a per-pair keyed
    // md5 — and q238's communities internals (e, nodes) and q239's
    // modularity canonicalization each consult the edge list through
    // projections too different for CacheManager subplan substitution
    // to unify, so without the source-level cache the build re-ran per
    // consumer (measured: 3-4× per query at sf0.1)
    graft.core.Caches.cacheOnce(
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .distinct()
        .where(col("ck") % 4 === col("pk") % 4 ||
          pmod(graft.functions.TextFunctions.hash60(
            concat_ws(":", col("ck"), col("pk"))), lit(20L)) === 0)
        .select((col("ck") * 2L).as("src"), (col("pk") * 2L + 1L).as("dst")))
  }
  private val PrTopK = 20 // q133 output size
  private val LpIters = 3 // q173 label-propagation rounds
  private val ShuffleEpochs = 3 // q197 training epochs
  private val QPs = Seq(0.5, 0.9, 0.99) // q200 served quantiles
  private val QBound = 0.07 // q200 relative-error gate (1/32 midpoint + rank slack)
  private val CmsTopK = 10 // q201 probe panel size
  private val CmsSlackBound = 0.02 // q201 collision-slack gate (vs E ≤ 1/Width)
  private val TriMinOrders = 2 // q205 repeat-co-purchase edge floor

  /** One label-propagation round as a CTE pair: labeled-neighbor counts
    * into nbN, the clamped-seed/majority label vector into lN. */
  /** One semi-synchronous community-LPA round (the q238/q239 chain):
    * the lpRound shape without seed clamping — only the round's phase
    * class (node mod phases = i mod phases) updates, the rest hold. */
  private def commRound(i: Int): String =
    s"""cnb$i AS MATERIALIZED (SELECT e.dst AS node, l.community, COUNT(*) AS c
       |         FROM ee e JOIN c${i - 1} l ON e.src = l.node GROUP BY 1, 2),
       |cmj$i AS MATERIALIZED (SELECT node, community FROM (
       |    SELECT node, community,
       |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, community)
       |        AS rnk
       |    FROM cnb$i) WHERE rnk = 1),
       |c$i AS MATERIALIZED (SELECT l.node,
       |        CASE WHEN l.node % $CommPhases = ${i % CommPhases}
       |             THEN COALESCE(m.community, l.community)
       |             ELSE l.community END AS community
       |        FROM c${i - 1} l LEFT JOIN cmj$i m USING (node))""".stripMargin

  /** The q238/q239 shared oracle prefix: the co-purchase graph,
    * symmetrized edges, own-id seeds, CommRounds unrolled rounds —
    * ending in `c$CommRounds(node, community)`. */
  private lazy val commCtes: String =
    s"""cp AS (SELECT ck * 2 AS src, pk * 2 + 1 AS dst FROM (
       |        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
       |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |      WHERE ck % 4 = pk % 4
       |         OR ('0x' || substr(md5(ck || ':' || pk), 1, 15))::BIGINT % 20 = 0),
       |ee AS (SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp),
       |nodes AS (SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM cp UNION ALL SELECT dst FROM cp)),
       |c0 AS (SELECT node, node AS community FROM nodes),
       |${(1 to CommRounds).map(commRound).mkString(",\n")}""".stripMargin

  private def lpRound(i: Int): String =
    s"""nb$i AS MATERIALIZED (SELECT e.dst AS node, l.label, COUNT(*) AS c
       |         FROM ee e JOIN l${i - 1} l ON e.src = l.node
       |         WHERE l.label IS NOT NULL GROUP BY 1, 2),
       |mj$i AS MATERIALIZED (SELECT node, label FROM (
       |    SELECT node, label,
       |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rnk
       |    FROM nb$i) WHERE rnk = 1),
       |l$i AS MATERIALIZED (SELECT n.node, COALESCE(s.label, m.label) AS label
       |        FROM nodes n LEFT JOIN seeds s USING (node)
       |        LEFT JOIN mj$i m ON n.node = m.node)""".stripMargin

  /** One PageRank round as a CTE pair: contributions into `cN`, the new
    * rank vector into `rN` (leaky formulation, damping 0.85). */
  private def hitsRound(i: Int): String = {
    val prev = s"h${i - 1}"
    s"""a$i AS MATERIALIZED (SELECT cp.dst AS node, SUM($prev.hub) AS authority
       |        FROM cp JOIN $prev ON cp.src = $prev.node GROUP BY 1),
       |h$i AS MATERIALIZED (SELECT cp.src AS node, SUM(a$i.authority) AS hub
       |        FROM cp JOIN a$i ON cp.dst = a$i.node GROUP BY 1)""".stripMargin
  }

  private def prRound(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS MATERIALIZED (SELECT ee.dst AS node, SUM($prev.rank / od.outdeg) AS m
       |        FROM ee JOIN $prev ON ee.src = $prev.node
       |                JOIN od ON ee.src = od.src
       |        GROUP BY 1),
       |r$i AS MATERIALIZED (SELECT nodes.node, 0.15 / nn.n + 0.85 * COALESCE(c$i.m, 0) AS rank
       |        FROM nodes LEFT JOIN c$i USING (node) CROSS JOIN nn)""".stripMargin
  }

  /** One unrolled personalized-PageRank round for the q208 oracle:
    * contributions as in q133, teleport onto the seed vector `tp`. */
  private def pprRound(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS MATERIALIZED (SELECT ee.dst AS node, SUM($prev.rank / od.outdeg) AS m
       |        FROM ee JOIN $prev ON ee.src = $prev.node
       |                JOIN od ON ee.src = od.src
       |        GROUP BY 1),
       |r$i AS MATERIALIZED (SELECT tp.node, 0.15 * tp.p + 0.85 * COALESCE(c$i.m, 0) AS rank
       |        FROM tp LEFT JOIN c$i USING (node))""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // Skew replay: per-key counts, top-k shares, quantile_cont ratio,
    // the Gini rank identity.
    "q174_key_skew" ->
      """WITH kc AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |tt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |              CAST(COUNT(*) AS BIGINT) AS n_keys FROM kc),
        |tp AS (SELECT MAX(c) AS top1, SUM(c) AS topk FROM (
        |    SELECT c FROM kc ORDER BY c DESC, k LIMIT 10)),
        |qs AS (SELECT quantile_cont(c, 0.5) AS p50,
        |              quantile_cont(c, 0.99) AS p99 FROM kc),
        |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS r FROM kc),
        |gn AS (SELECT SUM(r * c) AS rc FROM rk)
        |SELECT tt.n_rows, tt.n_keys,
        |  ROUND(tp.top1::DOUBLE / tt.n_rows::DOUBLE, 6) AS top1_share,
        |  ROUND(tp.topk::DOUBLE / tt.n_rows::DOUBLE, 6) AS topk_share,
        |  ROUND(qs.p99 / qs.p50, 6) AS p99_over_p50,
        |  ROUND(2.0 * gn.rc::DOUBLE / (tt.n_keys * tt.n_rows)::DOUBLE
        |        - (tt.n_keys + 1)::DOUBLE / tt.n_keys::DOUBLE, 6) AS gini
        |FROM tt, tp, qs, gn""".stripMargin,

    // Label-propagation replay: the bipartite co-purchase graph, sparse
    // clamped seeds, three majority rounds as chained CTEs.
    // Community replay: own-id seeds, CommRounds unrolled synchronous
    // majority rounds (no clamping — the lpRound chain's unseeded twin).
    "q238_communities" ->
      s"""WITH $commCtes
         |SELECT node, community FROM c$CommRounds ORDER BY node""".stripMargin,

    // Modularity replay: the same unrolled chain, then Newman–Girvan
    // Q = Σ_c (L_c/m − (vol_c/2m)²) in exact-integer counts.
    "q239_modularity" ->
      s"""WITH $commCtes,
         |canon AS (SELECT DISTINCT LEAST(src, dst) AS a,
         |            GREATEST(src, dst) AS b FROM cp),
         |mm AS (SELECT COUNT(*)::BIGINT AS m FROM canon),
         |dg AS (SELECT node, COUNT(*)::BIGINT AS deg FROM (
         |    SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
         |  GROUP BY 1),
         |vol AS (SELECT l.community, SUM(dg.deg)::BIGINT AS vol
         |        FROM dg JOIN c$CommRounds l ON dg.node = l.node GROUP BY 1),
         |intra AS (SELECT la.community, COUNT(*)::BIGINT AS lc
         |          FROM canon
         |          JOIN c$CommRounds la ON canon.a = la.node
         |          JOIN c$CommRounds lb ON canon.b = lb.node
         |          WHERE la.community = lb.community GROUP BY 1),
         |st AS (SELECT COUNT(DISTINCT node)::BIGINT AS n_nodes,
         |         COUNT(DISTINCT community)::BIGINT AS n_communities
         |       FROM c$CommRounds)
         |SELECT n_nodes, n_communities, m AS n_edges,
         |  ROUND(SUM(COALESCE(lc, 0)::DOUBLE / m::DOUBLE)
         |        - SUM(POW(vol::DOUBLE / (2 * m)::DOUBLE, 2)), 6) AS q
         |FROM vol LEFT JOIN intra USING (community)
         |CROSS JOIN mm CROSS JOIN st
         |GROUP BY n_nodes, n_communities, m""".stripMargin,

    "q173_label_prop" ->
      s"""WITH cp AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
         |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |ee AS (SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp),
         |nodes AS (SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM ee UNION ALL SELECT dst FROM ee)),
         |seeds AS (SELECT DISTINCT o_custkey * 2 AS node, o_custkey % 2 AS label
         |          FROM orders WHERE o_custkey % 19 = 1),
         |l0 AS (SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s USING (node)),
         |${(1 to LpIters).map(lpRound).mkString(",\n")}
         |SELECT node, label FROM l$LpIters ORDER BY node""".stripMargin,

    // Data-quality replay: one aggregate per check, anti-joins as
    // NOT-IN-with-NULL-guard, UNION ALL ordered by check name.
    "q166_data_quality" ->
      """SELECT "check", metric, passed FROM (
        |  SELECT 'null_frac:orders.o_custkey' AS "check",
        |    ROUND(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |      / GREATEST(COUNT(*), 1)::DOUBLE, 6) AS metric,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:orders.o_orderkey',
        |    ROUND(COUNT(DISTINCT o_orderkey)::DOUBLE
        |      / GREATEST(COUNT(*), 1)::DOUBLE, 6),
        |    COUNT(DISTINCT o_orderkey) = COUNT(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'fk:orders.o_custkey->customer.c_custkey',
        |    COUNT(*) FILTER (WHERE c IS NULL)::DOUBLE,
        |    COUNT(*) FILTER (WHERE c IS NULL) = 0
        |  FROM (SELECT c.c_custkey AS c FROM orders o
        |        LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'fk:lineitem.l_orderkey->orders.o_orderkey',
        |    COUNT(*) FILTER (WHERE k IS NULL)::DOUBLE,
        |    COUNT(*) FILTER (WHERE k IS NULL) = 0
        |  FROM (SELECT o.o_orderkey AS k FROM lineitem l
        |        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |  UNION ALL
        |  SELECT 'min_bound:orders.o_totalprice',
        |    COALESCE(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END), 0)::DOUBLE,
        |    COALESCE(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END), 0) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'row_count:lineitem', COUNT(*)::DOUBLE, COUNT(*) >= 1
        |  FROM lineitem)
        |ORDER BY "check"""".stripMargin,

    // Zipf replay: vocabulary counts, (count desc, term) ranks over the
    // top-K head, the exact least-squares arithmetic on (ln r, ln f).
    "q229_zipf_fit" ->
      s"""WITH toks AS (SELECT CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents),
         |vocab AS (SELECT tok, COUNT(*)::BIGINT AS cnt
         |          FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
         |head AS (SELECT tok, cnt,
         |           ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS r
         |         FROM vocab ORDER BY cnt DESC, tok LIMIT $ZipfTopK),
         |pts AS (SELECT ln(r::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM head),
         |s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         |             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
         |      FROM pts)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         |    AS intercept,
         |  ROUND(CASE WHEN n * syy - sy * sy = 0 THEN NULL
         |        ELSE POW(n * sxy - sx * sy, 2)
         |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
         |FROM s""".stripMargin,

    // Entropy replay: unigram distribution, within-doc bigram pairs,
    // left-context normalization, the exact nats arithmetic.
    "q231_entropy_rate" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents),
         |uni AS (SELECT w, COUNT(*)::BIGINT AS c
         |        FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
         |nt AS (SELECT SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS v FROM uni),
         |h1 AS (SELECT SUM(-(c::DOUBLE / nt.n) * ln(c::DOUBLE / nt.n)) AS h1
         |       FROM uni CROSS JOIN nt),
         |bi AS (SELECT a, b, COUNT(*)::BIGINT AS cab FROM (
         |    SELECT tk[i] AS a, tk[i + 1] AS b
         |    FROM toks, unnest(range(1, len(tk))) AS t(i)
         |    WHERE len(tk) >= 2) GROUP BY 1, 2),
         |lft AS (SELECT a, SUM(cab)::BIGINT AS cl FROM bi GROUP BY 1),
         |mt AS (SELECT SUM(cab)::BIGINT AS m FROM bi),
         |h2 AS (SELECT SUM(-(bi.cab::DOUBLE / mt.m)
         |         * ln(bi.cab::DOUBLE / lft.cl::DOUBLE)) AS h2
         |       FROM bi JOIN lft USING (a) CROSS JOIN mt)
         |SELECT COALESCE(nt.n, 0) AS n_tokens, COALESCE(mt.m, 0) AS n_bigrams,
         |  nt.v AS vocab, ROUND(h1.h1, 6) AS h_unigram, ROUND(h2.h2, 6) AS h_cond,
         |  ROUND(CASE WHEN nt.v <= 1 THEN NULL
         |        ELSE 1.0 - h1.h1 / ln(nt.v::DOUBLE) END, 6) AS redundancy
         |FROM nt CROSS JOIN h1 CROSS JOIN mt CROSS JOIN h2""".stripMargin,

    // Token-ledger replay: additive counts mean ledger-served == one-shot
    // over the union, so the oracle is exactly the q229 + q231 chains
    // over the FULL corpus, one row (the equality law IS the gate).
    "q233_token_ledger" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents),
         |vocab AS (SELECT tok, COUNT(*)::BIGINT AS cnt
         |          FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
         |head AS (SELECT tok, cnt,
         |           ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS r
         |         FROM vocab ORDER BY cnt DESC, tok LIMIT $ZipfTopK),
         |pts AS (SELECT ln(r::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM head),
         |zs AS (SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         |             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
         |      FROM pts),
         |zfit AS (SELECT CAST(n AS BIGINT) AS n_terms,
         |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         |    AS intercept,
         |  ROUND(CASE WHEN n * syy - sy * sy = 0 THEN NULL
         |        ELSE POW(n * sxy - sx * sy, 2)
         |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
         |FROM zs),
         |uni AS (SELECT tok AS w, cnt AS c FROM vocab),
         |nt AS (SELECT SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS v FROM uni),
         |h1 AS (SELECT SUM(-(c::DOUBLE / nt.n) * ln(c::DOUBLE / nt.n)) AS h1
         |       FROM uni CROSS JOIN nt),
         |bi AS (SELECT a, b, COUNT(*)::BIGINT AS cab FROM (
         |    SELECT tk[i] AS a, tk[i + 1] AS b
         |    FROM toks, unnest(range(1, len(tk))) AS t(i)
         |    WHERE len(tk) >= 2) GROUP BY 1, 2),
         |lft AS (SELECT a, SUM(cab)::BIGINT AS cl FROM bi GROUP BY 1),
         |mt AS (SELECT SUM(cab)::BIGINT AS m FROM bi),
         |h2 AS (SELECT SUM(-(bi.cab::DOUBLE / mt.m)
         |         * ln(bi.cab::DOUBLE / lft.cl::DOUBLE)) AS h2
         |       FROM bi JOIN lft USING (a) CROSS JOIN mt),
         |erep AS (SELECT COALESCE(nt.n, 0) AS n_tokens,
         |  COALESCE(mt.m, 0) AS n_bigrams,
         |  nt.v AS vocab, ROUND(h1.h1, 6) AS h_unigram, ROUND(h2.h2, 6) AS h_cond,
         |  ROUND(CASE WHEN nt.v <= 1 THEN NULL
         |        ELSE 1.0 - h1.h1 / ln(nt.v::DOUBLE) END, 6) AS redundancy
         |FROM nt CROSS JOIN h1 CROSS JOIN mt CROSS JOIN h2)
         |SELECT * FROM zfit CROSS JOIN erep""".stripMargin,

    // Heaps replay: content-stable doc order, per-token first doc via a
    // tok-partitioned rank, inclusive running token/vocab sums, the
    // exact least-squares arithmetic on (ln n, ln V).
    "q230_heaps_fit" ->
      s"""WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
         |         FROM documents),
         |d AS (SELECT doc_id,
         |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hv,
         |        len(tk)::BIGINT AS nt, tk FROM toks),
         |dt AS (SELECT DISTINCT doc_id, tok
         |       FROM (SELECT doc_id, unnest(tk) AS tok FROM d)),
         |fst AS (SELECT tok, doc_id FROM (
         |    SELECT t.tok, t.doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY t.tok
         |        ORDER BY d2.hv, t.doc_id) AS rn
         |    FROM dt t JOIN d d2 USING (doc_id)) WHERE rn = 1),
         |nw AS (SELECT doc_id, COUNT(*)::BIGINT AS nw FROM fst GROUP BY 1),
         |cum AS (SELECT d.doc_id,
         |    SUM(d.nt) OVER (ORDER BY d.hv, d.doc_id) AS n_i,
         |    SUM(COALESCE(nw.nw, 0)) OVER (ORDER BY d.hv, d.doc_id) AS v_i
         |  FROM d LEFT JOIN nw USING (doc_id)),
         |pts AS (SELECT ln(n_i::DOUBLE) AS x, ln(v_i::DOUBLE) AS y
         |        FROM cum WHERE n_i > 0),
         |s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         |             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
         |      FROM pts)
         |SELECT CAST(n AS BIGINT) AS n_points,
         |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         |    AS intercept,
         |  ROUND(CASE WHEN n * syy - sy * sy = 0 THEN NULL
         |        ELSE POW(n * sxy - sx * sy, 2)
         |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
         |FROM s""".stripMargin,

    // HITS replay: h0 uniform over hubs, each round a_i = normalized
    // in-sum of h_{i-1}, h_i = normalized out-sum of a_i (AS MATERIALIZED
    // — the chained rounds re-evaluate exponentially otherwise).
    "q228_hits" ->
      s"""WITH cp AS (SELECT DISTINCT o.o_custkey * 2 AS src,
         |                   l.l_partkey * 2 + 1 AS dst
         |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |hn AS (SELECT DISTINCT src AS node FROM cp),
         |an AS (SELECT DISTINCT dst AS node FROM cp),
         |nh AS (SELECT COUNT(*)::DOUBLE AS n FROM hn),
         |h0 AS MATERIALIZED (SELECT node, 1.0 / nh.n AS hub FROM hn CROSS JOIN nh),
         |${(1 to PrIters).map(hitsRound).mkString(",\n")},
         |sel AS (SELECT n.node,
         |               COALESCE(h$PrIters.hub, 0)
         |                 / (SELECT SUM(hub) FROM h$PrIters) AS hub,
         |               COALESCE(a$PrIters.authority, 0)
         |                 / (SELECT SUM(authority) FROM a$PrIters) AS authority
         |        FROM (SELECT node FROM hn UNION SELECT node FROM an) n
         |        LEFT JOIN h$PrIters USING (node) LEFT JOIN a$PrIters USING (node))
         |SELECT node, ROUND(hub, 6) AS hub, ROUND(authority, 6) AS authority
         |FROM sel ORDER BY ROUND(hub, 6) + ROUND(authority, 6) DESC, node
         |LIMIT $PrTopK""".stripMargin,

    "q133_pagerank" ->
      s"""WITH cp AS (SELECT DISTINCT o.o_custkey * 2 AS src,
         |                   l.l_partkey * 2 + 1 AS dst
         |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |ee AS (SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp),
         |nodes AS (SELECT DISTINCT src AS node FROM ee),
         |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
         |od AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM ee GROUP BY 1),
         |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
         |${(1 to PrIters).map(prRound).mkString(",\n")}
         |SELECT node, ROUND(r$PrIters.rank * nn.n, 6) AS rank_rel
         |FROM r$PrIters CROSS JOIN nn
         |ORDER BY rank_rel DESC, node LIMIT $PrTopK""".stripMargin,

    "q109_rollup_report" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    // The naive all-pairs join — deliberately NOT the blocked plan, so a
    // pair the deletion-neighborhood join missed would fail this gate.
    "q110_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b
        |  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,

    "q68_orc_roundtrip" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_returnflag, l_linestatus
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Reconstructs the staged WARC payload and its UTF-8 byte length /
    // md5 straight from `documents` — the round-trip must reproduce
    // every byte for the digests to agree.
    "q152_warc_roundtrip" ->
      """WITH staged AS (SELECT
        |  'http://crawl.test/doc/' || doc_id AS url,
        |  '2026-01-01T00:00:00Z' AS ts,
        |  'response' AS warc_type,
        |  'body: ' || text || chr(13) || chr(10) || chr(13) || chr(10) ||
        |    'WARC/1.0' || chr(13) || chr(10) || 'tail ' || n_chars AS payload
        |FROM documents)
        |SELECT url, ts, warc_type,
        |       CAST(strlen(payload) AS BIGINT) AS content_length,
        |       md5(payload) AS payload_md5
        |FROM staged ORDER BY url""".stripMargin,

    "q69_sketch_profile" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS hll_ok,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
        |  TRUE AS p50_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q71_bloom_prune" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q90_star_join" ->
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // cms_ok TRUE is a ≥ 0.99-probability contract pinned for seed 42 on
    // this fixture — see the q91 query comment before treating a flip as
    // an engine bug.
    "q91_heavy_hitters" ->
      """SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS cms_ok
        |FROM lineitem GROUP BY 1
        |ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin,

    "q88_outlier_fences" ->
      """WITH li AS (SELECT l_returnflag,
        |  CASE WHEN l_orderkey % 997 = 0 THEN l_quantity * 10
        |       ELSE l_quantity END AS qv FROM lineitem),
        |qs AS (SELECT l_returnflag,
        |         quantile_cont(qv, 0.25) AS q1,
        |         quantile_cont(qv, 0.75) AS q3
        |       FROM li GROUP BY 1)
        |SELECT li.l_returnflag, ROUND(q1, 6) AS q1, ROUND(q3, 6) AS q3,
        |  CAST(SUM(CASE WHEN qv < q1 - (q3 - q1) * 1.5
        |                  OR qv > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM li JOIN qs USING (l_returnflag)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q89_partitioned_scan" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,

    "q86_exact_quantiles" ->
      """SELECT l_returnflag, 0.25::DOUBLE AS p,
        |       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, 0.5::DOUBLE, ROUND(quantile_cont(l_quantity, 0.5), 6)
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, 0.75::DOUBLE, ROUND(quantile_cont(l_quantity, 0.75), 6)
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, 0.9::DOUBLE, ROUND(quantile_cont(l_quantity, 0.9), 6)
        |FROM lineitem GROUP BY 1
        |ORDER BY 1, 2""".stripMargin,

    "q81_snapshot_diff" ->
      """WITH base AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 7 = 0 THEN text || ' OLD' ELSE text END) AS bd
        |  FROM documents WHERE doc_id % 11 <> 0),
        |cur AS (SELECT doc_id, md5(text) AS cd
        |        FROM documents WHERE doc_id % 13 <> 0)
        |SELECT COALESCE(base.doc_id, cur.doc_id) AS doc_id,
        |  CASE WHEN bd IS NULL THEN 'added'
        |       WHEN cd IS NULL THEN 'removed'
        |       WHEN bd <> cd THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM base FULL OUTER JOIN cur ON base.doc_id = cur.doc_id
        |ORDER BY 1""".stripMargin,

    "q82_interval_sql" ->
      """WITH ranges AS (SELECT p_partkey AS range_id, p_partkey * 50 AS lo,
        |                       p_partkey * 50 + p_size * 7 + 3 AS hi FROM part),
        |points AS (SELECT l_partkey * 50 +
        |             (l_orderkey * 13 + l_linenumber * 29) % 400 AS v
        |           FROM lineitem)
        |SELECT r.range_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |       MIN(p.v) AS v_min, MAX(p.v) AS v_max
        |FROM points p JOIN ranges r ON p.v >= r.lo AND p.v < r.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q100_interval_between" ->
      """WITH ranges AS (SELECT p_partkey AS range_id, p_partkey * 50 AS lo,
        |                       p_partkey * 50 + p_size * 7 + 3 AS hi FROM part),
        |points AS (SELECT l_partkey * 50 +
        |             (l_orderkey * 13 + l_linenumber * 29) % 400 AS v
        |           FROM lineitem)
        |SELECT r.range_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |       MIN(p.v) AS v_min, MAX(p.v) AS v_max
        |FROM points p JOIN ranges r ON p.v BETWEEN r.lo AND r.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q73_interval_join" ->
      """WITH ranges AS (SELECT p_partkey AS range_id, p_partkey * 50 AS lo,
        |                       p_partkey * 50 + p_size * 7 + 3 AS hi FROM part),
        |points AS (SELECT l_partkey * 50 +
        |             (l_orderkey * 13 + l_linenumber * 29) % 400 AS v
        |           FROM lineitem)
        |SELECT r.range_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |       MIN(p.v) AS v_min, MAX(p.v) AS v_max
        |FROM points p JOIN ranges r ON p.v >= r.lo AND p.v < r.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q115_zorder_layout" ->
      s"""WITH xy AS (SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
         |            FROM lineitem)
         |SELECT (${zSql("x", "y", 10)}) >> 14 AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM xy GROUP BY 1 ORDER BY 1""".stripMargin,

    // Deliberately the NAIVE unsalted join — a fact row the salted plan
    // dropped or duplicated would fail this gate.
    "q117_salted_join" ->
      """SELECT o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       ROUND(SUM(l_quantity), 6) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q121_psi_drift" ->
      """WITH bins AS (SELECT unnest(range(0, 10))::BIGINT AS bin),
        |b AS (SELECT LEAST(9, GREATEST(0, n_chars // 60))::BIGINT AS bin,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM documents WHERE doc_id % 11 <> 0 GROUP BY 1),
        |c AS (SELECT LEAST(9, GREATEST(0, n_chars // 60))::BIGINT AS bin,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM documents WHERE doc_id % 13 <> 0 GROUP BY 1),
        |j AS (SELECT bins.bin, COALESCE(b.n, 0) AS n_base,
        |             COALESCE(c.n, 0) AS n_cur
        |      FROM bins LEFT JOIN b USING (bin) LEFT JOIN c USING (bin)),
        |tb AS (SELECT SUM(n_base)::DOUBLE AS tot_base FROM j),
        |tc AS (SELECT SUM(n_cur)::DOUBLE AS tot_cur FROM j),
        |e AS (SELECT bin, n_base, n_cur,
        |        (n_base + 1.0) / (tot_base + 10.0) AS p0,
        |        (n_cur + 1.0) / (tot_cur + 10.0) AS q0
        |      FROM j, tb, tc),
        |f AS (SELECT bin, n_base, n_cur, p0, q0,
        |        (q0 - p0) * ln(q0 / p0) AS c0 FROM e),
        |t AS (SELECT SUM(c0) AS pt FROM f)
        |SELECT bin, n_base, n_cur, ROUND(p0, 6) AS p, ROUND(q0, 6) AS q,
        |       ROUND(c0, 6) AS psi_contrib, ROUND(pt, 6) AS psi_total
        |FROM f, t ORDER BY bin""".stripMargin,

    // The flat definition the distributed two-phase rank must equal.
    "q118_dense_ids" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
        |         AS uid,
        |       doc_id, source
        |FROM documents ORDER BY uid""".stripMargin,

    // Epoch-shuffle replay: the hash-permutation key (hash60 reduced mod
    // 2^31−1, a = 2·epoch+1, b = 1000003·(epoch+1)) and the flat rank the
    // two-phase distributed numbering must equal.
    "q197_epoch_order" ->
      s"""WITH ep AS (SELECT doc_id, unnest(range(0, $ShuffleEpochs)) AS epoch
         |            FROM documents),
         |ky AS (SELECT doc_id, epoch,
         |  ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % 2147483647)
         |    * (epoch * 2 + 1) + (epoch + 1) * 1000003) % 2147483647 AS k
         |  FROM ep)
         |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
         |  CAST(row_number() OVER (ORDER BY epoch, k, doc_id) - 1 AS BIGINT)
         |    AS step
         |FROM ky ORDER BY step""".stripMargin,

    // Quantile-ledger replay: the fold is lossless (counts add), so the
    // served state ≡ the one-shot histogram of base ∪ delta = ALL of
    // lineitem; replay the log-linear bucket arithmetic, the
    // rank-over-cumulative selection, the midpoint read-off, and the
    // exact-quantile gate.
    "q200_quantile_ledger" -> {
      val ps = QPs.map(p =>
        s"""SELECT scope, ${p}::DOUBLE AS p,
           |       quantile_cont(cents, $p) AS q_exact
           |FROM lic GROUP BY 1""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH lic AS (SELECT l_returnflag AS scope,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
         |hb AS (SELECT scope,
         |  CASE WHEN cents <= 32 THEN cents
         |       ELSE CAST(32 + (length(bin(cents)) - 6) * 16
         |            + floor((cents::DOUBLE - power(2, length(bin(cents)) - 1))
         |                    / power(2, length(bin(cents)) - 5)) + 1 AS BIGINT)
         |  END AS bucket, count(*)::BIGINT AS cnt FROM lic GROUP BY 1, 2),
         |cm AS (SELECT scope, bucket, cnt,
         |        SUM(cnt) OVER (PARTITION BY scope ORDER BY bucket) AS cum,
         |        SUM(cnt) OVER (PARTITION BY scope) AS n FROM hb),
         |pv AS (SELECT unnest([${QPs.mkString(", ")}]) AS p),
         |sel AS (SELECT scope, p, MIN(bucket) AS qb, CAST(MAX(n) AS BIGINT) AS n
         |        FROM cm, pv
         |        WHERE cum::DOUBLE >= 1.0 + (n::DOUBLE - 1.0) * p GROUP BY 1, 2),
         |est AS (SELECT scope, p, n,
         |  CASE WHEN qb <= 32 THEN qb::DOUBLE
         |       ELSE power(2, floor((qb - 33) / 16.0) + 5)
         |          + ((qb - 33) % 16) * power(2, floor((qb - 33) / 16.0) + 1)
         |          + power(2, floor((qb - 33) / 16.0)) END AS q_est FROM sel),
         |ex AS ($ps)
         |SELECT e.scope, e.p, e.n, ROUND(e.q_est, 6) AS q_est,
         |  ROUND(x.q_exact, 6) AS q_exact,
         |  ROUND(ABS(e.q_est - x.q_exact) / x.q_exact, 6) AS rel_err,
         |  ROUND(ABS(e.q_est - x.q_exact) / x.q_exact, 6) <= $QBound
         |    AS within_bound
         |FROM est e JOIN ex x ON e.scope = x.scope AND e.p = x.p
         |ORDER BY e.scope, e.p""".stripMargin
    },

    // CMS-ledger replay: the fold is lossless (cell counts add), so the
    // served sketch ≡ one sketch of ALL tokens; replay the keyed-hash
    // cell placement, the min-over-rows estimate for the exact top-10
    // panel, and the one-sided + slack gates.
    "q201_cms_ledger" -> {
      val hashCol = "((('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647)" +
        " * (r * 2 + 1) + (r + 1) * 1000003) % 2147483647 % 1024"
      s"""WITH tk AS (SELECT doc_id, unnest(
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
         |  FROM documents),
         |nt AS (SELECT count(*)::DOUBLE AS n FROM tk),
         |ex AS (SELECT tok, count(*)::BIGINT AS exact_cnt FROM tk GROUP BY 1),
         |top AS (SELECT tok, exact_cnt FROM ex
         |        ORDER BY exact_cnt DESC, tok LIMIT $CmsTopK),
         |rc AS (SELECT r, $hashCol AS c, count(*)::BIGINT AS cnt
         |       FROM tk, range(0, 4) t(r) GROUP BY 1, 2),
         |pr AS (SELECT tok, exact_cnt, r, $hashCol AS c
         |       FROM top, range(0, 4) t(r)),
         |es AS (SELECT pr.tok, pr.exact_cnt,
         |         MIN(COALESCE(rc.cnt, 0)) AS est
         |       FROM pr LEFT JOIN rc ON pr.r = rc.r AND pr.c = rc.c
         |       GROUP BY 1, 2)
         |SELECT tok, exact_cnt, est, est >= exact_cnt AS over,
         |  ROUND((est - exact_cnt)::DOUBLE / nt.n, 6) AS slack,
         |  ROUND((est - exact_cnt)::DOUBLE / nt.n, 6) <= $CmsSlackBound AS tight
         |FROM es, nt ORDER BY exact_cnt DESC, tok""".stripMargin
    },

    // Triangle replay: repeat-co-purchase edges, (degree, id)-oriented,
    // wedge join closed against the oriented list, corners exploded.
    "q205_triangles" ->
      s"""WITH p AS (SELECT l_orderkey AS o, l_partkey FROM lineitem),
         |e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b, x.o
         |       FROM p x JOIN p y USING (o) WHERE x.l_partkey < y.l_partkey),
         |e AS (SELECT a, b FROM e0 GROUP BY 1, 2
         |      HAVING COUNT(*) >= $TriMinOrders),
         |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
         |d AS (SELECT a AS node, COUNT(*) AS dg FROM sym GROUP BY 1),
         |ori AS (SELECT
         |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN e.a ELSE e.b END AS u,
         |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN e.b ELSE e.a END AS v,
         |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN db.dg ELSE da.dg END AS dv
         |  FROM e JOIN d da ON e.a = da.node JOIN d db ON e.b = db.node),
         |w AS (SELECT o1.u, o1.v AS x, o2.v AS y
         |      FROM ori o1 JOIN ori o2 ON o1.u = o2.u
         |      WHERE (o1.dv, o1.v) < (o2.dv, o2.v)),
         |t AS (SELECT w.u, w.x, w.y FROM w
         |      JOIN ori ON ori.u = w.x AND ori.v = w.y),
         |corners AS (SELECT u AS node FROM t UNION ALL SELECT x FROM t
         |            UNION ALL SELECT y FROM t)
         |SELECT node, COUNT(*)::BIGINT AS n_tri FROM corners
         |GROUP BY 1 ORDER BY node""".stripMargin,

    "q208_ppr" ->
      s"""WITH cp AS (SELECT DISTINCT o.o_custkey * 2 AS src,
         |                   l.l_partkey * 2 + 1 AS dst
         |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |ee AS (SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp),
         |nodes AS (SELECT DISTINCT src AS node FROM ee),
         |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
         |od AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM ee GROUP BY 1),
         |sg AS (SELECT DISTINCT o_custkey * 2 AS node FROM orders
         |       WHERE o_custkey % 19 = 1),
         |sgi AS (SELECT sg.node FROM sg JOIN nodes USING (node)),
         |ns AS (SELECT COUNT(*)::DOUBLE AS ns FROM sgi),
         |tp AS (SELECT nodes.node,
         |         CASE WHEN sgi.node IS NOT NULL THEN 1.0 / ns.ns
         |              ELSE 0.0 END AS p
         |       FROM nodes LEFT JOIN sgi USING (node) CROSS JOIN ns),
         |r0 AS (SELECT node, p AS rank FROM tp),
         |${(1 to PrIters).map(pprRound).mkString(",\n")}
         |SELECT node, ROUND(r$PrIters.rank * nn.n, 6) AS rank_rel
         |FROM r$PrIters CROSS JOIN nn
         |ORDER BY rank_rel DESC, node LIMIT $PrTopK""".stripMargin
  )

  /** Morton-interleave of two `bits`-bit ints as portable SQL — the same
    * shift/mask arithmetic `Layout.zValue` plans, re-derived so the
    * oracle does not share code with the engine. */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
}
