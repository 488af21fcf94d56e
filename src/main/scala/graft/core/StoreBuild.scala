package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EP-2 store build over the FULL catalog — the reference's
 * `populate_similar_items` loop (`/root/reference/propius/data.py:116-149`)
 * semantics (per-item min-max scale of the COMPLETE correlation vector,
 * then keep neighbors with scaled score ≥ mean + k·σ) — WITHOUT ever
 * materializing the I×I matrix.
 *
 * The trick: split each item's full correlation vector into
 *
 *  - co-occurring partners (sparse — avg degree rows per item), whose
 *    correlations come from `Correlation.sparseCoMoments`; and
 *  - never-co-occurring partners, whose correlation has the CLOSED FORM
 *        corr(a,b) = (n·0 − sx_a·sx_b) / (den_a·den_b) = −u_a·u_b,
 *        u_i = sx_i / den_i,  den_i = √(n·sxx_i − sx_i²)
 *    — a product of per-item quantities. So the vector-wide statistics
 *    decompose:
 *        Σ corr   = Σ_sparse corr  − u_a·(U − u_a − Σ_sparse u_b)
 *        Σ corr²  = Σ_sparse corr² + u_a²·(V − u_a² − Σ_sparse u_b²)
 *        min corr = min(min_sparse, −u_a · max{u_b : b zero-partner})
 *        max corr = max(max_sparse, −u_a · min{u_b : b zero-partner})
 *    with U = Σ u, V = Σ u² over all non-degenerate items — one global
 *    row. Items with zero variance (den = 0) produce NULL correlations
 *    everywhere and are skipped, exactly like the windowed/pandas path.
 *
 * The zero-partner u-extrema are exact, not sampled: rank all items by u
 * (one global sort of the SMALL per-item stats table), then for each item
 * find the first rank not occupied by itself or a co-occurring partner —
 * a first-gap scan over its sparse partner list (two window passes over
 * the pair table). Because row_number is a total order monotone in u, the
 * first gap in the descending (ascending) ranking IS the zero-partner
 * max (min) u.
 *
 * Output rows are then produced from (a) the sparse pairs filtered by the
 * per-item threshold and (b) a zero-partner theta join that only runs for
 * items whose threshold dips below the best zero-pair score
 * (−u_a·min u ≥ rawThr): in real corpora the mean+k·σ cutoff sits above
 * the zero-pair band and this candidate set is EMPTY (verified at
 * sf0.01: 0 of 231k emitted rows are zero pairs), so the a-side is a
 * tiny broadcast and the join costs nothing. Total cost: the sparse
 * pipeline + one global sort of the item-stats table — linear in the
 * co-occurrence data, never I².
 *
 * Emitted scores use the IDENTICAL arithmetic (term order included) as
 * `Correlation.fullPairs` + `Neighbors.scaledStdDevThreshold`, so results
 * hash-match the windowed oracle after 1e-6 rounding.
 */
object StoreBuild {

  /** Catalog size above which the build switches to the distributed-rank /
    * shuffled-join plan (see `scaledNeighbors`). Below it, the per-item
    * stats table is broadcast anyway, so the single-partition sort is
    * already in the right cost class AND canonical-plan caching keeps
    * repeated builds cheap. 10⁷ items ≈ a few hundred MB of stats rows —
    * the edge of comfortable broadcast/sort-on-one-core territory. */
  val LargeCatalogThreshold: Long = 10L * 1000 * 1000

  /**
   * All-items store table: (item_a_id, item_b_id, scaled_score).
   *
   * `largeCatalog`: None (default) probes the non-degenerate item count
   * (one cheap count over the cached stats table — it materializes
   * exactly what every downstream branch consumes anyway) and switches
   * plans at `LargeCatalogThreshold`; Some(x) forces the choice. The two
   * plans are output-identical (spec-checked); they differ only in how
   * the CATALOG-sized structures are handled:
   *
   *  - small: global u-rank via one single-partition window over the
   *    per-item stats table, stats broadcast into every join;
   *  - large: two-phase distributed rank (range-partition by (u desc,
   *    item), per-partition row_number, join-based partition offsets —
   *    no single-partition stage anywhere, plan-shape-guarded) and
   *    shuffled stats joins instead of broadcasts.
   */
  def scaledNeighbors(crosstab0: DataFrame, k: Double = 2.0,
                      largeCatalog: Option[Boolean] = None,
                      itemPredicate: Option[Column] = None): DataFrame =
    fromCrosstab(crosstab0, k, largeCatalog, itemPredicate, None).neighbors

  /** All-items store build from a SUFFICIENT-STATISTICS snapshot
    * (`Incremental.Stats`) — the incremental-ingest composition: after a
    * delta update, the store refresh reuses the merged item-stat and
    * co-moment summaries instead of recomputing them from the cell table
    * (gated by q57 against the same full-rebuild oracle as q38).
    *
    * NOTE the refresh is inherently Ω(catalog co-occurrence data), never
    * Ω(delta): the mean+kσ-over-the-COMPLETE-vector semantics couples
    * every item to every other — corr(a,b) moves whenever b's stats (or
    * the context count n) move, and a's scaling bounds/threshold
    * aggregate over ALL partners — so an untouched item's emitted
    * row-set can change under a delta that never mentions it
    * (counterexample spec-gated in StoreBuildSpec). The delta-BOUNDED
    * production pattern is `touched`-selection refresh + stored rows
    * for the rest (bounded staleness, q177): pass `touched` to rebuild
    * only those item_a rows at |touched|×avg-degree emission cost (the
    * catalog-wide per-item stats table — 24 B/item — is still consulted,
    * as the closed form requires). */
  def scaledNeighborsFromStats(stats: Incremental.Stats, k: Double = 2.0,
                               largeCatalog: Option[Boolean] = None,
                               touched: Option[DataFrame] = None): DataFrame =
    new Build(pinPlan(stats.items), pinPlan(stats.co), pinPlan(stats.n),
      k, largeCatalog, None, touched).neighbors

  /** Cache a folded summary AND seal its lineage behind a leaf scan.
    *
    * An in-session `Incremental.update` produces summaries whose LOGICAL
    * plans reference the base snapshot's plans several times over; a
    * build that embeds those subtrees per consumer hands Catalyst a
    * multi-megabyte tree to analyze on EVERY action (measured: the
    * in-session q57 build planned 13k Exchange nodes / a 15.6 MB plan
    * string where the same data loaded from a saved snapshot planned 95
    * — the data was cached either way; the DRIVER was re-walking the
    * fold's plan). The lazy local checkpoint truncates the lineage to
    * the materialized partitions, so the build plans against three leaf
    * scans, like the loaded-snapshot path. Local (non-reliable)
    * checkpointing is the right tier: the summaries are cached
    * MEMORY_AND_DISK anyway, and a lost executor re-runs the fold —
    * durability across failures is `Incremental.save`'s job. */
  private def pinPlan(df: DataFrame): DataFrame = Caches.pinPlan(df)

  /** OP-20 at scale: per-item mean/σ of the COMPLETE correlation vector
    * (NULL-skipping, sample σ — exactly `avg`/`stddev_samp` over
    * `fullPairs`' dense vectors), computed from the same closed-form
    * decomposition as the store build — |selection| × avg-degree work,
    * never the |selection| × |catalog| dense table. Degenerate items
    * (den = 0: NULL correlation everywhere) keep their row with NULL
    * moments, matching the windowed pipeline's aggregate-over-all-NULLs.
    * Output: (item_a, mean_corr, std_corr). */
  def vectorMoments(crosstab0: DataFrame,
                    itemPredicate: Option[Column] = None,
                    largeCatalog: Option[Boolean] = None): DataFrame =
    fromCrosstab(crosstab0, 2.0, largeCatalog, itemPredicate, None).moments

  private def fromCrosstab(crosstab0: DataFrame, k: Double,
                           largeCatalog: Option[Boolean],
                           itemPredicate: Option[Column],
                           itemSet: Option[DataFrame]): Build = {
    val ct = Caches.cacheOnce(crosstab0)
    new Build(Correlation.itemStats(ct),
      Caches.cacheOnce(Correlation.sparseCoMoments(ct)),
      Correlation.nContexts(ct), k, largeCatalog, itemPredicate, itemSet)
  }

  /** The shared build: per-item stats (item, sx, sxx), upper-triangle
    * co-moments (item_a, item_b, sxy), 1-row context count.
    *
    * `itemPredicate` (over column `item`, like `Correlation.fullPairs`)
    * restricts the item_a SIDE ONLY — each selected item still scales and
    * thresholds against its COMPLETE vector (all items as partners), so
    * output rows equal `fullPairs(ct, pred) |> scaledStdDevThreshold`
    * filtered to the selection (spec: `StoreBuildSpec`). The pushdown
    * keeps the per-item_a stats shuffle and both emission branches at
    * |selection| × avg-degree instead of catalog × avg-degree, and —
    * unlike the fullPairs parity path — never materializes the
    * |selection| × |catalog| dense vector table, which is what OOM'd the
    * sf1 probe (800M cached rows for a 1/50 sample of a 200k catalog).
    * Partner stats, globals (ΣU/ΣV/|D|), and the zero-partner u-ranking
    * remain catalog-wide: they are what the closed form needs to stand in
    * for the absent dense vectors. */
  private final class Build(itemSt: DataFrame, co0: DataFrame, n0: DataFrame,
                            k: Double, largeCatalog: Option[Boolean],
                            itemPredicate: Option[Column],
                            itemSet: Option[DataFrame] = None) {
    val n1 = n0 // 1 row

    // item_a-side restriction, Column- or set-valued: the set form
    // (single-column `item` frame) is the delta-refresh face — a
    // LEFT SEMI join keyed on item, so the selection never needs to
    // fit in a driver-side IN-list. Both compose (predicate AND set).
    private def restrictItems(df: DataFrame): DataFrame = {
      val p = itemPredicate.map(df.where(_)).getOrElse(df)
      itemSet.map(s => p.join(s.select(col("item")), Seq("item"), "left_semi"))
        .getOrElse(p)
    }
    private val restricted = itemPredicate.nonEmpty || itemSet.nonEmpty

    // Per-item stats with den/u; D = non-degenerate items (den > 0).
    val d = Caches.cacheOnce(
      itemSt.crossJoin(broadcast(n1))
        .withColumn("den", sqrt(col("n") * col("sxx") - col("sx") * col("sx")))
        .where(col("den") > 0.0)
        .withColumn("u", col("sx") / col("den")))

    // item_a-side selection (complete-vector stats are per-item_a, so the
    // b-side/globals/ranking must stay catalog-wide regardless).
    val dSel = restrictItems(d)

    // One global row: ΣU, ΣV, |D|, min/max u.
    val globals = broadcast(d.agg(
      sum(col("u")).as("gU"), sum(col("u") * col("u")).as("gV"),
      count(lit(1)).as("cntD"), min(col("u")).as("uming")))

    // Catalog-size gate: the count runs over the CACHED stats table that
    // every downstream branch reads anyway, so the probe costs one cheap
    // job, not a recompute.
    val large = largeCatalog.getOrElse(d.count() > LargeCatalogThreshold)
    // Under the large-catalog plan, catalog-sized tables join SHUFFLED
    // instead of broadcast (1-row globals and the ~empty zero-pair
    // candidate set stay broadcast at any scale).
    def bcCat(df: DataFrame): DataFrame = if (large) df else broadcast(df)

    def corrCol(sxy: Column): Column = {
      val den = sqrt(col("n") * col("sxx_a") - col("sx_a") * col("sx_a")) *
        sqrt(col("n") * col("sxx_b") - col("sx_b") * col("sx_b"))
      when(den === 0.0 || isnan(den), lit(null).cast("double"))
        .otherwise((col("n") * sxy - col("sx_a") * col("sx_b")) / den)
    }

    val da = d.select(col("item").as("item_a"), col("sx").as("sx_a"),
      col("sxx").as("sxx_a"), col("u").as("u_a"))
    val db = d.select(col("item").as("item_b"), col("sx").as("sx_b"),
      col("sxx").as("sxx_b"), col("u").as("u_b"))

    // Sparse side: the UPPER-TRIANGLE co-moments arrive persisted (the
    // expensive ctx self-join, cached by the caller) — the narrowest
    // table that every consumer can rebuild its view from with
    // broadcast-only work. The symmetric closure and stat joins are
    // recomputed per consumer: map-side, no shuffle.
    val co = co0
    val sym = co.unionByName(
      co.select(col("item_b").as("item_a"), col("item_a").as("item_b"), col("sxy")))
    // The symmetric closure restricted to selected item_a (semi-join on the
    // small selection — the whole point of the pushdown: every downstream
    // shuffle carries |selection| × avg-degree rows). The zero-partner
    // anti-join below deliberately keeps the UNRESTRICTED sym: its left
    // side is already selection-only, and the full table is the correct
    // co-occurrence ledger either way.
    val symA =
      if (!restricted) sym
      else sym.join(bcCat(dSel.select(col("item").as("item_a"))), Seq("item_a"), "left_semi")
    // CACHED: the correlation pipeline feeds BOTH the fused stats shuffle
    // and the sparse-emission branch; as a `def` the symmetric closure +
    // two stat joins + corr arithmetic ran once per consumer (the probe
    // measured it as the dominant duplicated work in the q57 build —
    // ~2× the crosstab path's final-stage task time). The table is
    // (item_a, item_b, u_b, corr) — the same size class as the co-moment
    // cache it derives from.
    val sp = Caches.cacheOnce(symA.join(bcCat(da), Seq("item_a"))
      .join(bcCat(db), Seq("item_b"))
      .crossJoin(broadcast(n1))
      .select(col("item_a"), col("item_b"), col("u_b"),
        corrCol(col("sxy")).as("corr")))

    // Global u-ranking of D. r is descending in u; the ascending rank of
    // the same row is cntD+1−r, so ONE ranking serves both extrema.
    //
    // Small catalogs: one unpartitioned row_number window — a DELIBERATE
    // single-partition sort of the per-item stats table, the same table
    // the plan broadcasts anyway, so its size class is already bounded by
    // driver/executor memory and the sort is a negligible fraction of the
    // build. (The tempting orderBy + rdd.zipWithIndex produces an
    // RDD-backed plan with a fresh identity per call, which defeats
    // canonical-plan cache reuse across queries — measured 2× SLOWER
    // end-to-end.)
    //
    // Large catalogs: two-phase distributed rank. Range-partition by the
    // rank order, number rows per partition, then add each partition's
    // global offset (a join-based prefix sum over the ≤ shuffle-partition
    // count of per-partition totals — deliberately NOT a window, so no
    // single-partition stage exists anywhere in this plan). Correct for
    // ANY contiguous-range placement, so it does not depend on the range
    // sampler's exact bounds.
    val rkBase = {
      val du = d.select(col("item"), col("u"))
      if (!large)
        du.withColumn("r",
          row_number().over(Window.orderBy(col("u").desc, col("item").asc)).cast("long"))
      else {
        // Cached: feeds both the local numbering and the per-partition
        // counts; without it each consumer re-runs the range exchange.
        val parts = Caches.cacheOnce(
          du.repartitionByRange(col("u").desc, col("item").asc)
            .withColumn("pid", spark_partition_id()))
        val wLocal = Window.partitionBy(col("pid")).orderBy(col("u").desc, col("item").asc)
        val local = parts.withColumn("lr", row_number().over(wLocal).cast("long"))
        val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("pcnt"))
        val offs = counts.select(col("pid"), col("pcnt"))
          .join(broadcast(counts.select(col("pid").as("qid"), col("pcnt").as("qcnt"))),
            col("qid") < col("pid"), "left")
          .groupBy(col("pid")).agg(coalesce(sum(col("qcnt")), lit(0L)).as("off"))
        local.join(broadcast(offs), Seq("pid"))
          .select(col("item"), col("u"), (col("lr") + col("off")).as("r"))
      }
    }
    val rk = bcCat(rkBase)

    // ONE shuffle on item_a computes every per-item statistic: the sparse
    // moment aggregates (NULL-corr rows — degenerate partners and the
    // self row — excluded, matching NULL-skipping window stats) AND the
    // first-gap scan that locates the zero-partner u-extrema. The two
    // window sorts and the final aggregate share the same hash partitioning,
    // so Catalyst plans a single exchange. Self rows (corr = NULL) give
    // every D item a group and put its own rank into the gap scan.
    val withSelf = sp
      .unionByName(dSel.select(col("item").as("item_a"), col("item").as("item_b"),
        lit(null).cast("double").as("u_b"), lit(null).cast("double").as("corr")))
      .join(rk.select(col("item").as("item_b"), col("r")), Seq("item_b"))
      .crossJoin(globals)
    val wAsc = Window.partitionBy(col("item_a")).orderBy(col("r").asc)
    // The descending rank is DERIVED, not sorted for: within an item_a
    // group of m rows, row_number over r desc = m + 1 − row_number over
    // r asc (r is unique — a global ranking). The unordered count window
    // shares wAsc's exchange and needs no sort, so the fused stage pays
    // ONE partition sort instead of two.
    val wPart = Window.partitionBy(col("item_a"))
    val fused = withSelf
      .withColumn("pos", row_number().over(wAsc))
      .withColumn("pos2", count(lit(1)).over(wPart) + 1 - col("pos"))
      .groupBy("item_a")
      .agg(sum(col("corr")).as("sSp"),
           sum(col("corr") * col("corr")).as("qSp"),
           min(col("corr")).as("minSp"),
           max(col("corr")).as("maxSp"),
           sum(when(col("corr").isNotNull, col("u_b"))).as("uSp"),
           sum(when(col("corr").isNotNull, col("u_b") * col("u_b"))).as("vSp"),
           count(col("corr")).as("degD"),
           coalesce(min(when(col("r") =!= col("pos"), col("pos"))),
             max(col("pos")) + 1).as("gapD"),
           coalesce(min(when(col("cntD") + 1 - col("r") =!= col("pos2"), col("pos2"))),
             max(col("pos2")) + 1).as("gapA"),
           first(col("cntD")).as("cntDg"))
    val stats = fused
      .join(rk.select(col("r").as("gapD"), col("u").as("zMaxU")), Seq("gapD"), "left")
      .join(rk.select(col("r").as("rAsc"), col("u").as("zMinU")),
        col("rAsc") === col("cntDg") + 1 - col("gapA"), "left")
      .drop("gapD", "gapA", "rAsc", "cntDg")

    // Closed-form per-item vector statistics → scaling bounds + threshold.
    // One row per item; CACHED because both emission branches broadcast it
    // — without the cache each broadcast build would re-run the whole
    // fused shuffle pipeline above.
    val perItem = Caches.cacheOnce(
      d.select(col("item").as("item_a"), col("sx").as("sx_a"),
          col("sxx").as("sxx_a"), col("u").as("u_a"), col("n"))
        .join(stats, Seq("item_a"))
        .crossJoin(globals)
        .withColumn("c", col("cntD") - 1)
        .withColumn("zCnt", col("c") - coalesce(col("degD"), lit(0L)))
        .withColumn("sZero", when(col("zCnt") === 0, lit(0.0)).otherwise(
          -col("u_a") * (col("gU") - col("u_a") - coalesce(col("uSp"), lit(0.0)))))
        .withColumn("qZero", when(col("zCnt") === 0, lit(0.0)).otherwise(
          col("u_a") * col("u_a") *
            (col("gV") - col("u_a") * col("u_a") - coalesce(col("vSp"), lit(0.0)))))
        .withColumn("mn", least(col("minSp"),
          when(col("zCnt") > 0, -col("u_a") * col("zMaxU"))))
        .withColumn("mx", greatest(col("maxSp"),
          when(col("zCnt") > 0, -col("u_a") * col("zMinU"))))
        .withColumn("mean", when(col("c") > 0,
          (coalesce(col("sSp"), lit(0.0)) + col("sZero")) / col("c")))
        .withColumn("variance",
          (coalesce(col("qSp"), lit(0.0)) + col("qZero") -
            col("c") * col("mean") * col("mean")) / nullif(col("c") - 1, lit(0L)))
        // clip tiny negative cancellation residue to 0, but PRESERVE NULL
        // (c == 1 → sample σ undefined → no emissions, like stddev_samp);
        // greatest() would skip the NULL and wrongly yield σ = 0
        .withColumn("sigma", sqrt(when(col("variance") < 0.0, lit(0.0))
          .otherwise(col("variance"))))
        // constant vector (mx == mn, ≥2 values): every scaled score is 0.0
        // and the threshold is 0.0 — everything passes, like the window path.
        .withColumn("isConst", col("mx") === col("mn") && col("c") >= 2)
        // mx == mn with c < 2 (single-value vector): σ undefined → NULL
        // threshold → no emissions; the explicit branch also keeps ANSI
        // mode from throwing on the zero-range division.
        .withColumn("thr", when(col("isConst"), lit(0.0))
          .when(col("mx") === col("mn"), lit(null).cast("double"))
          .otherwise(
            (col("mean") - col("mn")) / (col("mx") - col("mn")) +
              col("sigma") / (col("mx") - col("mn")) * lit(k)))
        .select(col("item_a"), col("sx_a"), col("sxx_a"), col("u_a"), col("n"),
          col("mn"), col("mx"), col("thr"), col("isConst"), col("uming"),
          col("mean"), col("sigma")))

    /** Closed-form OP-20 moments (see `vectorMoments`). Non-degenerate
      * items read off the cached perItem table; degenerate selected items
      * (dropped from D) are restored with NULL moments — the windowed
      * pipeline aggregates their all-NULL vectors to NULL, not absence. */
    def moments: DataFrame = {
      val degenerate = itemSt.crossJoin(broadcast(n1))
        .where(col("n") * col("sxx") - col("sx") * col("sx") <= 0.0)
      val degSel = restrictItems(degenerate)
        .select(col("item").as("item_a"),
          lit(null).cast("double").as("mean_corr"),
          lit(null).cast("double").as("std_corr"))
      perItem.select(col("item_a"), col("mean").as("mean_corr"),
          col("sigma").as("std_corr"))
        .unionByName(degSel)
    }

    def scaledScore: Column =
      when(col("isConst"), lit(0.0))
        .when(col("mx") === col("mn"), lit(null).cast("double")) // thr NULL → dropped
        .otherwise((col("corr") - col("mn")) / (col("mx") - col("mn")))
    def passes: Column = {
      val s = scaledScore
      col("isConst") || (s >= col("thr"))
    }

    /** The store table itself: sparse emissions + (usually-empty)
      * zero-partner emissions, both gated by the per-item threshold. */
    def neighbors: DataFrame = {
      // (a) Sparse emissions: per-row scaled score vs per-item threshold.
      val sparseOut = sp
        .join(bcCat(perItem.drop("sx_a", "sxx_a", "u_a", "n", "uming",
          "mean", "sigma")), Seq("item_a"))
        .where(passes)
        .select(col("item_a").as("item_a_id"), col("item_b").as("item_b_id"),
          scaledScore.as("scaled_score"))

      // (b) Zero-partner emissions. Candidate a-items: threshold at or below
      // the best zero-pair score (loose by a relative epsilon so the exact
      // per-row filter below makes the boundary call). Typically EMPTY —
      // and provably the seed of every zero-pair row, so one cheap probe on
      // the CACHED perItem table skips the whole branch (its theta join AND
      // the co-occurrence anti-join shuffle) in the common case. At any
      // threshold a real store uses, the build is exactly the sparse
      // pipeline; the probe is one filter over catalog-sized cached rows.
      val rawThr = col("mn") + col("thr") * (col("mx") - col("mn"))
      val aCand = perItem.where(col("isConst") ||
        (-col("u_a") * col("uming") >= rawThr - abs(rawThr) * 1e-9 - lit(1e-12)))
      if (aCand.isEmpty) sparseOut
      else {
        val zeroOut = db
          .join(broadcast(aCand), col("item_a") =!= col("item_b") &&
            (col("isConst") ||
              (-col("u_a") * col("u_b") >= rawThr - abs(rawThr) * 1e-9 - lit(1e-12))))
          .join(sym.select(col("item_a"), col("item_b")), Seq("item_a", "item_b"), "left_anti")
          .withColumn("corr", corrCol(lit(0.0)))
          .where(passes)
          .select(col("item_a").as("item_a_id"), col("item_b").as("item_b_id"),
            scaledScore.as("scaled_score"))
        sparseOut.unionByName(zeroOut)
      }
    }
  }
}
