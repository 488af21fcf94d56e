package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Hand-computed PageRank witness (q133). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-walked 3-node chain") {
    // 1→2, 1→3, 2→3, 3→1; outdeg 1:2, 2:1, 3:1; r0 = 1/3 each.
    // r1 = (0.05+0.85/3, 0.05+0.85/6, 0.05+0.85·(1/6+1/3))
    //    = (0.333333, 0.191667, 0.475)
    // r2 = (0.05+0.85·0.475, 0.05+0.85·(r1(1)/2),
    //       0.05+0.85·(r1(1)/2+r1(2)))
    //    = (0.45375, 0.191667, 0.354583); rank_rel = 3·r2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(1L) shouldBe 3 * 0.45375 +- 1e-9
    got(2L) shouldBe 3 * (0.05 + 0.85 / 6.0) +- 1e-9
    got(3L) shouldBe 3 * 0.354583333333 +- 1e-9
  }

  test("pageRank checkpointEvery: 25 deep rounds, flat plan size, identical ranks") {
    val cp = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)).toDF("src", "dst")
    val edges = cp.unionAll(cp.select(col("dst").as("src"), col("src").as("dst")))
    // identical values: the checkpoint materializes exactly the partitions
    // the next round would have computed — same partitioning, same
    // addition order, bit-identical ranks
    val plain = Graph.pageRank(edges, 25).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sealed_ = Graph.pageRank(edges, 25, checkpointEvery = 10)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    sealed_ shouldBe plain
    // flat plan: one round past a checkpoint analyzes the same number of
    // logical nodes whether it is round 11 or round 21 — the driver's
    // per-action cost is O(checkpointEvery), not O(iters)
    def nNodes(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.analyzed.foreach(_ => n += 1)
      n
    }
    val n11 = nNodes(Graph.pageRank(edges, 11, checkpointEvery = 10))
    val n21 = nNodes(Graph.pageRank(edges, 21, checkpointEvery = 10))
    n11 shouldBe n21
    // ...whereas the unsealed lineage keeps growing
    nNodes(Graph.pageRank(edges, 21)) should be > nNodes(Graph.pageRank(edges, 11))
  }

  test("pageRank mass is conserved on an out-degree-complete graph") {
    // symmetrized edges: every node has outdeg ≥ 1 → Σ rank_rel = N
    val cp = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)).toDF("src", "dst")
    val edges = cp.unionAll(cp.select(col("dst").as("src"), col("src").as("dst")))
    val ranks = Graph.pageRank(edges, 3).collect().map(_.getDouble(1))
    ranks.sum shouldBe 6.0 +- 1e-9 // 6 nodes, mean exactly 1
    ranks.foreach(r => assert(r > 0))
  }

  private def undirected(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))

  test("labelPropagation walks the hand-computed path: majority spread, ties down, seeds clamped") {
    // path 1-2-3-4-5 with clamped seeds 1→10 and 5→20, plus an unseeded
    // island 6-7 that must stay unlabeled
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "label")
    def run(iters: Int): Map[Long, Option[Long]] =
      Graph.labelPropagation(edges, seeds, iters)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // round 2: node 3 sees {10, 20} tied → smallest (10); node 4 still 20
    run(2) shouldBe Map(
      1L -> Some(10L), 2L -> Some(10L), 3L -> Some(10L),
      4L -> Some(20L), 5L -> Some(20L), 6L -> None, 7L -> None)
    // round 3: node 4 now ties {10 (from 3), 20 (from 5)} → 10; the
    // clamped seed 5 keeps 20 despite its neighbor majority
    run(3) shouldBe Map(
      1L -> Some(10L), 2L -> Some(10L), 3L -> Some(10L),
      4L -> Some(10L), 5L -> Some(20L), 6L -> None, 7L -> None)
  }

  test("labelPropagation dedupes seeds per node (min label) — no vote inflation, no duplicate rows") {
    // star: center 0 with leaves 1 (seeded 30) and 2 (seeded 20, DUPLICATED
    // 3×). Without seed dedup node 2 appears 3× in the labels vector, so 0
    // would see votes {20:3, 30:1}; with dedup it's a {20:1, 30:1} tie →
    // smallest label 20 — which here coincides, so also check the node-2
    // two-label conflict: (2→20, 2→25) must resolve to min 20 and emit ONE row.
    val edges = undirected((0L, 1L), (0L, 2L))
    val seeds = Seq((1L, 30L), (2L, 20L), (2L, 20L), (2L, 20L), (2L, 25L))
      .toDF("node", "label")
    val out = Graph.labelPropagation(edges, seeds, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    out.length shouldBe out.map(_._1).distinct.length // one row per node
    out.toMap shouldBe Map(0L -> 20L, 1L -> 30L, 2L -> 20L)
  }

  test("labelPropagation checkpointEvery: 15 deep rounds, bounded plan, identical labels") {
    val edges = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L))
    val seeds = Seq((1L, 10L), (8L, 20L)).toDF("node", "label")
    def labels(iters: Int, cp: Int) =
      Graph.labelPropagation(edges, seeds, iters, checkpointEvery = cp)
        .orderBy("node").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    labels(15, 5) shouldBe labels(15, 0)
    // plan depth is O(checkpointEvery), not O(iters): one round past a
    // checkpoint analyzes the same logical-node count at round 6 and 11
    def nNodes(iters: Int, cp: Int): Int = {
      var n = 0
      Graph.labelPropagation(edges, seeds, iters, checkpointEvery = cp)
        .queryExecution.analyzed.foreach(_ => n += 1)
      n
    }
    nNodes(6, 5) shouldBe nNodes(11, 5)
    nNodes(11, 0) should be > nNodes(6, 0)
  }

  test("personalizedPageRank: seeded-all equals pageRank; teleport localizes mass") {
    import spark.implicits._
    // two communities bridged by one edge: 1-2-3 and 4-5-6, bridge 3-4
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val all = edges.select(col("src").as("node")).distinct()
    val pr = Graph.pageRank(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pprAll = Graph.personalizedPageRank(edges, all, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.foreach { case (n, v) => pprAll(n) shouldBe v +- 1e-12 }
    // seeding community {1,2,3} keeps its mass above the far community's
    val seeded = Graph.personalizedPageRank(edges, Seq(1L, 2L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(1L, 2L).map(seeded).min should be > Seq(5L, 6L).map(seeded).max
    // total mass is conserved (N·Σrank/N = Σ rank_rel / N = 1)
    seeded.values.sum / 6.0 shouldBe 1.0 +- 1e-9
  }

  test("personalizedPageRank: out-of-graph seeds drop; all-out-of-graph errors") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(edges, Seq(1L, 99L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe Set(1L, 2L)
    got(1L) should be > got(2L)
    an[IllegalArgumentException] should be thrownBy
      Graph.personalizedPageRank(edges, Seq(99L).toDF("node"), 2)
  }

  test("triangleCounts: hand-computed diamond — two triangles sharing an edge") {
    import spark.implicits._
    // K4 minus (3,4): triangles {1,2,3} and {1,2,4}; 1 and 2 corner both
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L)
  }

  test("triangleCounts normalizes direction, duplicates, self-loops; square has none") {
    import spark.implicits._
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("src", "dst")
    Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    Graph.triangleCounts(square).count() shouldBe 0L
  }

  test("triangleCounts matches a brute-force witness on a random graph (seed 11)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (1 to 120).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe brute
  }

  test("hits matches the hand-walked bipartite graph; scores L1-normalize per side") {
    // 1→3, 1→4, 2→4; hubs {1,2}, authorities {3,4}; h0 = (1/2, 1/2)
    // a1 ∝ (1/2, 1) → (1/3, 2/3); h1 ∝ (1, 2/3) → (3/5, 2/5)
    // a2 ∝ (3/5, 1) → (3/8, 5/8); h2 ∝ (1, 5/8) → (8/13, 5/13)
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx(got(1L)._1, 8.0 / 13.0))
    assert(approx(got(2L)._1, 5.0 / 13.0))
    assert(approx(got(3L)._2, 3.0 / 8.0))
    assert(approx(got(4L)._2, 5.0 / 8.0))
    // each node occupies exactly one side of the bipartite graph
    got(1L)._2 shouldBe 0.0
    got(3L)._1 shouldBe 0.0
    // per-side L1 normalization
    assert(approx(got.values.map(_._1).sum, 1.0))
    assert(approx(got.values.map(_._2).sum, 1.0))
    // the authority drawing more hub mass ranks higher; the hub covering
    // both authorities out-scores the single-edge hub
    got(4L)._2 should be > got(3L)._2
    got(1L)._1 should be > got(2L)._1
  }

  test("communities: hand-walked semi-sync rounds recover planted bipartite blocks") {
    // two complete-bipartite blocks {0,4}×{1,5} and {2,6}×{3,7} plus one
    // cross edge (4,7). Hand-walk (phases = 2: odd ids update in rounds
    // 1/3, even in 2/4; majority tie-breaks to the smallest label):
    //   r1: 1→0, 5→0, 3→2, 7→2 (each odd node ties across its even
    //       neighbors' fresh own-id labels → min)
    //   r2: 0→0, 4→0 (both odd neighbors say 0; the cross 2 is outvoted),
    //       2→2, 6→2
    //   r3/r4: fixed point — blocks converged, the cross edge outvoted.
    val edges = Seq((0L, 1L), (0L, 5L), (4L, 1L), (4L, 5L),
      (2L, 3L), (2L, 7L), (6L, 3L), (6L, 7L), (4L, 7L)).toDF("src", "dst")
    val got = Graph.communities(edges, iters = 4, phases = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(0L -> 0L, 1L -> 0L, 4L -> 0L, 5L -> 0L,
      2L -> 2L, 3L -> 2L, 6L -> 2L, 7L -> 2L)
    // hand-computed modularity of that partition: m = 9 edges, intra
    // L = 4 + 4, vol = 9 + 9 → Q = 8/9 − 2·(9/18)² = 0.388889
    val q = Graph.modularity(edges, Graph.communities(edges, 4, 2)).collect().head
    q.getAs[Long]("n_nodes") shouldBe 8L
    q.getAs[Long]("n_communities") shouldBe 2L
    q.getAs[Long]("n_edges") shouldBe 9L
    q.getAs[Double]("q") shouldBe 0.388889
    // the trivial own-id partition scores NEGATIVE (all edges cross):
    // Q = 0 − Σ (deg/2m)² = −42/324
    import org.apache.spark.sql.functions.col
    val own = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
      .select(col("node"), col("node").as("community"))
    Graph.modularity(edges, own).collect().head
      .getAs[Double]("q") shouldBe -0.12963
  }
}
