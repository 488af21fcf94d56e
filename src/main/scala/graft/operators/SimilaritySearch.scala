package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - Brute-force cosine top-k: the exact baseline. The QUERY set is
 *    broadcast (serving queries ≪ corpus); the corpus streams map-side —
 *    a broadcast nested-loop + per-query top-k, no corpus shuffle except
 *    the final per-query window (tiny: k rows per query survive).
 *  - LSH (random-hyperplane / SRP) bucketing: the scale path. Each vector
 *    gets an L-bit sign bucket from L fixed ±1 hyperplanes (map-only);
 *    candidates = same-bucket pairs; exact cosine re-ranks inside buckets.
 *    Collision probability 1 − θ/π per bit — near neighbors land together.
 *  - Embedding-cosine near-dup pairs (the dedup tier over embeddings),
 *    optionally blocked by a metadata column.
 *
 * All folds are explicit left-to-right `aggregate`s in binary64 so any
 * SQL engine reproduces the numbers bit-for-bit (oracle-checkable).
 */
object SimilaritySearch {

  /** Deterministic ±1 hyperplanes (L planes × dim), from a tiny seeded
    * LCG — reproducible here and in generated oracle SQL. */
  def hyperplanes(l: Int, dim: Int, seed: Long = 42L): Seq[Seq[Int]] = {
    var s = seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    Seq.fill(l)(Seq.fill(dim)(if (((next() >>> 33) & 1L) == 0L) 1 else -1))
  }


  /** Binary64 dot product of two float-array columns via the native
    * codegen'd `VecDot` expression — numerically identical to the
    * ascending-index fold (same order, same start), ~an order of magnitude
    * faster than the interpreted lambda tree on the pair-scoring hot path. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.VecDot(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Cosine similarity of two float-array columns, computed in binary64
    * with deterministic summation order; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** L2 norm of a float-array column (same kernel as `cosine`). */
  def l2Norm(emb: Column): Column = sqrt(dot(emb, emb))

  /** Pair cosine from a pre-computed norm on each side: only the dot
    * product is evaluated per PAIR; the O(dim) norm kernels run once per
    * ROW map-side. Numerically identical to `cosine`. */
  private[graft] def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))

  /**
   * Exact top-k: for each query vector, the k nearest corpus vectors by
   * cosine (self excluded when ids collide). `queries` is broadcast; both
   * sides carry pre-computed norms so the per-pair work is one dot fold.
   * Output: (query_id, vec_id, cos), deterministic tie-break on vec_id.
   */
  /**
   * Int8 scalar quantize→dequantize round-trip of the embedding column:
   * per-vector scale s = max|x|, codes = floor(x/s·127 + 0.5), values
   * back as code·s/127 (float). Returns the corpus exactly as an
   * int8-backed index would SERVE it — 4× less memory/IO per vector at
   * 100 TB, with the recall cost measured in-engine (q94, the q41
   * pattern) instead of assumed. Zero vectors pass through unchanged;
   * every step is plain IEEE arithmetic, so the oracle replicates it
   * bit-for-bit. Map-only.
   */
  def int8Roundtrip(corpus: DataFrame): DataFrame = {
    val s = aggregate(col("embedding"), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    corpus
      .withColumn("__s", s)
      .withColumn("embedding",
        when(col("__s") === 0.0, col("embedding"))
          .otherwise(transform(col("embedding"), x =>
            (floor(x.cast("double") / col("__s") * 127 + 0.5) * col("__s") / 127)
              .cast("float"))))
      .drop("__s")
  }

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = bruteScored(queries, corpus)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /** `bruteForceTopK` variant that ranks — and therefore CUTS — on the
    * ROUNDED cosine (HALF_UP at `scale`, vec_id tiebreak), returning the
    * rounded value as `cos`. Use wherever the top-k boundary itself must
    * be engine-reproducible (the q128/q136 fusion inputs): ranking on the
    * raw float cosine and rounding afterwards lets a rounding collision
    * that straddles the cut, with inverted id order, change list
    * membership between this engine and an oracle that ranks on the
    * rounded score. Recall ground truths keep the raw-ranked face —
    * rounding there would grade the index against a coarsened truth. */
  def bruteForceTopKRounded(queries: DataFrame, corpus: DataFrame, k: Int,
                            scale: Int = 6): DataFrame = {
    val scored = bruteScored(queries, corpus)
      .select(col("query_id"), col("vec_id"), round(col("cos"), scale).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  private def bruteScored(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2Norm(col("embedding")).as("q_nrm")))
    graft.core.Spread.byKey(corpus, col("vec_id")) // spread gated on input width
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
      .crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
  }

  /** Sign bucket: L-bit integer, bit j = [dot(emb, plane_j) > 0].
    * Map-only; each plane is a LITERAL float array fed to the native
    * `vec_dot` kernel, so the whole bucket is one codegen'd projection —
    * the earlier HOF fold (aggregate over zip_with) ran interpreted on
    * the bucketing map stage, the hot pass of LSH at corpus scale.
    * Numerically identical: ±1 weights are exact in float, and VecDot's
    * ascending binary64 sum is the same fold order. */
  def srpBucket(emb: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(emb, typedlit(p.map(_.toFloat))) > 0.0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** Corpus bucketed by SRP signature: (vec_id, embedding, bucket). */
  def withBucket(embs: DataFrame, planes: Seq[Seq[Int]]): DataFrame =
    embs.withColumn("bucket", srpBucket(col("embedding"), planes))

  /** Johnson–Lindenstrauss dimensionality reduction: project a float
    * vector onto K ±1 hyperplanes (Achlioptas 2003 — the database-
    * friendly JL family: integer weights, no Gaussian sampling), scale
    * by 1/√K, and cast each component back to float so the REDUCED
    * corpus reuses every float-array kernel downstream (`VecDot`,
    * cosine, the ANN stores). Map-only and codegen'd like `srpBucket`
    * (each plane a literal float array into the native `vec_dot`);
    * cuts every downstream distance kernel and shuffle byte count by
    * dim/K. With K = 16 the scale factor 0.25 is exact in binary64, so
    * the arithmetic replays bit-identically in any engine. */
  def rpProject(emb: Column, planes: Seq[Seq[Int]]): Column = {
    val s = 1.0 / math.sqrt(planes.length.toDouble)
    array(planes.map(p =>
      (dot(emb, typedlit(p.map(_.toFloat))) * s).cast("float")): _*)
  }

  /** Chunk→document embedding pooling: the mean of each group's vectors
    * per dimension, L2-normalized — the standard aggregation that turns
    * chunk-level embeddings (what encoders emit) into document-level
    * ones (what retrieval and SemDeDup consume). Relational shape: one
    * (group, dim) hash aggregate over the posexploded components + a
    * per-group norm — two shuffles on keys that parallelize by
    * construction, no vectors ever collected. Output: one row per
    * (grp, dim): (grp, dim, n_chunks, v); a zero pooled vector yields
    * NULL components rather than ±Inf. */
  def meanPoolNormalized(embs: DataFrame, group: Column): DataFrame = {
    val ex = embs.select(group.as("grp"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
    val pooled = ex.groupBy(col("grp"), col("dim"))
      .agg(avg(col("v").cast("double")).as("v"), count(lit(1)).as("n_chunks"))
    val nrm = pooled.groupBy(col("grp")).agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
    pooled.join(nrm, Seq("grp"))
      .select(col("grp"), col("dim").cast("long").as("dim"), col("n_chunks"),
        (col("v") / nullif(col("nrm"), lit(0.0))).as("v"))
  }

  /**
   * Approximate top-k: brute-force ranking restricted to the query's SRP
   * bucket. At scale the bucket join is a hash join on the bucket id —
   * corpus shuffles once by bucket, queries broadcast.
   * Output: (query_id, vec_id, cos), only candidates sharing the bucket.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, planes: Seq[Seq[Int]], k: Int): DataFrame =
    srpServe(
      withBucket(graft.core.Spread.byKey(corpus, col("vec_id")), planes)
        .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"),
          col("bucket")),
      queries, planes, k)

  /** Serve SRP top-k from a PREBUILT bucketed corpus (vec_id, embedding,
    * nrm, bucket) — fresh (`lshTopK`) or persisted (`store.AnnStore`).
    * Queries are bucketed with the same planes and broadcast. */
  def srpServe(bucketedCorpus: DataFrame, queries: DataFrame,
               planes: Seq[Seq[Int]], k: Int): DataFrame = {
    val qb = broadcast(withBucket(queries, planes)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        l2Norm(col("embedding")).as("q_nrm"), col("bucket")))
    val scored = bucketedCorpus.join(qb, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /**
   * Multi-probe SRP top-k: each query probes its own sign bucket AND
   * every Hamming-1 neighbor (one flipped hyperplane bit) — the standard
   * recall lever for sign-random-projection LSH: a near neighbor that
   * landed one unlucky hyperplane away is recovered at the cost of L
   * extra (tiny) probe rows per QUERY, with the corpus side untouched.
   * Probe buckets are distinct, and a corpus vector lives in exactly one
   * bucket, so no candidate is scored twice. Strictly super-sets
   * `srpServe`'s candidates; same exact re-rank.
   */
  def multiProbeTopK(queries: DataFrame, corpus: DataFrame,
                     planes: Seq[Seq[Int]], k: Int): DataFrame = {
    val l = planes.size
    val probeSet = array((col("bucket") +: (0 until l).map(j =>
      col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val qb = broadcast(withBucket(queries, planes)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        l2Norm(col("embedding")).as("q_nrm"),
        explode(probeSet).as("bucket")))
    val cb = withBucket(graft.core.Spread.byKey(corpus, col("vec_id")), planes)
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"),
        col("bucket"))
    val scored = cb.join(qb, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /**
   * IVF (inverted-file) coarse quantization — the other classic ANN scale
   * path next to SRP-LSH. Centroids here are a DETERMINISTIC sample of the
   * corpus (vec_id ≡ 1 mod `centroidMod`) rather than k-means iterations:
   * reproducible in plain SQL, and at 100 TB you would swap in trained
   * centroids without touching the dataflow (assignment, inverted lists,
   * probing are identical).
   */
  def ivfCentroids(corpus: DataFrame, centroidMod: Int): DataFrame =
    corpus.where(col("vec_id") % centroidMod === 1)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        l2Norm(col("embedding")).as("cent_nrm"))

  /** Nearest-centroid assignments: rank 1..nprobe per vector (rank 1 = the
    * inverted-list assignment; higher ranks = probe lists for queries). */
  private def centroidRanks(vecs: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val scored = vecs
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        cosineWithNorms(col("embedding"), col("cent_emb"), col("nrm"), col("cent_nrm"))
          .as("cscore"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cscore").desc_nulls_last, col("cent_id"))
    scored.withColumn("crnk", row_number().over(w)).where(col("crnk") <= nprobe)
  }

  /**
   * IVF approximate top-k: corpus vectors live in the inverted list of
   * their nearest centroid; each query probes its `nprobe` nearest
   * centroids and exact-ranks only those lists. Corpus shuffles once by
   * centroid id; queries broadcast.
   * Output: (query_id, vec_id, cos).
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroidMod: Int,
              nprobe: Int, k: Int): DataFrame =
    ivfTopKFrom(ivfCentroids(corpus, centroidMod), queries, corpus, nprobe, k)

  /** IVF probing against an explicit centroid table (sampled OR trained —
    * the dataflow is identical, as the IVF design promises). */
  def ivfTopKFrom(cents: DataFrame, queries: DataFrame, corpus: DataFrame,
                  nprobe: Int, k: Int): DataFrame =
    ivfServe(ivfLists(corpus, cents), cents, queries, nprobe, k)

  /** Inverted lists: every corpus vector filed under its nearest centroid,
    * with its precomputed norm — the table `store.AnnStore` persists. */
  def ivfLists(corpus: DataFrame, cents: DataFrame): DataFrame =
    centroidRanks(graft.core.Spread.byKey(corpus, col("vec_id")), cents, 1)
      .select(col("cent_id"), col("vec_id"), col("embedding"), col("nrm"))

  /** Serve IVF top-k from PREBUILT inverted lists (cent_id, vec_id,
    * embedding, nrm) — fresh (`ivfTopKFrom`) or persisted
    * (`store.AnnStore`). Queries rank against the centroid table and
    * probe their `nprobe` nearest lists. */
  def ivfServe(lists: DataFrame, cents: DataFrame, queries: DataFrame,
               nprobe: Int, k: Int): DataFrame = {
    val probes = broadcast(centroidRanks(queries, cents, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id")))
    val scored = lists.join(probes, Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /**
   * Trained IVF centroids: `iters` deterministic Lloyd refinements of the
   * sampled seeds — each round assigns every corpus vector to its nearest
   * current centroid (cosine, tie-break on cent_id), then replaces each
   * centroid with the MEAN of its assigned vectors. The mean is an
   * ORDERED fold (vectors sorted by vec_id, summed left-to-right in
   * binary64, divided, then rounded to float32), so any engine reproduces
   * the centroids bit-for-bit AT EVERY ROUND — that is what makes
   * trained-IVF oracle-checkable at iters=1 (q40) and iters=3 (q101),
   * not just spec-checkable. Empty clusters drop out, like k-means;
   * centroid ids stay the seed ids throughout.
   *
   * The fold is a STREAMING per-partition pass (hash-partition by
   * centroid, in-partition sort by (cent_id, vec_id), one O(dim)
   * accumulator per cluster) — clusters are never materialized in memory,
   * so arbitrarily large inverted lists train in bounded state where the
   * earlier per-cluster collect_list capped out at executor memory.
   * `mapPartitions` is the right tool here and nowhere else in this
   * module: an ordered left-fold is genuinely per-partition imperative
   * logic — no built-in aggregate guarantees input order.
   *
   * At 100 TB: each round is the same broadcast-centroids map pass the
   * probe step uses plus one shuffle keyed on nlist centroids — cost is
   * iters × one corpus pass, the classic k-means loop. The per-round
   * centroid table (nlist rows) is cached so round r+1's assignment
   * broadcast does not replay rounds 1..r.
   */
  def trainedCentroids(corpus: DataFrame, centroidMod: Int, dim: Int,
                       iters: Int = 1): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val corpusR = graft.core.Spread.byKey(corpus, col("vec_id"))
    var cents = ivfCentroids(corpus, centroidMod)
    for (_ <- 1 to iters)
      cents = graft.core.Caches.cacheOnce(lloydRound(corpusR, cents, dim))
    cents
  }

  /** One Lloyd round: assign `corpus` against `cents`, fold each cluster
    * to its ordered-mean centroid (see `trainedCentroids`). */
  private def lloydRound(corpus: DataFrame, cents: DataFrame, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val assigned = centroidRanks(corpus, cents, 1)
      .select(col("cent_id"), col("vec_id"), col("embedding"))
    val folded = assigned
      .repartition(col("cent_id"))
      .sortWithinPartitions(col("cent_id"), col("vec_id"))
      .select(col("cent_id").cast("long"), col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[(Long, Array[Float])] {
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Array[Float]) = {
            val cid = it.head._1
            val acc = new Array[Double](dim)
            var n = 0L
            while (it.hasNext && it.head._1 == cid) {
              val emb = it.next()._3
              var i = 0
              while (i < dim) { acc(i) += emb(i).toDouble; i += 1 }
              n += 1
            }
            val out = new Array[Float](dim)
            var i = 0
            while (i < dim) { out(i) = (acc(i) / n).toFloat; i += 1 }
            (cid, out)
          }
        }
      }
    folded.toDF("cent_id", "cent_emb")
      .withColumn("cent_nrm", l2Norm(col("cent_emb")))
  }

  /**
   * Product-quantization codebooks — the natural next compression step
   * after scalar int8 (q94/q97): the embedding splits into `m` contiguous
   * subvectors and each subspace gets its own codebook, here the
   * DETERMINISTIC corpus sample (vec_id ≡ 1 mod `codeMod`, sliced per
   * subspace; code_id = the sampled vec_id) — reproducible in plain SQL,
   * same design stance as `ivfCentroids`: swap in k-means-trained
   * codebooks without touching the dataflow.
   * Output: (sub_id, code_id, code_emb), dim must divide by m.
   */
  def pqCodebooks(corpus: DataFrame, m: Int, dim: Int, codeMod: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sd = dim / m
    corpus.where(col("vec_id") % codeMod === 1)
      .select(col("vec_id").as("code_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("sub_id"),
            slice(col("embedding"), j * sd + 1, sd).as("code_emb"))): _*)).as("s"))
      .select(col("s.sub_id").as("sub_id"), col("code_id"), col("s.code_emb").as("code_emb"))
  }

  /** PQ codes: each corpus vector's per-subspace nearest codeword by
    * squared L2 (binary64 via the `vec_dot` kernel, tie-break on
    * code_id). ONE broadcast-codebook join — m·|codebook| candidate rows
    * per vector stay MAP-SIDE: the argmin is `min(struct(d2, code_id))`,
    * a hash aggregate whose partial (map-side) combine reduces each
    * (vec, sub) group to one row before the exchange, so the shuffle
    * carries m rows per vector, never the candidate cross product (a
    * rank-1 window here would sort-shuffle all m·|codebook| candidates;
    * plan-guarded). struct ordering is lexicographic and d2 is
    * bit-deterministic, so the tie-break is exact. This
    * m-bytes-per-vector table (plus the codebooks) IS the persisted PQ
    * index at scale. Output: (vec_id, sub_id, code_id). */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    // An empty codebook (no vec_id hit the sample predicate — small corpus
    // or unlucky id space) would silently encode NOTHING; fail loudly like
    // Npy.read does. One bounded driver probe (limit-1 scan).
    require(!codebooks.isEmpty,
      "PQ codebook is empty: no corpus vec_id satisfies the sample " +
        "predicate (vec_id % codeMod == 1) — lower codeMod or train codebooks")
    val sd = dim / m
    val subs = graft.core.Spread.byKey(corpus, col("vec_id"))
      .select(col("vec_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("sub_id"),
            slice(col("embedding"), j * sd + 1, sd).as("sub_emb"))): _*)).as("s"))
      .select(col("vec_id"), col("s.sub_id").as("sub_id"), col("s.sub_emb").as("sub_emb"))
    val d2 = dot(col("sub_emb"), col("sub_emb")) -
      lit(2.0) * dot(col("sub_emb"), col("code_emb")) +
      dot(col("code_emb"), col("code_emb"))
    subs.join(broadcast(codebooks), Seq("sub_id"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(struct(d2.as("d2"), col("code_id").as("code_id"))).as("best"))
      .select(col("vec_id"), col("sub_id"), col("best.code_id").as("code_id"))
  }

  /**
   * PQ quantize→decode round-trip of the corpus: encode against the
   * deterministic codebooks, then reconstruct each vector as the
   * concatenation of its codewords — the corpus exactly as a PQ index
   * SERVES it. Scoring the reconstruction with the ordered `vec_dot`
   * fold IS asymmetric-distance (ADC) scoring: dot(q, recon) =
   * Σ_j dot(q_j, codeword_j) in ascending index order — the per-subspace
   * LUT formulation computes the identical sum, but summing m LUT hits
   * with a float aggregate would lose the fixed fold order (and with it
   * the oracle), while the reconstruction keeps the whole score inside
   * the codegen'd kernel. Recall cost is measured per query (q99, the
   * q94 pattern), never assumed. Compression at scale: m codes + shared
   * codebooks ≈ m bytes/vector vs 4·dim.
   */
  def pqRoundtrip(corpus: DataFrame, m: Int, dim: Int, codeMod: Int): DataFrame =
    pqRoundtripFrom(corpus,
      graft.core.Caches.cacheOnce(pqCodebooks(corpus, m, dim, codeMod)), m, dim)

  /** PQ decode against an explicit codebook table: each encoded vector
    * reassembled as the concatenation of its codewords in sub_id order.
    * Output: (vec_id, embedding). */
  private def pqDecode(codes: DataFrame, books: DataFrame): DataFrame =
    codes.join(broadcast(books), Seq("sub_id", "code_id"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_emb")))),
        x => x.getField("code_emb"))).as("embedding"))

  /** PQ round-trip against an EXPLICIT codebook table (sampled or
    * trained — the dataflow is identical, the `ivfCentroids` stance). */
  def pqRoundtripFrom(corpus: DataFrame, books: DataFrame, m: Int, dim: Int): DataFrame =
    pqDecode(pqEncode(corpus, books, m, dim), books)

  /**
   * Lloyd-trained PQ codebooks: `iters` deterministic refinements of the
   * sampled seeds, independently PER SUBSPACE — the `trainedCentroids`
   * machinery applied under a composite (sub_id, code_id) key. Each round
   * assigns every subvector to its nearest current codeword (squared L2
   * in binary64, tie-break on code_id — `pqEncode`'s criterion), then
   * replaces each codeword with the ORDERED fold-mean of its assigned
   * subvectors (sorted by vec_id, summed left-to-right in binary64,
   * float32-rounded) — bit-reproducible in any engine, so trained-PQ is
   * oracle-checkable (q106), not just spec-checkable. Empty codewords
   * drop out; code ids stay the seed ids.
   *
   * Scale: each round is one broadcast-codebook map pass over the m
   * subvectors per corpus row plus one shuffle keyed on (sub_id,
   * code_id) — m·|codebook| total groups; the per-round codebook table is
   * tiny and cached so round r+1 does not replay rounds 1..r.
   */
  def trainedPqCodebooks(corpus: DataFrame, m: Int, dim: Int, codeMod: Int,
                         iters: Int = 1): DataFrame =
    trainedPqCodebooksFrom(corpus, pqCodebooks(corpus, m, dim, codeMod),
      m, dim, iters)

  /** Per-subspace Lloyd training from an EXPLICIT seed codebook table —
    * the `ivfTopKFrom` stance: at scale the seed count is a FIXED index
    * parameter (a 256-entry codebook), not a corpus fraction, so the
    * per-round assignment cost stays linear in the corpus. */
  def trainedPqCodebooksFrom(corpus: DataFrame, seeds: DataFrame, m: Int,
                             dim: Int, iters: Int = 1): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val sd = dim / m
    val subs = graft.core.Caches.cacheOnce(
      graft.core.Spread.byKey(corpus, col("vec_id"))
        .select(col("vec_id"),
          explode(array((0 until m).map(j =>
            struct(lit(j).as("sub_id"),
              slice(col("embedding"), j * sd + 1, sd).as("sub_emb"))): _*)).as("s"))
        .select(col("vec_id"), col("s.sub_id").as("sub_id"), col("s.sub_emb").as("sub_emb")))
    var books = seeds
    // same loud-failure stance as pqEncode: empty seeds would train to an
    // empty codebook silently (the rounds bypass pqEncode's guard)
    require(!books.isEmpty,
      "PQ codebook seeds are empty: no corpus vec_id satisfies the sample " +
        "predicate (vec_id % codeMod == 1) — lower codeMod")
    for (_ <- 1 to iters)
      books = graft.core.Caches.cacheOnce(pqLloydRound(subs, books, sd))
    books
  }

  /** One per-subspace Lloyd round: assign every subvector to its nearest
    * codeword of ITS subspace, fold each (sub_id, code_id) group to its
    * ordered-mean codeword (see `trainedPqCodebooks`). */
  private def pqLloydRound(subs: DataFrame, books: DataFrame, sd: Int): DataFrame = {
    val spark = subs.sparkSession
    import spark.implicits._
    val d2 = dot(col("sub_emb"), col("sub_emb")) -
      lit(2.0) * dot(col("sub_emb"), col("code_emb")) +
      dot(col("code_emb"), col("code_emb"))
    // the argmin is the same map-side-combining min(struct) as pqEncode;
    // sub_emb rides along via first() (functionally determined by the key)
    val assigned = subs.join(broadcast(books), Seq("sub_id"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(struct(d2.as("d2"), col("code_id").as("code_id"))).as("best"),
        first(col("sub_emb")).as("sub_emb"))
      .select(col("sub_id"), col("best.code_id").as("code_id"),
        col("vec_id"), col("sub_emb"))
    val folded = assigned
      .repartition(col("sub_id"), col("code_id"))
      .sortWithinPartitions(col("sub_id"), col("code_id"), col("vec_id"))
      .select(col("sub_id").cast("int"), col("code_id").cast("long"),
        col("sub_emb"))
      .as[(Int, Long, Array[Float])]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[(Int, Long, Array[Float])] {
          def hasNext: Boolean = it.hasNext
          def next(): (Int, Long, Array[Float]) = {
            val (sid, cid, _) = it.head
            val acc = new Array[Double](sd)
            var n = 0L
            while (it.hasNext && it.head._1 == sid && it.head._2 == cid) {
              val emb = it.next()._3
              var i = 0
              while (i < sd) { acc(i) += emb(i).toDouble; i += 1 }
              n += 1
            }
            val out = new Array[Float](sd)
            var i = 0
            while (i < sd) { out(i) = (acc(i) / n).toFloat; i += 1 }
            (sid, cid, out)
          }
        }
      }
    folded.toDF("sub_id", "code_id", "code_emb")
  }

  /**
   * Residual IVF-PQ top-k — the standard IVF-ADC composition: corpus
   * vectors are assigned to their nearest RAW-sampled centroid over the
   * RAW vector (the inverted-list key never moves), and PQ encodes the
   * RESIDUAL x − c(x) rather than x itself. Residuals are centered near
   * zero, so the shared codebooks spend their codewords on the local
   * displacement instead of re-describing the coarse structure the
   * centroid already carries — the recall win q105 measures against the
   * raw-encoding form (q104) at equal m/nprobe.
   *
   * Every float step (subtract, add back) is computed in binary64 and
   * rounded to float32 — for a single IEEE op that double-rounding is
   * exact (53 ≥ 2·24+2), so any engine reproduces the residuals and
   * reconstructions bit-for-bit. Serving decodes a candidate as
   * c(x) + decode(codes) and scores with the codegen'd `vec_dot` fold
   * (ADC via reconstruction, the `ivfPqServe` stance).
   *
   * Scale shape: one broadcast-centroid assignment pass, one
   * broadcast-codebook encode pass, lists shuffle once on cent_id;
   * queries broadcast and probe nprobe lists — identical dataflow to the
   * raw form, the residual subtract/add are map-only.
   */
  /** Single-op float arithmetic computed in binary64 then rounded to
    * float32 — exact double rounding (53 ≥ 2·24+2), so any engine
    * reproduces the residual subtract / add-back bit-for-bit. */
  private def fsub(x: Column, c: Column): Column =
    (x.cast("double") - c.cast("double")).cast("float")
  private def fadd(x: Column, c: Column): Column =
    (x.cast("double") + c.cast("double")).cast("float")

  /** Build the residual IVF-PQ index tables: raw-sampled centroids, PQ
    * codebooks over the residuals x − c(x), and coded inverted lists
    * (cent_id, vec_id, nrm, codes) where `nrm` is the norm of the SERVED
    * reconstruction c(x) + decode(codes) — m codes/vector at rest, the
    * raw-assignment list key, the stored-norm serving contract.
    * `sampleFilter` bounds the rows the centroid and codebook SAMPLES
    * are drawn from (assignment/encode/serving still cover the whole
    * corpus): index parameters — nlist, codebook entries — are fixed
    * index knobs at scale, not corpus fractions, or the encode pass goes
    * quadratic as the corpus grows. */
  def ivfPqResidualIndex(corpus: DataFrame, m: Int, dim: Int, codeMod: Int,
                         centroidMod: Int, sampleFilter: Column = lit(true))
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = graft.core.Caches.cacheOnce(
      ivfCentroids(corpus.where(sampleFilter), centroidMod))
    val assigned = graft.core.Caches.cacheOnce(
      centroidRanks(graft.core.Spread.byKey(corpus, col("vec_id")), cents, 1)
        .select(col("cent_id"), col("vec_id"), col("embedding")))
    val resid = assigned
      .join(broadcast(cents.select(col("cent_id"), col("cent_emb"))), Seq("cent_id"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("cent_emb"), fsub).as("embedding"))
    val books = graft.core.Caches.cacheOnce(
      pqCodebooks(resid.where(sampleFilter), m, dim, codeMod))
    val codes = pqEncode(resid, books, m, dim)
    // one vec_id-keyed shuffle packs the codes AND carries the decoded
    // residual for the stored reconstruction norm
    val codedLists = assigned.select(col("cent_id"), col("vec_id"))
      .join(codes.join(broadcast(books), Seq("sub_id", "code_id"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(
          struct(col("sub_id"), col("code_id"), col("code_emb")))).as("scl"))
        .select(col("vec_id"),
          transform(col("scl"), x => x.getField("code_id")).as("codes"),
          flatten(transform(col("scl"), x => x.getField("code_emb"))).as("remb")),
        Seq("vec_id"))
      .join(broadcast(cents.select(col("cent_id"), col("cent_emb"))), Seq("cent_id"))
      .select(col("cent_id"), col("vec_id"), col("codes"),
        l2Norm(zip_with(col("remb"), col("cent_emb"), fadd)).as("nrm"))
    (cents, books, codedLists)
  }

  /** Serve residual IVF-PQ top-k: queries rank against the raw-sampled
    * centroids, ONLY probed lists decode (broadcast-codebook join), each
    * candidate reconstructs as c(x) + decode(codes), ADC-scored inside
    * the codegen'd `vec_dot` fold against its stored norm. */
  def ivfPqResidualServe(codedLists: DataFrame, books: DataFrame,
                         cents: DataFrame, queries: DataFrame,
                         nprobe: Int, k: Int): DataFrame = {
    val probes = broadcast(centroidRanks(queries, cents, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id")))
    val probed = codedLists
      .join(probes.select(col("cent_id")).distinct(), Seq("cent_id"), "left_semi")
    val recon = probed
      .select(col("cent_id"), col("vec_id"), col("nrm"),
        posexplode(col("codes")).as(Seq("sub_id", "code_id")))
      .join(broadcast(books), Seq("sub_id", "code_id"))
      .groupBy(col("cent_id"), col("vec_id"), col("nrm"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_emb")))),
        x => x.getField("code_emb"))).as("remb"))
      .join(broadcast(cents.select(col("cent_id"), col("cent_emb"))), Seq("cent_id"))
      .select(col("cent_id"), col("vec_id"), col("nrm"),
        zip_with(col("remb"), col("cent_emb"), fadd).as("embedding"))
    val scored = recon.join(probes, Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /** Residual IVF-PQ top-k, fresh build + serve in one call (see
    * `ivfPqResidualIndex` for the construction and `sampleFilter`). */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, m: Int,
                        dim: Int, codeMod: Int, centroidMod: Int,
                        nprobe: Int, k: Int,
                        sampleFilter: Column = lit(true)): DataFrame = {
    val (cents, books, codedLists) =
      ivfPqResidualIndex(corpus, m, dim, codeMod, centroidMod, sampleFilter)
    ivfPqResidualServe(codedLists, books, cents, queries, nprobe, k)
  }

  /**
   * IVF-PQ serving — the composition of the coarse quantizer (IVF lists,
   * q97) with product quantization (q99): the billion-vector deployment
   * shape, where the index holds m CODES per vector (plus shared
   * codebooks) instead of 4·dim bytes of floats. `codedLists` is
   * (cent_id, vec_id, nrm, codes array<int>) with `nrm` the
   * reconstruction's norm and lists assigned over the RECONSTRUCTED
   * corpus (the vectors the index actually serves — the q97 stance);
   * `books` is the `pqCodebooks` table.
   *
   * Scoring is ADC via reconstruction: candidates of the PROBED lists
   * only are decoded (one broadcast-codebook join over m rows per probed
   * vector, reassembled by sub_id), then scored with the codegen'd
   * `vec_dot` fold against the raw query — identical numbers to the LUT
   * formulation, with the fold order pinned for the oracle (see
   * `pqRoundtrip`). Work tracks nprobe × list size, never the corpus;
   * queries broadcast; the corpus shuffles only at index build.
   * Output: (query_id, vec_id, cos).
   */
  def ivfPqServe(codedLists: DataFrame, books: DataFrame, cents: DataFrame,
                 queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val probes = broadcast(centroidRanks(queries, cents, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id")))
    // decode ONLY the probed lists — the candidate-bounded serving cost
    val probed = codedLists
      .join(probes.select(col("cent_id")).distinct(), Seq("cent_id"), "left_semi")
    val recon = probed
      .select(col("cent_id"), col("vec_id"), col("nrm"),
        posexplode(col("codes")).as(Seq("sub_id", "code_id")))
      .join(broadcast(books), Seq("sub_id", "code_id"))
      .groupBy(col("cent_id"), col("vec_id"), col("nrm"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code_emb")))),
        x => x.getField("code_emb"))).as("embedding"))
    val scored = recon.join(probes, Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc_nulls_last, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k).drop("rnk")
  }

  /**
   * Embedding-cosine near-duplicate pairs: all (a < b) pairs with
   * cosine ≥ threshold, optionally restricted to pairs sharing `blockCol`
   * (metadata blocking — at 100 TB an unblocked all-pairs join is the I²
   * cliff; use SRP buckets or a metadata block).
   * Output: (vec_a, vec_b, cos).
   */
  def nearDupPairs(embs0: DataFrame, threshold: Double,
                   blockCol: Option[String] = None): DataFrame = {
    val embs = graft.core.Spread.byKey(embs0, col("vec_id")) // spread gated on input width
    val a = embs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      l2Norm(col("embedding")).as("nrm_a"), blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val b = embs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      l2Norm(col("embedding")).as("nrm_b"), blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val paired = blockCol match {
      case Some(_) => a.join(b, Seq("blk")) // hash join on the block key
      case None =>
        // no block key → an equi-join on a constant would collapse to ONE
        // partition; an explicit crossJoin plans a broadcast nested loop
        // that stays parallel over the left side's partitions
        a.drop("blk").crossJoin(broadcast(b.drop("blk")))
    }
    paired.where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineWithNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
   * cluster the corpus by nearest centroid (the IVF assignment pass),
   * compare embeddings PAIRWISE ONLY WITHIN EACH CLUSTER, connect the
   * ≥-threshold pairs into components, and keep the minimum-id member of
   * each component. Near-semantic duplicates land in the same centroid
   * cell with high probability, so the quadratic term drops from |corpus|²
   * to Σ|cluster|² — the centroid count is the knob that trades recall
   * against cost (exactly the SemDeDup design).
   *
   * Scale: assignment is a broadcast-centroids map pass; the in-cluster
   * self-join shuffles on cent_id; the component graph is the tiny
   * near-dup subset; the kept filter broadcasts the dropped-id set only
   * below `Dedup.BroadcastDroppedThreshold` (above it the anti-join runs
   * un-hinted) — corpus embeddings shuffle once (assignment) and never
   * again. Output: the KEPT rows of `embs`, schema-preserving.
   */
  def semanticDedup(embs: DataFrame, centroidMod: Int, threshold: Double): DataFrame = {
    val lists = graft.core.Caches.cacheOnce(
      ivfLists(embs, ivfCentroids(embs, centroidMod)))
    val pairs = lists.select(col("cent_id"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(lists.select(col("cent_id"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("cent_id"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineWithNorms(col("ea"), col("eb"), col("na"), col("nb")).as("cos"))
      .where(col("cos") >= threshold)
    val comps = Dedup.connectedComponents(pairs, "vec_a", "vec_b")
    val dropped = comps.where(col("id") =!= col("component"))
      .select(col("id").as("vec_id"))
    Dedup.keepCorpus(embs, dropped, "vec_id", comps.count())
  }

  /**
   * Embedding outlier flags — the mislabeled/noise-document filter used
   * before contrastive training and semantic clustering: every vector is
   * scored by cosine to its OWN nearest centroid, and a vector more than
   * `sigma` sample-stddevs below its cluster's mean self-similarity is
   * an outlier (far from everything it supposedly belongs with —
   * corrupted embeddings, off-distribution documents, encoder failures).
   * Per-CLUSTER statistics, not global: tight and diffuse clusters get
   * their own fences (a global fence flags whole diffuse clusters).
   *
   * Scale: assignment is the IVF shape (centroids broadcast — the same
   * table every IVF path already ships to executors), cluster stats are
   * one keyed agg at |centroids| rows rejoined by broadcast; the corpus
   * shuffles zero times beyond the assignment window's vec_id exchange.
   * Singleton clusters have NULL stddev ⇒ never outliers (no evidence).
   * `sampleFilter` bounds the CENTROID panel (index parameters are
   * fixed, not corpus fractions — the q105 stance): without it the
   * panel grows with the corpus and assignment cost turns
   * N·(N/centroidMod), measured 299 s at the sf10 probe vs seconds
   * bounded.
   *
   * Output: (vec_id, cent_id, cos_centroid rounded 1e-6, outlier).
   */
  def centroidOutliers(embs: DataFrame, centroidMod: Int, sigma: Double,
                       sampleFilter: Option[Column] = None): DataFrame = {
    require(sigma > 0.0, "sigma must be positive")
    val base = sampleFilter.map(embs.where).getOrElse(embs)
    val assigned = centroidRanks(
        graft.core.Spread.byKey(embs, col("vec_id")),
        ivfCentroids(base, centroidMod), 1)
      .select(col("vec_id"), col("cent_id"), col("cscore"))
    val stats = assigned.groupBy(col("cent_id"))
      .agg(avg(col("cscore")).as("mu"), stddev_samp(col("cscore")).as("sd"))
    assigned.join(broadcast(stats), Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        round(col("cscore"), 6).as("cos_centroid"),
        coalesce(col("cscore") < col("mu") - lit(sigma) * col("sd"), lit(false))
          .as("outlier"))
  }

  /** First-`m`-dimensions view of an embedding table — the
    * matryoshka-serving projection (Kusupati et al. 2022: MRL-trained
    * embeddings keep their semantics in every prefix, so serving can
    * trade dims for kernel/shuffle cost). Map-only; cosine re-normalizes
    * per pair, so no re-scaling is needed. */
  def prefixDims(embs: DataFrame, m: Int): DataFrame = {
    require(m >= 1, "prefixDims: m must be >= 1")
    embs.select(col("vec_id"), slice(col("embedding"), 1, m).as("embedding"))
  }

  /**
   * Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
   * Parallel Corpus Mining with Multilingual Sentence Embeddings") — the
   * operator that builds machine-translation training pairs from two
   * unaligned corpora: raw cosine over-fires in dense regions (a hub
   * sentence is "closest" to everything), so each candidate pair scores
   * by its cosine RELATIVE to both endpoints' neighborhoods,
   *
   *   margin(x, y) = cos(x, y) / ((avgₖ(x) + avgₖ(y)) / 2)
   *
   * with avgₖ the mean cosine of the endpoint's k nearest candidates,
   * and each source keeps its best-margin target above `threshold`.
   *
   * Scale path: candidates come from a shared SRP sign bucket (the
   * lshTopK blocking — never src × tgt), both neighborhood ranks and
   * the final argmax are endpoint-partitioned windows over that
   * candidate table, and the k-cosine means are ORDERED folds
   * (sort_array → left fold) so the arithmetic is engine-identical —
   * a plain SUM over doubles would drift with aggregation order right
   * where near-tie margins sit. The argmax ranks on the 1e-6-ROUNDED
   * margin (tgt-id tiebreak), the bruteForceTopKRounded stance: the
   * boundary itself must be engine-reproducible.
   *
   * Output: (src_id, tgt_id, margin rounded 1e-6) — at most one row per
   * source; sources whose bucket holds no target simply emit nothing.
   */
  def marginMinePairs(src: DataFrame, tgt: DataFrame, planes: Seq[Seq[Int]],
                      k: Int, threshold: Double): DataFrame = {
    require(k >= 1, "marginMinePairs: k must be >= 1")
    val sb = withBucket(graft.core.Spread.byKey(src, col("vec_id")), planes)
      .select(col("vec_id").as("src_id"), col("embedding").as("s_emb"),
        l2Norm(col("embedding")).as("s_nrm"), col("bucket"))
    val tb = withBucket(graft.core.Spread.byKey(tgt, col("vec_id")), planes)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"),
        l2Norm(col("embedding")).as("t_nrm"), col("bucket"))
    val cand = graft.core.Caches.cacheOnce(sb.join(tb, Seq("bucket"))
      .select(col("src_id"), col("tgt_id"),
        cosineWithNorms(col("s_emb"), col("t_emb"),
          col("s_nrm"), col("t_nrm")).as("cos")))
    // k-cosine mean with the ORACLE's NULL algebra (a zero-norm vector —
    // possible under the hashing encoder on token-free sentences — makes
    // its cosines NULL): DuckDB's list() KEEPS NULLs, so one NULL cosine
    // poisons the fold to NULL, and the divisor is the ROW count — while
    // Spark's collect_list silently DROPS NULLs and size() of an empty
    // list is 0, an ANSI divide-by-zero (measured: q235 at sf0.1).
    // Mirror DuckDB: NULL when any top-k cosine is NULL, else the
    // ordered fold over the (all non-NULL) list divided by the row count
    // (identical to the old expression whenever no NULL appears).
    def foldMean(c: Column): Column =
      when(count(col("cos")) < count(lit(1)), lit(null).cast("double"))
        .otherwise(
          aggregate(sort_array(c), lit(0.0), (a, x) => a + x) /
            count(lit(1)).cast("double"))
    val wS = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc_nulls_last, col("tgt_id"))
    val wT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc_nulls_last, col("src_id"))
    val fwd = cand.withColumn("r", row_number().over(wS)).where(col("r") <= k)
      .groupBy(col("src_id"))
      .agg(foldMean(collect_list(col("cos"))).as("avg_s"))
    val bwd = cand.withColumn("r", row_number().over(wT)).where(col("r") <= k)
      .groupBy(col("tgt_id"))
      .agg(foldMean(collect_list(col("cos"))).as("avg_t"))
    // margin denominator can be exactly 0.0 (all-zero cosine
    // neighborhoods); DuckDB yields NULL for double/0 — mirror it
    // instead of tripping ANSI division (NULL denominators already
    // propagate NULL through the division on both engines).
    val den = (col("avg_s") + col("avg_t")) / 2.0
    val margins = cand
      .join(fwd, Seq("src_id"))
      .join(bwd, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        round(when(den === 0.0, lit(null).cast("double"))
          .otherwise(col("cos") / den), 6).as("margin"))
    val wBest = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc_nulls_last, col("tgt_id"))
    margins.withColumn("rb", row_number().over(wBest))
      .where(col("rb") === 1 && col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"), col("margin"))
  }

  /**
   * Greedy k-center coreset selection (Gonzalez 1985; the
   * farthest-point-traversal coreset used for diverse subset selection —
   * Sener & Savarese 2018 applied it to data selection): seed with the
   * smallest id, then repeatedly pick the candidate FARTHEST from the
   * selected set (max over candidates of min cosine-distance to any
   * pick = min of MAX cosine; rounded 1e-6 before the argmin, id
   * tiebreak) — the 2-approximation to the k-center cover, i.e. the k
   * rows that best SPREAD over the panel. The dual of MMR: no relevance
   * term, pure coverage; the sampler that keeps a fine-tuning subset
   * from collapsing onto the densest mode.
   *
   * Sequential by nature, so it only ever runs over a BOUNDED candidate
   * panel (the mmrDiversify stance): each step is one crossJoin of the
   * ≤|panel| remaining rows against the ≤k picked vectors plus one
   * TakeOrdered(1) whose single row returns to the driver — the
   * Lloyd-round pattern, one bounded row per round, over the cached
   * panel.
   *
   * Output: (step 1..k, vec_id, max_cos rounded — NULL for the seed).
   */
  def kCenterSelect(candidates: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "kCenterSelect: k must be >= 1")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = candidates.sparkSession
    val cand = graft.core.Caches.cacheOnce(
      candidates.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm")))
    val outSchema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("max_cos", DoubleType, nullable = true)))
    val picked = scala.collection.mutable.ArrayBuffer.empty[Row]
    var exhausted = false
    for (step <- 1 to k if !exhausted) {
      val ids = picked.map(_.get(1))
      val win =
        if (ids.isEmpty)
          cand.orderBy(col("vec_id")).limit(1)
            .select(col("vec_id"), lit(null).cast("double").as("max_cos"))
            .collect()
        else {
          val selVecs = broadcast(cand.where(col("vec_id").isin(ids.toSeq: _*))
            .select(col("embedding").as("s_emb"), col("nrm").as("s_nrm")))
          cand.where(!col("vec_id").isin(ids.toSeq: _*))
            .crossJoin(selVecs)
            .select(col("vec_id"),
              cosineWithNorms(col("embedding"), col("s_emb"),
                col("nrm"), col("s_nrm")).as("sim"))
            .groupBy(col("vec_id"))
            .agg(round(max(col("sim")), 6).as("max_cos"))
            .orderBy(col("max_cos").asc_nulls_last, col("vec_id")).limit(1)
            .collect()
        }
      if (win.isEmpty) exhausted = true
      else picked += Row.fromSeq(step.toLong +: win(0).toSeq)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .BufferHasAsJava(picked).asJava), outSchema)
  }

  /**
   * IVF serving AUTO-TUNE (the EXT-C6 auto-probe pattern applied to the
   * serving knob): measure recall@k for every candidate `nprobe` in
   * 1..maxNProbe on a bounded query panel against the index's OWN
   * inverted lists, and choose the cheapest candidate that clears the
   * recall target — the measured answer to "what nprobe do I deploy",
   * replacing the folklore default. The target is a RATIONAL
   * `targetNum/targetDen` and every comparison is exact-integer
   * (`hits·den ≥ total·num`), so the decision replays bit-identically in
   * oracle SQL — no float-threshold row-membership anywhere. If no
   * candidate reaches the target, the rule falls back to the best
   * measured recall (smallest nprobe on ties, recall being monotone in
   * nprobe up to rank noise).
   *
   * Cost: ONE brute-truth pass over the panel (the q41 machinery), ONE
   * probe join at maxNProbe tagging each candidate pair with the probe
   * rank `m` it entered through (a corpus vector lives in exactly one
   * list, so pairs are unique), then per-candidate top-k cuts over that
   * cached table — the panel is bounded, so the whole tune is one corpus
   * pass + panel-sized work, at 100 TB the same bill as serving the
   * panel once.
   *
   * Output: (nprobe, hits, total, recall rounded 1e-6, chosen) —
   * maxNProbe rows, exactly one chosen.
   */
  def tuneNProbe(lists: DataFrame, cents: DataFrame, queries: DataFrame,
                 k: Int, maxNProbe: Int,
                 targetNum: Int, targetDen: Int): DataFrame = {
    require(k >= 1 && maxNProbe >= 1, "tuneNProbe: k and maxNProbe must be >= 1")
    require(targetDen >= 1 && targetNum >= 0,
      "tuneNProbe: target must be a non-negative rational")
    // Ground truth from the index's own vectors: the lists ARE the corpus
    // (every vector files under exactly one centroid), so the tune needs
    // no side channel back to the raw embedding table.
    val corpus = lists.select(col("vec_id"), col("embedding"))
    val truth = graft.core.Caches.cacheOnce(
      bruteForceTopK(queries, corpus, k).select(col("query_id"), col("vec_id")))
    val probes = broadcast(centroidRanks(queries, cents, maxNProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id"), col("crnk").as("m")))
    val scored = graft.core.Caches.cacheOnce(lists.join(probes, Seq("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("m"),
        cosineWithNorms(col("q_emb"), col("embedding"),
          col("q_nrm"), col("nrm")).as("cos")))
    val totalRow = broadcast(truth.agg(count(lit(1)).as("total")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("vec_id"))
    val stats = (1 to maxNProbe).map { p =>
      scored.where(col("m") <= p)
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
        .join(truth, Seq("query_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(p).as("nprobe"), col("hits"))
    }.reduce(_ unionByName _).crossJoin(totalRow)
    // Exact-integer decision, two 1-row broadcast aggregates (a
    // constant-group window would single-partition; these stay planless).
    val m1 = broadcast(stats.agg(
      min(when(col("hits") * targetDen >= col("total") * targetNum,
        col("nprobe"))).as("min_ok"),
      max(col("hits")).as("max_hits")))
    val m2 = broadcast(stats.crossJoin(m1).agg(
      first(col("min_ok")).as("min_ok"),
      min(when(col("hits") === col("max_hits"), col("nprobe"))).as("best_p")))
    stats.crossJoin(m2)
      .select(col("nprobe").cast("int").as("nprobe"), col("hits"), col("total"),
        round(col("hits").cast("double") / col("total").cast("double"), 6)
          .as("recall"),
        (col("nprobe") === coalesce(col("min_ok"), col("best_p"))).as("chosen"))
      .orderBy(col("nprobe"))
  }
}
