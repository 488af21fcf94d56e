package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Preference-data construction — the alignment-tier counterpart of the
 * SFT assembly in `streaming/EventStreams.assembleConversations`: turn
 * scored candidate groups into (chosen, rejected) training pairs (the
 * DPO/RLHF reward-modeling input shape), and fit per-group strengths
 * from the resulting pairwise outcomes (Bradley–Terry via Hunter 2004's
 * MM iteration — the model behind arena-style leaderboards).
 *
 * Scale shape: `preferencePairs` is ONE map-side-combinable hash
 * aggregate over the prompt key — no window, no sort, no join; group
 * count grows with the corpus while group size stays bounded (candidates
 * per prompt), so partial aggregation absorbs almost everything
 * map-side. `bradleyTerry` reduces the outcome log corpus-side to a
 * (winner, loser) count matrix bounded by players² and iterates MM over
 * that collected matrix driver-side — bounded index state, the same
 * Lloyd-round pattern as `Selection.logisticTrain` / k-means training.
 */
object Preference {

  /**
   * (chosen, rejected) pair per prompt group: chosen = highest score
   * (ties → lowest id), rejected = lowest score (ties → highest id);
   * groups emit only when ≥ 2 candidates AND the 1e-6-rounded score gap
   * reaches `minMargin` (margin-gated pairs train cleaner reward models
   * than coin-flip comparisons). NULL scores are excluded up front —
   * a NULL candidate must not become either side of a pair.
   *
   * `carryCols` ride inside the argmax/argmin structs (AFTER the
   * deciding (score, -id) prefix, so they never influence selection)
   * and come out as `chosen_<c>` / `rejected_<c>` — payload without a
   * corpus-sized join back onto the candidate table.
   */
  def preferencePairs(scored: DataFrame, promptCol: String, idCol: String,
                      scoreCol: String, minMargin: Double,
                      carryCols: Seq[String] = Nil): DataFrame = {
    require(minMargin > 0.0, "preferencePairs: minMargin must be > 0")
    val deciding = Seq(col(scoreCol).as("s"), (-col(idCol)).as("ni"))
    val payload = carryCols.map(c => col(c).as(s"__$c"))
    val packed = struct(deciding ++ payload: _*)
    val base = scored.where(col(scoreCol).isNotNull)
    def side(st: Column, prefix: String) =
      Seq((-st.getField("ni")).as(s"${prefix}_id"),
          st.getField("s").as(s"${prefix}_score")) ++
        carryCols.map(c => st.getField(s"__$c").as(s"${prefix}_$c"))
    base.groupBy(col(promptCol))
      .agg(max(packed).as("ch"), min(packed).as("rj"),
        count(lit(1)).as("__n"))
      .where(col("__n") >= 2)
      .select(col(promptCol) +: (side(col("ch"), "chosen") ++
        side(col("rj"), "rejected") :+
        round(col("ch.s") - col("rj.s"), 6).as("margin")): _*)
      .where(col("margin") >= minMargin)
  }

  /**
   * Bradley–Terry strength trajectory from a (winner, loser) outcome
   * log. Corpus-side work is one hash aggregate to the pairwise count
   * matrix; the MM iteration (Hunter 2004, eq. 1.4 —
   * wᵢ ← (Wᵢ + ½) / Σ_j n_ij/(wᵢ+w_j), then normalize to Σw = 1) runs
   * driver-side over that collected matrix, which the caller must keep
   * index-parameter-sized (players², NOT corpus-sized — here players
   * are sources/domains/models, a bounded panel). Self-matches are
   * dropped (they carry no signal and would put w_i against itself).
   *
   * The ½ pseudo-win regularizer keeps every strength strictly
   * positive — an all-losing player would otherwise hit 0 and make the
   * next round's w_i + w_j denominator vanish when two such players
   * met. Determinism: weights round 1e-9 after each round's
   * normalization (the q137/q141 convention), driver folds run in
   * sorted-player order, so the whole trajectory replays in unrolled
   * oracle SQL. Output: (round, player, strength), round 0 = uniform.
   */
  def bradleyTerry(spark: SparkSession, outcomes: DataFrame,
                   winnerCol: String, loserCol: String,
                   rounds: Int, maxPlayers: Int = 10000): DataFrame = {
    require(rounds >= 1, "bradleyTerry: rounds must be >= 1")
    require(maxPlayers >= 2, "bradleyTerry: maxPlayers must be >= 2")
    def rnd9(x: Double) = math.rint(x * 1e9) / 1e9
    // Enforce the players² driver bound BEFORE collecting the matrix —
    // the one collect whose bound is a property of the DATA, not a
    // parameter, so it must raise loudly instead of OOMing the driver
    // when someone points it at a corpus-sized player column.
    val nPlayers = outcomes
      .select(explode(array(col(winnerCol).cast("string"),
        col(loserCol).cast("string"))).as("p"))
      .agg(count_distinct(col("p"))).head().getLong(0)
    require(nPlayers <= maxPlayers,
      s"bradleyTerry: $nPlayers distinct players exceeds maxPlayers=" +
        s"$maxPlayers — the MM fit collects a players² count matrix " +
        "driver-side; raise maxPlayers only if players² fits in driver memory")
    val games = outcomes
      .where(col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(games.nonEmpty, "bradleyTerry: no non-self outcomes")
    val players = games.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val wins: Map[String, Double] =
      players.map(p => p -> games.filter(_._1 == p).map(_._3).sum.toDouble).toMap
    // Undirected per-pair game counts (a < b canonical key).
    val nij: Seq[((String, String), Double)] = games
      .groupBy(g => if (g._1 < g._2) (g._1, g._2) else (g._2, g._1))
      .map { case (k, gs) => k -> gs.map(_._3).sum.toDouble }
      .toSeq.sortBy(_._1)
    var w: Map[String, Double] = players.map(_ -> rnd9(1.0 / players.size)).toMap
    val traj = Seq.newBuilder[(Long, String, Double)]
    players.foreach(p => traj += ((0L, p, w(p))))
    for (r <- 1 to rounds) {
      val raw = players.map { p =>
        val den = nij.iterator
          .filter { case ((a, b), _) => a == p || b == p }
          .map { case ((a, b), n) => n / (w(a) + w(b)) }.sum
        p -> ((wins(p) + 0.5) / den)
      }
      val norm = raw.map(_._2).sum // sorted-player fold
      w = raw.map { case (p, x) => p -> rnd9(x / norm) }.toMap
      players.foreach(p => traj += ((r.toLong, p, w(p))))
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("player", StringType, nullable = false),
      StructField("strength", DoubleType, nullable = false)))
    val rows = traj.result().map { case (r, p, s) => Row(r, p, s) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
