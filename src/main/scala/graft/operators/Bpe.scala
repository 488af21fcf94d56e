package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Caches

/**
 * Distributed byte-pair-encoding merge training — the tokenizer-building
 * step of an LLM data pipeline, run corpus-side.
 *
 * Classic BPE (Sennrich et al. 2016, public algorithm) trains on the
 * WORD-FREQUENCY table, not the raw corpus: the corpus collapses to
 * (word, freq) once — a vocabulary-sized table that SATURATES as the
 * corpus grows (new data mostly re-weights existing words), which is why
 * this is tractable at 100 TB: the heavy step is one distributed
 * tokenize + groupBy over the corpus; each merge round then runs over
 * the (cached, vocabulary-sized) word table only.
 *
 * Per round: count adjacent symbol pairs (weighted by word frequency,
 * overlapping slots counted — "aaa" contributes (a,a) twice), pick the
 * most frequent pair (ties broken lexicographically), and rewrite every
 * word, merging occurrences greedily left-to-right. The argmax is a
 * 1-row driver probe (the same bounded-collect class as the Lloyd
 * centroid refinements); the rewrite is a map-only string `replace`.
 *
 * Symbol sequences are encoded as `;`-delimited strings with leading AND
 * trailing delimiters (";a;b;c;"): the pair (a,b) occurs exactly where
 * ";a;b;" occurs, token boundaries can never false-match inside a longer
 * token, and a left-to-right non-overlapping `replace` of ";a;b;" with
 * ";ab;" is precisely the greedy merge (the replacement re-supplies the
 * `;` shared with the next pair). Tokens are [a-z]+ by construction, so
 * the delimiter is safe. Every step is plain relational + string
 * arithmetic — the DuckDB oracle replays all rounds verbatim.
 */
object Bpe {

  /** The (word, freq, enc) table: lower-cased [a-z]+ words of `textCol`,
    * length-capped (BPE vocabularies cap word length; also bounds the
    * rewrite strings), with the initial per-character encoding. */
  def wordTable(docs: DataFrame, textCol: String = "text",
                maxWordLen: Int = 12): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("enc", concat(lit(";"), regexp_replace(col("word"), "(.)", "$1;")))

  /** Adjacent-pair frequencies of an encoded word table: map-only
    * extraction (split → transform → explode; no join) then one hash
    * aggregate on the pair. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        expr("filter(split(enc, ';'), x -> x <> '')").as("t"))
      .select(col("freq"),
        explode(expr(
          """CASE WHEN size(t) >= 2
            |THEN transform(sequence(1, size(t) - 1),
            |               i -> struct(t[i - 1] AS l, t[i] AS r))
            |ELSE array() END""".stripMargin)).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `nMerges` BPE merges over `docs`. Returns the merge table
    * (round, left, right, merged, cnt) — driver-sized by definition (one
    * row per merge), like a centroid table. Stops early if the corpus
    * runs out of pairs. */
  def trainMerges(spark: SparkSession, docs: DataFrame, nMerges: Int,
                  textCol: String = "text", maxWordLen: Int = 12): DataFrame = {
    var words = Caches.cacheOnce(wordTable(docs, textCol, maxWordLen))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      // 1-row bounded driver probe: TakeOrderedAndProject, no global sort.
      val best = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(round.toLong, l, r, l + r, c)
        val prev = words
        words = Caches.cacheOnce(prev.withColumn("enc",
          expr(s"replace(enc, ';$l;$r;', ';$l$r;')")))
        words.count() // materialize before releasing the parent
        Caches.release(prev)
        round += 1
      }
    }
    Caches.release(words)
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(merges.toSeq: _*), schema)
  }
}
