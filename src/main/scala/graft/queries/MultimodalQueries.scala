package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/**
 * Multimodal binary-column queries (EXT operators, SURVEY §2.11) over the
 * deterministic media table synthesized from `documents` (payload =
 * utf8(text)). The decode step is a stub (see Multimodal) but the
 * distributed plumbing is real: q29 runs the typed `mapPartitions`
 * decoder path and the oracle recomputes its md5-derived fake features
 * in SQL — so the Dataset/Encoder machinery itself is inside the
 * correctness gate.
 */
object MultimodalQueries extends QueryPack {

  private val Fps = 2 // frame sampling rate (500 ms step)

  private def media(s: SparkSession, dir: String) =
    Multimodal.synthesize(Tables.read(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXT-M1: metadata projection + payload size (payload never shuffles).
    "q27_media_meta" -> ((s, dir) =>
      Multimodal.describe(media(s, dir))
        .orderBy(col("media_id"))),

    // EXT-M5: exact payload dedup per modality — digests computed
    // map-side, payload bytes never shuffle.
    "q95_media_dedup" -> ((s, dir) =>
      Multimodal.dedupPayloads(media(s, dir))
        .orderBy(col("kind"), col("digest"))),

    // EXT-M2: frame sampling from duration metadata (videos only).
    "q28_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), Fps)
        .orderBy(col("media_id"), col("frame_idx"))),

    // EXT-M3: stubbed decode + feature extraction via typed mapPartitions.
    "q29_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(media(s, dir)).toDF()
        .select(col("mediaId").as("media_id"), col("nBytes").as("n_bytes"),
          posexplode(col("features")).as(Seq("dim", "f")))
        .select(col("media_id"), col("n_bytes"), col("dim").cast("long").as("dim"),
          round(col("f"), 6).as("f"))
        .orderBy(col("media_id"), col("dim"))),

    // EXT-M4: fit-into-box resize of image metadata.
    "q30_resize_meta" -> ((s, dir) =>
      Multimodal.resizeMeta(media(s, dir).where(col("kind") === "image"), 256, 256)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("resized.width").as("rw"), col("resized.height").as("rh"))
        .orderBy(col("media_id")))
  )

  // DuckDB mirrors -----------------------------------------------------------

  private val MediaCte =
    """media AS (SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS kind,
      |  text, n_chars,
      |  (n_chars % 640 + 64)::INTEGER AS width,
      |  (n_chars % 480 + 48)::INTEGER AS height,
      |  (n_chars % 2 * 22050 + 22050)::INTEGER AS sample_rate,
      |  (n_chars % 10000 + 1000)::INTEGER AS duration_ms
      |  FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q27_media_meta" ->
      s"""WITH $MediaCte
         |SELECT media_id, kind, octet_length(encode(text))::BIGINT AS n_bytes,
         |       width, height, sample_rate, duration_ms
         |FROM media ORDER BY media_id""".stripMargin,

    "q95_media_dedup" ->
      s"""WITH $MediaCte
         |SELECT kind, md5(text) AS digest, MIN(media_id) AS canonical_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_dups
         |FROM media GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q28_frame_sample" ->
      s"""WITH $MediaCte
         |SELECT media_id, f::BIGINT AS frame_idx, (f * 500)::BIGINT AS ts_ms
         |FROM media, unnest(range(0, duration_ms // 500 + 1)) AS t(f)
         |WHERE kind = 'video'
         |ORDER BY 1, 2""".stripMargin,

    "q29_decode_features" ->
      s"""WITH $MediaCte
         |SELECT media_id, octet_length(encode(text))::BIGINT AS n_bytes,
         |  j::BIGINT AS dim,
         |  ROUND(('0x' || substr(md5(md5(text) || ':' || j), 1, 15))::BIGINT
         |        / 1152921504606846976::DOUBLE, 6) AS f
         |FROM media, unnest(range(0, ${Multimodal.FakeDim})) AS t(j)
         |ORDER BY 1, 3""".stripMargin,

    "q30_resize_meta" ->
      s"""WITH $MediaCte
         |SELECT media_id, width, height,
         |  floor(width::DOUBLE * LEAST(256.0 / width::DOUBLE,
         |        256.0 / height::DOUBLE, 1.0))::INTEGER AS rw,
         |  floor(height::DOUBLE * LEAST(256.0 / width::DOUBLE,
         |        256.0 / height::DOUBLE, 1.0))::INTEGER AS rh
         |FROM media WHERE kind = 'image' ORDER BY media_id""".stripMargin
  )
}
