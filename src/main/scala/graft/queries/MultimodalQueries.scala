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

  /** Planted re-upload id offset for the perceptual near-dup gates
    * (q221): a HIGH-BIT offset (2^41 ≈ 2.2e12) no real media_id can
    * reach — doc ids are dense from 0, and 2^41 documents is ~three
    * orders of magnitude past a 100 TB corpus — so planted ids can
    * never collide with real ones at any scale (a fixed small offset
    * would collide once doc_id passed it, silently degrading the
    * "every plant surfaces as a dist-0 pair" invariant). */
  private val PlantOffset = 1L << 41

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
    ,

    // EXT-M6: perceptual near-dup over image payloads — 60-bit dHash
    // (stub luma grid; the real javax.imageio face is spec-gated) into
    // the banded Hamming tier shared with the SimHash dedup. Payload
    // bytes never shuffle — only the 8-byte hash; the oracle replays
    // grid, bit layout, banding, and XOR/popcount. Re-uploads are
    // PLANTED (every 5th image repeated under a shifted id — the q63
    // pattern) so the pair tier provably fires: each plant must surface
    // as a dist-0 pair.
    "q221_media_dhash" -> ((s, dir) => {
      val m = media(s, dir).where(col("kind") === "image")
      val planted = m.where(col("media_id") % 5 === 0)
        .withColumn("media_id", col("media_id") + lit(PlantOffset))
      Multimodal.dHashPairs(m.unionByName(planted), maxDist = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // EXT-M7: perceptual near-dup over audio payloads — 60-bit energy-
    // envelope hash (stub window energies; the real javax.sound.sampled
    // face is spec-gated) into the same banded Hamming tier as q221.
    // Byte-exact q95 misses every re-encode; the envelope tier is what
    // catches a re-encoded or gain-shifted upload. Re-uploads are
    // PLANTED (every 5th audio repeated under the high-bit offset) so
    // the pair tier provably fires: each plant must surface as a
    // dist-0 pair.
    "q224_audio_env" -> ((s, dir) => {
      val m = media(s, dir).where(col("kind") === "audio")
      val planted = m.where(col("media_id") % 5 === 0)
        .withColumn("media_id", col("media_id") + lit(PlantOffset))
      Multimodal.envHashPairs(m.unionByName(planted), maxDist = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // EXT-M8: perceptual near-dup over video payloads — per-frame md5
    // luma grids (the q221 recipe salted by frame index, one frame per
    // 500 ms from the duration metadata) strict-majority-pooled into
    // one 60-bit temporal hash, then the shared banded Hamming tier.
    // Majority pooling is the video-specific move: a few edited or
    // re-encoded frames are outvoted (real face `videoHashFromFrames`
    // pools real imageDHash over pre-decoded frames, spec-gated).
    // Plants as in q221/q224: every 5th video repeated under the
    // high-bit offset must surface as a dist-0 pair.
    "q226_video_phash" -> ((s, dir) => {
      val m = media(s, dir).where(col("kind") === "video")
        .withColumn("n_frames",
          Multimodal.videoFrameCount(col("meta.durationMs")))
      val planted = m.where(col("media_id") % 5 === 0)
        .withColumn("media_id", col("media_id") + lit(PlantOffset))
      Multimodal.videoHashPairs(m.unionByName(planted), maxDist = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    })
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
         |FROM media WHERE kind = 'image' ORDER BY media_id""".stripMargin,

    // dHash replay: the stub luma grid (first md5 byte of digest:r:c),
    // 60-bit assembly, the q83 band/XOR/popcount chain, maxDist 4.
    "q221_media_dhash" -> {
      val rows = Multimodal.DHashRows
      val cols = Multimodal.DHashCols
      s"""WITH $MediaCte,
         |imgs AS (SELECT media_id, text FROM media WHERE kind = 'image'
         |         UNION ALL
         |         SELECT media_id + $PlantOffset, text FROM media
         |         WHERE kind = 'image' AND media_id % 5 = 0),
         |dh AS (SELECT media_id, list_reduce(
         |    list_prepend(0::BIGINT, list_transform(range(0, ${rows * cols}),
         |      x -> x::BIGINT)),
         |    (acc, j) -> acc + CASE WHEN
         |      ('0x' || substr(md5(md5(text) || ':' || (j // $cols)
         |        || ':' || (j % $cols + 1)), 1, 2))::BIGINT
         |      > ('0x' || substr(md5(md5(text) || ':' || (j // $cols)
         |        || ':' || (j % $cols)), 1, 2))::BIGINT
         |      THEN (1::BIGINT << j) ELSE 0 END) AS sh
         |  FROM imgs),
         |bl AS (SELECT media_id, b, (sh >> (12 * b)) & 4095 AS bk
         |       FROM dh, unnest(range(0, 5)) AS t(b)),
         |cand AS (SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
         |         FROM bl a JOIN bl b
         |           ON a.b = b.b AND a.bk = b.bk AND a.media_id < b.media_id)
         |SELECT doc_a, doc_b, bit_count(xor(sa.sh, sb.sh))::BIGINT AS dist
         |FROM cand JOIN dh sa ON sa.media_id = cand.doc_a
         |          JOIN dh sb ON sb.media_id = cand.doc_b
         |WHERE bit_count(xor(sa.sh, sb.sh)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // envelope-hash replay: the stub window energies (first md5 byte of
    // digest:env:j), 60-bit assembly, the same band/XOR/popcount chain.
    "q224_audio_env" -> {
      val w = Multimodal.EnvWindows
      s"""WITH $MediaCte,
         |auds AS (SELECT media_id, text FROM media WHERE kind = 'audio'
         |         UNION ALL
         |         SELECT media_id + $PlantOffset, text FROM media
         |         WHERE kind = 'audio' AND media_id % 5 = 0),
         |eh AS (SELECT media_id, list_reduce(
         |    list_prepend(0::BIGINT, list_transform(range(0, ${w - 1}),
         |      x -> x::BIGINT)),
         |    (acc, j) -> acc + CASE WHEN
         |      ('0x' || substr(md5(md5(text) || ':env:' || (j + 1)), 1, 2))::BIGINT
         |      > ('0x' || substr(md5(md5(text) || ':env:' || j), 1, 2))::BIGINT
         |      THEN (1::BIGINT << j) ELSE 0 END) AS sh
         |  FROM auds),
         |bl AS (SELECT media_id, b, (sh >> (12 * b)) & 4095 AS bk
         |       FROM eh, unnest(range(0, 5)) AS t(b)),
         |cand AS (SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
         |         FROM bl a JOIN bl b
         |           ON a.b = b.b AND a.bk = b.bk AND a.media_id < b.media_id)
         |SELECT doc_a, doc_b, bit_count(xor(sa.sh, sb.sh))::BIGINT AS dist
         |FROM cand JOIN eh sa ON sa.media_id = cand.doc_a
         |          JOIN eh sb ON sb.media_id = cand.doc_b
         |WHERE bit_count(xor(sa.sh, sb.sh)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // temporal-pooled video hash replay: per-frame stub grids (the q221
    // assembly salted with the frame index), per-bit strict-majority
    // vote across ⌊duration/500⌋+1 frames, then the band/XOR/popcount
    // chain.
    "q226_video_phash" -> {
      val rows = Multimodal.DHashRows
      val cols = Multimodal.DHashCols
      s"""WITH $MediaCte,
         |vids AS (SELECT media_id, text, duration_ms // 500 + 1 AS nf
         |         FROM media WHERE kind = 'video'
         |         UNION ALL
         |         SELECT media_id + $PlantOffset, text, duration_ms // 500 + 1
         |         FROM media WHERE kind = 'video' AND media_id % 5 = 0),
         |fh AS (SELECT media_id, list_reduce(
         |    list_prepend(0::BIGINT, list_transform(range(0, ${rows * cols}),
         |      x -> x::BIGINT)),
         |    (acc, j) -> acc + CASE WHEN
         |      ('0x' || substr(md5(md5(text) || ':' || f || ':' || (j // $cols)
         |        || ':' || (j % $cols + 1)), 1, 2))::BIGINT
         |      > ('0x' || substr(md5(md5(text) || ':' || f || ':' || (j // $cols)
         |        || ':' || (j % $cols)), 1, 2))::BIGINT
         |      THEN (1::BIGINT << j) ELSE 0 END) AS fh
         |  FROM vids, unnest(range(0, nf)) AS t(f)),
         |cnt AS (SELECT media_id, j, SUM((fh >> j) & 1) AS c, COUNT(*) AS nf
         |        FROM fh, unnest(range(0, ${rows * cols})) AS tj(j)
         |        GROUP BY 1, 2),
         |vh AS (SELECT media_id,
         |         SUM(CASE WHEN 2 * c > nf THEN (1::BIGINT << j)
         |             ELSE 0 END)::BIGINT AS sh
         |       FROM cnt GROUP BY 1),
         |bl AS (SELECT media_id, b, (sh >> (12 * b)) & 4095 AS bk
         |       FROM vh, unnest(range(0, 5)) AS t(b)),
         |cand AS (SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
         |         FROM bl a JOIN bl b
         |           ON a.b = b.b AND a.bk = b.bk AND a.media_id < b.media_id)
         |SELECT doc_a, doc_b, bit_count(xor(sa.sh, sb.sh))::BIGINT AS dist
         |FROM cand JOIN vh sa ON sa.media_id = cand.doc_a
         |          JOIN vh sb ON sb.media_id = cand.doc_b
         |WHERE bit_count(xor(sa.sh, sb.sh)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin
    }
  )
}
