package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)

/** One media asset: opaque bytes + typed metadata. The engine never
  * interprets `data` except through a registered decoder. */
case class MediaRow(mediaId: Long, kind: String, data: Array[Byte], meta: MediaMeta)

/** Decoder output: fixed-width feature vector per asset. */
case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long, features: Array[Double])

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, plus decode / feature-extract /
 * resize / frame-sample operators.
 *
 * The Spark-side machinery — schema, partition-preserving batch iteration,
 * decoder signature, typed Encoders — is real and tested. The DECODE STEP
 * ITSELF IS A STUB: this container has no image/audio codecs, so
 * `stubDecoder` produces a deterministic md5-derived fake feature vector.
 * Swapping in a real decoder (JNI/ONNX/javacv) is a one-argument change to
 * `decodeFeatures`; nothing else moves. The fake is also expressible as a
 * pure Column expression (`fakeFeatureExpr`), which is what the oracle
 * checks — guaranteeing the distributed plumbing and the row-level
 * semantics agree.
 *
 * Scale notes: payload bytes never shuffle — every operator here is
 * map-only over the media table's file splits; metadata-only outputs
 * (features, frames) are the only thing that moves. Frame sampling
 * explodes to (asset × frames) rows but carries no payload.
 */
object Multimodal {

  /** Deterministic synthetic media table derived from `documents` — the
    * fixture for binary-column plumbing (no real media in the container).
    * data = utf8(text); kind cycles by source; metadata is derived
    * arithmetic on n_chars, so every engine can recompute it. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"),
        (col("n_chars") % 2 * 22050 + 22050).cast("int").as("sampleRate"),
        (col("n_chars") % 10000 + 1000).cast("int").as("durationMs")).as("meta"))

  /** Exact payload dedup per modality: one row per distinct (kind,
    * payload digest), canonical id = min(media_id). The digest is
    * computed MAP-SIDE, so only (kind, 16-byte md5, id) ever shuffles —
    * at 100 TB the payloads (the overwhelming mass) stay in the scan
    * stage; the binary-column twin of `Dedup.exactGroups`. */
  def dedupPayloads(media: DataFrame): DataFrame =
    media.groupBy(col("kind"), md5(col("data")).as("digest"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))

  /** Metadata projection without touching payload bytes (column pruning
    * keeps `data` out of the scan entirely when this is all you ask for). */
  def describe(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("data")).cast("long").as("n_bytes"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.sampleRate").as("sample_rate"), col("meta.durationMs").as("duration_ms"))

  /** Fit-into-box resize of the metadata (payload untouched — a real
    * pipeline would pair this with a decoder stage): scales (width,height)
    * to fit (maxW,maxH) preserving aspect ratio, integer floor. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    media.withColumn("resized", struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height")))
  }

  /** Frame sampling: one row per sampled frame at `fps`, from the duration
    * metadata. Pure expression — (media_id, frame_idx, ts_ms) rows.
    * Timestamps use exact rational arithmetic — frame i at ⌊i·1000/fps⌋ ms,
    * last frame index ⌊durationMs·fps/1000⌋ — so non-divisor rates do not
    * drift (fps=3 ticks 0,333,666,1000,…, not 0,333,666,999,…) and
    * fps>1000 is well-defined (an integer per-frame millisecond step
    * floors to 0 there and divides by zero). All intermediates stay below
    * 2^53, so the double division is exact. */
  def sampleFrames(media: DataFrame, fps: Int): DataFrame = {
    require(fps > 0, "fps must be positive")
    media
      .where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          floor(col("meta.durationMs") * fps / 1000).cast("long"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        floor(col("frame_idx") * 1000 / fps).cast("long").as("ts_ms"))
  }

  /** The number of fake feature dimensions produced by the stub decoder. */
  val FakeDim = 4

  /** Deterministic fake "decoded features" as a pure Column expression:
    * dim j = hash60(md5-hex of payload ++ ":j") scaled to [0,1).
    * This is the STUB for codec-based feature extraction. */
  /** 2^60 — the exclusive upper bound of hash60, exact as a double. */
  private val Pow60 = 1152921504606846976L.toDouble

  def fakeFeatureExpr(data: Column): Column =
    transform(sequence(lit(0), lit(FakeDim - 1)), j =>
      hash60(concat(md5(data), lit(":"), j.cast("string"))).cast("double") / Pow60)

  /** STUB decoder (JVM side) — byte-identical to `fakeFeatureExpr`, used
    * by the mapPartitions path. A real implementation would decode
    * `row.data` with a codec and run a feature extractor. */
  def stubDecoder(row: MediaRow): MediaFeatures = {
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(row.data)
    val fs = Array.tabulate(FakeDim) { j =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$hex:$j").take(15), 16)
        .toDouble / Pow60
    }
    MediaFeatures(row.mediaId, row.kind, row.data.length.toLong, fs)
  }

  /** Feature width of [[imageDecoder]]: width, height, n_channels,
    * mean R, mean G, mean B (means in [0,1]). */
  val ImageDim = 6

  /** REAL image decoder — pure JVM, zero external deps: `javax.imageio`
    * ships PNG/JPEG/BMP/GIF codecs in every JDK, so one modality's
    * decode path is genuinely real in this container. Features: decoded
    * dimensions, channel count, and per-channel means — the cheap
    * statistics a curation pipeline filters on (all-black frames,
    * extreme aspect ratios) before anything model-based runs.
    * Undecodable payloads (dirty crawl data is the norm) return an EMPTY
    * feature vector instead of failing the partition — visible
    * downstream as `features = []`, never fatal. Used through the same
    * `decodeFeatures` mapPartitions shape as the stub; the stub remains
    * the ORACLE face (q29) because DuckDB has no codec to replay this. */
  def imageDecoder(row: MediaRow): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.data))
      catch { case _: Exception => null }
    val fs =
      if (img == null) Array.empty[Double]
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h * 255
        Array(w.toDouble, h.toDouble,
          img.getColorModel.getNumComponents.toDouble,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    MediaFeatures(row.mediaId, row.kind, row.data.length.toLong, fs)
  }

  /** Feature width of [[audioDecoder]]: sample rate, channels, frame
    * count, RMS amplitude in [0,1]. */
  val AudioDim = 4

  /** REAL audio decoder — pure JVM (`javax.sound.sampled` ships a WAV/
    * AIFF/AU reader in every JDK): decodes PCM payloads and emits the
    * curation statistics (rate, channels, length, RMS energy — the
    * silence/clipping filter inputs). 16-bit little-endian signed PCM is
    * the WAV norm and what the RMS loop reads; other widths fall back to
    * format metadata with RMS = -1 (visible, not wrong). Undecodable
    * payloads return empty features, like [[imageDecoder]]. */
  def audioDecoder(row: MediaRow): MediaFeatures = {
    val fs =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.data))
        try {
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          val frames = bytes.length.toLong /
            math.max(fmt.getFrameSize, 1)
          val rms =
            if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
                fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
              var sum = 0.0; var i = 0
              while (i + 1 < bytes.length) {
                val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                sum += (s / 32768.0) * (s / 32768.0); i += 2
              }
              math.sqrt(sum / math.max(bytes.length / 2, 1))
            } else -1.0
          Array(fmt.getSampleRate.toDouble, fmt.getChannels.toDouble,
            frames.toDouble, rms)
        } finally in.close()
      } catch { case _: Exception => Array.empty[Double] }
    MediaFeatures(row.mediaId, row.kind, row.data.length.toLong, fs)
  }

  /**
   * Decode + feature-extract over partition-sized batches: the typed
   * `mapPartitions` shape a real decoder needs (amortize codec init per
   * partition, stream rows, never hold a partition's payloads in memory
   * at once). Payloads stay on their input partitions — map-only.
   */
  def decodeFeatures(media: DataFrame,
                     decoder: MediaRow => MediaFeatures = stubDecoder): Dataset[MediaFeatures] = {
    val ds = media.select(
      col("media_id").as("mediaId"), col("kind"), col("data"),
      struct(col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.durationMs").as("durationMs")).as("meta"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      // per-partition init hook for a real codec would go here
      rows.map(decoder)
    }(Encoders.product[MediaFeatures])
  }

  // --- perceptual near-dup (dHash) tier --------------------------------

  /** dHash grid: DHashRows rows × (DHashCols + 1) sampled luma columns →
    * DHashRows·DHashCols adjacent-pixel comparisons = 60 bits — sized to
    * `Dedup.simHashPairs`' 5×12-bit banding, whose pigeonhole guarantee
    * (sound for maxDist ≤ 4 at 5 bands) this tier reuses unchanged. */
  val DHashRows = 6
  val DHashCols = 10

  /** 60-bit STUB dHash as a pure Column expression (the oracle face —
    * no codec in DuckDB): grid luma (r, c) = first md5 byte of
    * "payload-digest:r:c". Identical payloads collide exactly (dist 0);
    * the PERCEPTUAL property lives in [[imageDHash]], the real-codec
    * face this stub stands in for (same grid, same bit layout). */
  def dHashStub(data: Column): Column = {
    val d = md5(data)
    def g(r: Int, c: Int) =
      conv(substring(md5(concat_ws(":", d, lit(r.toString), lit(c.toString))),
        1, 2), 16, 10).cast("long")
    (for (r <- 0 until DHashRows; c <- 0 until DHashCols) yield
      when(g(r, c + 1) > g(r, c), lit(1L << (r * DHashCols + c)))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  /** REAL image dHash — pure JVM via `javax.imageio` (the q29
    * imageDecoder stance): decode, nearest-neighbor sample the
    * DHashRows × (DHashCols+1) luma grid (integer BT.601 luma), compare
    * horizontal neighbors. Returns None on undecodable payloads (dirty
    * crawl data is the norm — never fatal). A brightness shift, mild
    * noise, or re-encode moves few adjacent-pixel ORDERINGS, so true
    * near-dups land within small Hamming distance — spec-gated
    * (`MultimodalSpec`) since no oracle can replay a codec. */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val w = DHashCols + 1
      def luma(x: Int, y: Int): Int = {
        val px = img.getRGB(
          math.min((x.toLong * img.getWidth / w).toInt, img.getWidth - 1),
          math.min((y.toLong * img.getHeight / DHashRows).toInt, img.getHeight - 1))
        (((px >> 16) & 255) * 299 + ((px >> 8) & 255) * 587 + (px & 255) * 114) / 1000
      }
      var acc = 0L
      for (r <- 0 until DHashRows; c <- 0 until DHashCols)
        if (luma(c + 1, r) > luma(c, r)) acc |= 1L << (r * DHashCols + c)
      Some(acc)
    }
  }

  /** Perceptual near-dup pairs over one modality's payloads: stub
    * dHashes (map-only, payload never shuffles — only the 8-byte hash)
    * into the banded Hamming tier shared with the SimHash dedup.
    * Output: (doc_a, doc_b, dist), a < b, dist ≤ maxDist. */
  def dHashPairs(media: DataFrame, maxDist: Int): DataFrame =
    Dedup.simHashPairs(
      media.select(col("media_id").as("id"), dHashStub(col("data")).as("sh")),
      maxDist)

  // --- perceptual near-dup (audio energy envelope) tier -----------------

  /** Envelope windows for the audio perceptual hash: EnvWindows equal
    * time slices → EnvWindows−1 = 60 adjacent-window RMS-energy
    * comparisons = 60 bits — the dHash bit budget, so the tier reuses
    * `Dedup.simHashPairs`' 5×12-bit banding (pigeonhole-sound for
    * maxDist ≤ 4) unchanged. */
  val EnvWindows = 61

  /** 60-bit STUB envelope hash as a pure Column expression (the oracle
    * face — no audio codec in DuckDB): window energy e(j) = first md5
    * byte of "payload-digest:env:j". Identical payloads collide exactly
    * (dist 0); the PERCEPTUAL property lives in [[audioEnvHash]], the
    * real-codec face this stub stands in for (same window count, same
    * bit layout). */
  def envHashStub(data: Column): Column = {
    val d = md5(data)
    def e(j: Int) =
      conv(substring(md5(concat_ws(":", d, lit("env"), lit(j.toString))),
        1, 2), 16, 10).cast("long")
    (for (j <- 0 until EnvWindows - 1) yield
      when(e(j + 1) > e(j), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
  }

  /** REAL audio envelope hash — pure JVM via `javax.sound.sampled` (the
    * audioDecoder stance: a WAV/AIFF/AU PCM reader ships in every JDK):
    * decode, slice the sample stream into EnvWindows equal windows,
    * compare adjacent windows' RMS energy. A re-encode, resample, or
    * constant gain change preserves the energy ENVELOPE — few adjacent
    * orderings flip — so true near-dups land within small Hamming
    * distance, while a reversed or different signal scatters; spec-gated
    * (`MultimodalSpec`) since no oracle can replay a codec. Multi-channel
    * payloads are downmixed to mono (per-frame channel average) before
    * windowing, so a stereo re-encode of a mono signal hashes the same.
    * Returns None on undecodable/non-PCM16LE payloads or signals shorter
    * than one frame per window (dirty crawl data is the norm — never
    * fatal). */
  def audioEnvHash(bytes: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val b = in.readAllBytes()
          // Downmix interleaved channels to mono per FRAME (average of the
          // channel samples) before windowing, so the envelope — and the
          // near-dup property it carries — is invariant across stereo/mono
          // re-encodes of the same signal.
          val ch = math.max(fmt.getChannels, 1)
          val n = b.length / 2 / ch
          if (n < EnvWindows) None
          else {
            val rms = new Array[Double](EnvWindows)
            var w = 0
            while (w < EnvWindows) {
              val lo = (w.toLong * n / EnvWindows).toInt
              val hi = ((w + 1).toLong * n / EnvWindows).toInt
              var s = 0.0
              var i = lo
              while (i < hi) {
                var c = 0
                var acc = 0.0
                while (c < ch) {
                  val k = 2 * (i * ch + c)
                  acc += ((b(k + 1) << 8) | (b(k) & 0xff)).toShort / 32768.0
                  c += 1
                }
                val v = acc / ch
                s += v * v
                i += 1
              }
              rms(w) = math.sqrt(s / math.max(hi - lo, 1))
              w += 1
            }
            var acc = 0L
            var j = 0
            while (j < EnvWindows - 1) {
              if (rms(j + 1) > rms(j)) acc |= 1L << j
              j += 1
            }
            Some(acc)
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Perceptual near-dup pairs over audio payloads: stub envelope hashes
    * (map-only — payload bytes never shuffle, only the 8-byte hash) into
    * the banded Hamming tier shared with the SimHash dedup and the image
    * dHash tier. Output: (doc_a, doc_b, dist), a < b, dist ≤ maxDist. */
  def envHashPairs(media: DataFrame, maxDist: Int): DataFrame =
    Dedup.simHashPairs(
      media.select(col("media_id").as("id"), envHashStub(col("data")).as("sh")),
      maxDist)

  // --- perceptual near-dup (video temporal-pooled dHash) tier -----------

  /** Frames the video hash samples: the q28 2-fps grid (one frame per
    * 500 ms, ⌊durationMs/500⌋+1 frames) — bounded by the DURATION
    * metadata, never by payload size. */
  def videoFrameCount(durationMs: Column): Column =
    floor(durationMs.cast("long") / 500).cast("long") + 1

  /** 60-bit STUB frame hash for one (payload, frame) as a pure Column
    * expression (the oracle face — no video codec exists in any JVM or
    * in DuckDB): the q221 md5 luma grid salted with the frame index. */
  private def frameHashStub(data: Column, f: Column): Column = {
    val d = md5(data)
    def g(r: Int, c: Int) =
      conv(substring(md5(concat_ws(":", d, f.cast("string"),
        lit(r.toString), lit(c.toString))), 1, 2), 16, 10).cast("long")
    (for (r <- 0 until DHashRows; c <- 0 until DHashCols) yield
      when(g(r, c + 1) > g(r, c), lit(1L << (r * DHashCols + c)))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  /** STUB video hash table (id, sh): per sampled frame the stub frame
    * hash, then per-bit STRICT-MAJORITY pooling across frames (ties →
    * 0). Majority pooling is what makes this a VIDEO hash rather than a
    * frame hash: a few re-encoded/edited/inserted frames flip a minority
    * of votes and the pooled bits stand — the PERCEPTUAL property lives
    * in [[videoHashFromFrames]], the real face this stub stands in for
    * (same grid, same bit layout, same pooling rule).
    *
    * Built RELATIONALLY (explode the frame index, one codegen'd
    * 120-md5 frame-hash projection, 60 ±1 bit-sum aggregates, one
    * assembly expression) for the same reason as `Dedup.simHashes`: the
    * nested-HOF formulation (transform over frames + 60 aggregate()
    * folds) re-evaluates interpreted lambda trees per bit and measured
    * ~20× slower. The explode is bounded by the DURATION metadata
    * (≈ duration/500 rows per video), and only (id, 8-byte hash) rows
    * reach the aggregate — payloads stay in the scan stage. */
  def videoHashes(media: DataFrame): DataFrame = {
    val frames = media.select(col("media_id").as("id"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1)).as("f"),
        col("data"))
      .select(col("id"), frameHashStub(col("data"), col("f")).as("fh"))
    val bitCols = (0 until DHashRows * DHashCols).map(j =>
      sum(shiftright(col("fh"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"b$j"))
    frames.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("id"),
        (0 until DHashRows * DHashCols).map(j =>
          when(col(s"b$j") > 0L, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("sh"))
  }

  /** REAL video hash over PRE-DECODED frame images (a video codec ships
    * in no JVM — a real pipeline decodes frames upstream, e.g. an
    * ffmpeg-extracted keyframe directory, and THIS is the hash over
    * them): dHash each frame via [[imageDHash]], strict-majority pool
    * per bit. Undecodable frames are skipped; None when nothing decodes.
    * Spec-gated (`MultimodalSpec`): re-encoded frames dist 0, a minority
    * of replaced frames outvoted to dist 0, reversed frames far. */
  def videoHashFromFrames(frames: Seq[Array[Byte]]): Option[Long] = {
    val hs = frames.flatMap(imageDHash)
    if (hs.isEmpty) None
    else {
      var acc = 0L
      var j = 0
      while (j < DHashRows * DHashCols) {
        val c = hs.count(h => ((h >> j) & 1L) == 1L)
        if (2 * c > hs.size) acc |= 1L << j
        j += 1
      }
      Some(acc)
    }
  }

  /** Perceptual near-dup pairs over video payloads: stub temporal-pooled
    * hashes (map-only — only the 8-byte hash ever shuffles) into the
    * shared banded Hamming tier. `media` carries (media_id, data,
    * n_frames); compute n_frames from duration metadata via
    * [[videoFrameCount]]. Output: (doc_a, doc_b, dist), a < b. */
  def videoHashPairs(media: DataFrame, maxDist: Int): DataFrame =
    Dedup.simHashPairs(videoHashes(media), maxDist)
}
