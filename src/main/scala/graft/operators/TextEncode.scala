package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Input row for the encoder hook: one document's id + text. */
final case class DocText(docId: Long, text: String)

/** Output row: the document's embedding (float32, fixed dim). */
final case class DocVector(doc_id: Long, embedding: Array[Float])

/**
 * Text → embedding inference hook — the missing link between the text
 * tier and the ANN tier: production pipelines run a neural encoder
 * (sentence-transformer class) over every curated document and feed the
 * vectors to the similarity/ANN operators. The model itself is outside
 * this engine (no inference runtime in a SQL engine's dependency set);
 * what the engine owns is the DATAFLOW SHAPE, and that shape is exactly
 * `Multimodal.decodeFeatures`' typed partition hook with one addition:
 * BATCHING. Neural encoders amortize per-call overhead (tokenization
 * setup, device transfer, kernel launch) across a batch of texts, so the
 * hook hands the encoder `batchSize`-sized slices of each partition and
 * zips the returned vectors back in order — the contract a real
 * ONNX/Triton/JNI encoder plugs into without touching the query side.
 *
 * Scale shape: map-only — texts stay on their input partitions, no
 * shuffle, no driver involvement; each partition streams through
 * `grouped(batchSize)` so at most one batch of texts + vectors is
 * resident per task at a time. Encoder init belongs in the partition
 * closure (once per task), not per batch.
 *
 * The deterministic stand-in is [[hashingEncoder]] — the feature-hashing
 * trick (Weinberger et al. 2009): token → 60-bit md5 bucket mod dim,
 * counts L2-normalized, emitted as float32. Unlike a planted fake it is
 * a REAL (if shallow) text representation — near-duplicate documents get
 * near-parallel vectors — and every step is replayable in oracle SQL, so
 * the full text → vectors → top-k chain is hash-gated end-to-end (q178).
 */
object TextEncode {

  /** A batch encoder: N texts in, N vectors out, order-aligned. */
  type Encoder = Seq[String] => Seq[Array[Float]]

  /** Default encoder batch size — the usual neural-encoder sweet spot. */
  val DefaultBatchSize = 64

  /**
   * Run `encoder` over every document, `batchSize` texts per call.
   * Output: (doc_id, embedding). The encoder MUST return exactly one
   * vector per input text (checked per batch, fails the task loudly —
   * a silent zip would misalign every id after a dropped vector).
   */
  def encodeDocuments(docs: DataFrame, encoder: Encoder,
                      batchSize: Int = DefaultBatchSize,
                      idCol: String = "doc_id",
                      textCol: String = "text"): Dataset[DocVector] = {
    require(batchSize >= 1, "encodeDocuments: batchSize must be >= 1")
    docs.select(col(idCol).as("docId"), col(textCol).as("text"))
      .as(Encoders.product[DocText])
      .mapPartitions { rows =>
        // per-partition init hook for a real encoder (load session /
        // tokenizer once per task) would go here
        rows.grouped(batchSize).flatMap { batch =>
          val vecs = encoder(batch.map(_.text))
          require(vecs.length == batch.length,
            s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
          batch.iterator.zip(vecs.iterator)
            .map { case (d, v) => DocVector(d.docId, v) }
        }
      }(Encoders.product[DocVector])
  }

  /** Oracle-face embedding width. */
  val HashDim = 16

  /** 60-bit token hash shared with the DuckDB oracle:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT` — always non-negative. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString // 16 hex chars; we use 15
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic feature-hashing encoder: whitespace tokens (trimmed
    * text, empty/null → zero vector) → md5 bucket mod `dim` → counts →
    * L2-normalize → float32. Pure per-text math (the batch face exists
    * for the real-encoder contract, not because this needs it). */
  def hashingEncoder(dim: Int = HashDim): Encoder = { texts =>
    texts.map { t0 =>
      val t = Option(t0).getOrElse("").trim
      val counts = new Array[Double](dim)
      if (t.nonEmpty)
        t.split("\\s+").foreach { tok =>
          counts((hash60(tok) % dim).toInt) += 1.0
        }
      val l2 = math.sqrt(counts.map(c => c * c).sum)
      if (l2 == 0.0) new Array[Float](dim)
      else counts.map(c => (c / l2).toFloat)
    }
  }
}
