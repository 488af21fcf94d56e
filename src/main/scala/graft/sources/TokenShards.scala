package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Packed token-id shards — the binary layout training loaders mmap
 * (the Megatron-LM `.bin` convention): each shard file is nothing but
 * little-endian int32 token ids, sequence after sequence, so a data
 * loader reads a training example with one seek + one contiguous read
 * and ZERO decode work. The engine side of the contract:
 *
 *  - `write` streams each partition's sequences into its own
 *    `shard-NNNNN.bin` through the Hadoop filesystem (no driver
 *    collection, any scheme) and lands a PARQUET index
 *    (`seq_key, shard_file, offset, n_tokens`) beside the payload —
 *    the index stays queryable/joinable by the engine while the
 *    payload stays opaque bytes for the loader;
 *  - `read` re-partitions the index by shard file, opens each file
 *    once per task, and seek-reads every sequence back — the
 *    round-trip is row-exact (q187's gate: the read-back replays the
 *    packing oracle).
 *
 * Offsets are BYTE offsets; `n_tokens` counts int32 slots. Sequences
 * keep their caller-assigned string key (a composite like
 * "lang:shard:pack" survives the trip and splits back into columns).
 * Like `Npy`/`Warc`, the per-partition imperative IO is exactly the
 * `mapPartitions` escape hatch the scale rules reserve for real codecs.
 */
object TokenShards {

  val IndexDir = "index"

  /** Write `packed` (keyCol string, idsCol array<int>) as binary shards +
    * parquet index under `dir`. One shard per input partition. */
  def write(packed: DataFrame, dir: String,
            keyCol: String = "seq_key", idsCol: String = "ids"): Unit = {
    val spark = packed.sparkSession
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = packed.select(col(keyCol).cast("string"), col(idsCol))
    new Path(dir) // eager path validation
    val index = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      val file = f"shard-$pid%05d.bin"
      val target = new Path(dir, file)
      val fs = target.getFileSystem(hadoopConf.value)
      val out = fs.create(target, true)
      var offset = 0L
      val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Int)]
      try {
        it.foreach { r =>
          val ids = r.getSeq[Int](1)
          val buf = ByteBuffer.allocate(4 * ids.length).order(ByteOrder.LITTLE_ENDIAN)
          ids.foreach(buf.putInt)
          out.write(buf.array())
          entries += ((r.getString(0), file, offset, ids.length))
          offset += 4L * ids.length
        }
      } finally out.close()
      // empty partitions leave a zero-byte shard and no index rows — harmless
      entries.iterator
    }
    spark.createDataFrame(index)
      .toDF("seq_key", "shard_file", "offset", "n_tokens")
      .write.mode("overwrite").parquet(s"$dir/$IndexDir")
  }

  /** Read the shards back: (seq_key, ids array<int>). Each task opens its
    * shard files once and seek-reads its sequences in offset order. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val index = spark.read.parquet(s"$dir/$IndexDir")
      .repartition(col("shard_file"))
      .sortWithinPartitions(col("shard_file"), col("offset"))
    val rdd = index.select(col("seq_key"), col("shard_file"),
        col("offset"), col("n_tokens")).rdd
      .mapPartitions { it =>
        var openFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def ensure(file: String): Unit =
          if (openFile != file) {
            if (in != null) in.close()
            val p = new Path(dir, file)
            in = p.getFileSystem(hadoopConf.value).open(p)
            openFile = file
          }
        it.map { r =>
          ensure(r.getString(1))
          val n = r.getInt(3)
          val bytes = new Array[Byte](4 * n)
          in.readFully(r.getLong(2), bytes)
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          (r.getString(0), Array.fill(n)(buf.getInt()))
        } // stream-closing rides on task completion for the final file:
          // FSDataInputStream over the local/dfs schemes is GC-safe, and
          // each task touches a bounded handful of shard files
      }
    spark.createDataFrame(rdd).toDF("seq_key", "ids")
  }
}
