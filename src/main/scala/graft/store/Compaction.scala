package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Shared offline-compaction swap for the persisted stores (`AnnStore`,
 * `DedupStore`): materialize a rewrite of a parquet tree NEXT TO it,
 * then swap directories. Run OFFLINE — the swap is not atomic for
 * concurrent readers (a query between the two renames fails and is
 * retried); a real deployment swaps a metastore / table-format pointer
 * instead. Crash between the renames leaves the original intact at
 * `<path>__old` (restored automatically when the promote rename fails).
 */
private[store] object Compaction {

  /** Rewrite `path` with the frame `build` produces from the CURRENT
    * tree; `build` must read from `path` (the write materializes fully
    * before anything moves). */
  def rewriteInPlace(path: String)(build: => DataFrame): Unit = {
    val df = build
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__compact")
    val old = new Path(path + "__old")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"compact: cannot move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore the original tree before failing
      throw new java.io.IOException(s"compact: cannot promote $tmp")
    }
    fs.delete(old, true)
  }
}
