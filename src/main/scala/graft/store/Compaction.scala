package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned-directory swap for the persisted stores (`AnnStore`,
 * `DedupStore`) — the same marker-last protocol as the incremental
 * snapshot store (`streaming/IncrementalIngest`): a table lives at
 * `<root>/v<k>` with a `LATEST` marker naming the served version, a
 * compaction writes `v<k+1>` COMPLETELY before advancing the marker, and
 * the previous version stays on disk until the one after it lands. So:
 *
 *  - a reader never observes a half-swapped tree — it resolves the marker
 *    once and reads a version directory that is immutable-after-commit;
 *  - a reader that resolved the marker BEFORE a compaction keeps working
 *    after it (the previous version is retained, spec-gated);
 *  - a crash anywhere in the compaction leaves the old version served —
 *    the worst leftover is an unreferenced `v<k+1>` prefix, overwritten
 *    by the next attempt.
 *
 * APPENDS go inside the current version directory; compaction itself is
 * still a writer-exclusive operation (pause appends around it — the
 * rewrite is a point-in-time copy), but serving no longer needs to stop,
 * which was the gap in the previous two-rename swap.
 */
private[graft] object Compaction {

  private def markerPath(root: String) = new Path(s"$root/LATEST")

  private[graft] def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The served version per the marker, if the table exists. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val m = markerPath(root)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Directory of the served version. Fails loudly on an uninitialized
    * table (readers have nothing to fall back to). */
  def currentDir(spark: SparkSession, root: String): String =
    s"$root/v${currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no LATEST marker under $root — initialize the store first"))}"

  /** Directory a NEW table's first version lands in (version 0). Call
    * `commit` after the write completes. */
  def initDir(root: String): String = s"$root/v0"

  /** Advance the marker to `version` — the LAST step of any write
    * protocol (init, compaction). */
  def commit(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val out = f.create(markerPath(root), true)
    try out.write(version.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Compact: materialize `build(currentDir)` as the next version, commit
    * the marker, then prune versions older than the PREVIOUS one (kept
    * for readers that resolved the marker before this compaction). */
  def compact(spark: SparkSession, root: String)(build: String => DataFrame): Unit = {
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no LATEST marker under $root"))
    val next = cur + 1
    build(s"$root/v$cur").write.mode("overwrite").parquet(s"$root/v$next")
    commit(spark, root, next)
    pruneBelow(spark, root, cur)
  }

  /** Delete version directories strictly below `minKeep` — everything
    * older than the immediately-previous version after a compaction. */
  def pruneBelow(spark: SparkSession, root: String, minKeep: Long): Unit = {
    val f = fs(spark, root)
    f.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val nm = p.getName
        nm.startsWith("v") && nm.drop(1).forall(_.isDigit) && nm.drop(1).toLong < minKeep
      }
      .foreach(p => f.delete(p, true))
  }
}
