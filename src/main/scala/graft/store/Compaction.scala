package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

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
 * still a writer-exclusive operation — the rewrite is a point-in-time
 * copy, so an append racing it would land in the superseded version and
 * silently vanish. Writer exclusion is ENFORCED, not convention: every
 * store write face runs under the store-level lease (`withLease`), and a
 * second writer fails loudly naming the holder. Serving never stops.
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

  /** Remove a table root entirely — the INIT faces call this before
    * writing v0 so a re-initialization over an old store cannot leave
    * stale committed batches (or a stale higher-version marker) visible
    * next to the fresh base batch. Init is a provisioning operation:
    * readers open during a re-init are not protected (same as the
    * previous whole-directory overwrite). */
  def clearRoot(spark: SparkSession, root: String): Unit = {
    fs(spark, root).delete(new Path(root), true); ()
  }

  private def leasePath(storePath: String) = new Path(s"$storePath/_writer_lease")

  /** Acquire the store-level WRITER lease, or fail loudly naming the
    * holder. Writers (appends, deltas, retractions, compactions) are
    * mutually exclusive per store — the versioned swap protects READERS
    * only, and an append racing a compaction would land in a superseded
    * version and silently vanish from the served view. `create(path,
    * overwrite=false)` is the atomicity primitive (atomic on HDFS;
    * check-then-create on the local FS, which only hosts tests). A holder
    * that CRASHED leaves the lease file behind by design: the next writer
    * fails loudly instead of assuming the store is quiescent, and the
    * operator (or supervising orchestrator) calls `breakLease` once the
    * dead writer is confirmed gone, then retries — every store write face
    * is retry-idempotent precisely so this recovery is safe. */
  def acquireLease(spark: SparkSession, storePath: String, owner: String): Unit = {
    val f = fs(spark, storePath)
    f.mkdirs(new Path(storePath))
    val out =
      try f.create(leasePath(storePath), false)
      catch { case _: java.io.IOException =>
        throw new IllegalStateException(
          s"writer lease at ${leasePath(storePath)} is held by " +
            s"'${leaseHolder(spark, storePath).getOrElse("<unknown>")}' — " +
            "one writer per store; if the holder crashed, call " +
            "Compaction.breakLease and retry")
      }
    try out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The current lease holder, if a lease file exists. */
  def leaseHolder(spark: SparkSession, storePath: String): Option[String] = {
    val f = fs(spark, storePath)
    val p = leasePath(storePath)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  def releaseLease(spark: SparkSession, storePath: String): Unit = {
    fs(spark, storePath).delete(leasePath(storePath), false); ()
  }

  /** Operator override after a writer CRASH: removes a stale lease so the
    * retry can acquire. Never call while the holder may still be alive. */
  def breakLease(spark: SparkSession, storePath: String): Unit =
    releaseLease(spark, storePath)

  /** Run `body` holding the store's writer lease; released on all exits
    * short of a process crash (where the stale file failing the NEXT
    * writer loudly is the point). */
  def withLease[T](spark: SparkSession, storePath: String, owner: String)(body: => T): T = {
    acquireLease(spark, storePath, owner)
    try body finally releaseLease(spark, storePath)
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
