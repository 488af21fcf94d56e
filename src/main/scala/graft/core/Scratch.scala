package graft.core

import java.nio.file.{Files, Path, Paths}

/** Repo-local scratch root for every transient directory the engine (and
  * its query harness) creates.
  *
  * Why this exists: the default JVM temp root (`/tmp`) is reaped by the
  * host mid-run in this environment, which destroys both Spark's
  * `spark.local.dir` shuffle/block-manager files and any store path a
  * query created with `Files.createTempDirectory` — round 8's entire
  * driver bench died on `FileNotFoundException: /tmp`. All scratch now
  * lives under a root WE own (default `target/scratch` relative to the
  * process working directory, i.e. inside the repo for every sbt-forked
  * run), overridable with `SPARK_GRAFT_SCRATCH` / `-Dspark.graft.scratch`.
  *
  * Three consumers, one root:
  *  - [[dir]] — per-call unique subdirectory (replaces the raw
  *    `Files.createTempDirectory` sites in `graft.queries.*`);
  *  - [[localDir]] — value for `spark.local.dir` (shuffle, block manager);
  *  - [[pinTmpdir]] — repoints `java.io.tmpdir` for everything else Spark
  *    or Hadoop lazily derives from the JVM temp root. Called first thing
  *    in every `main` before any Spark class initializes.
  */
object Scratch {

  lazy val root: Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse(sys.props.get("spark.graft.scratch"))
      .getOrElse(new java.io.File("target/scratch").getAbsolutePath)
    val p = Paths.get(base).toAbsolutePath
    Files.createDirectories(p)
    p
  }

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  /** Unique fresh subdirectory under the scratch root. */
  def dir(prefix: String): String = {
    Files.createDirectories(root) // recreate if an external clean removed it
    val p = Files.createTempDirectory(root, prefix)
    created.add(p)
    p.toString
  }

  /** Delete every directory handed out by [[dir]] in this JVM. Bench/Verify
    * call this at shutdown — a 3-rep bench over the store-roundtrip family
    * otherwise leaves one store copy per (query, rep) behind, which at sf10
    * is gigabytes. Never touches [[localDir]] while a session is live. */
  def cleanup(): Unit = {
    var p = created.poll()
    while (p != null) {
      try deleteRecursively(p.toFile) catch { case _: Throwable => () }
      p = created.poll()
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Directory for `spark.local.dir` (created eagerly — Spark requires it
    * to exist at SparkContext start). */
  def localDir: String = {
    val p = root.resolve("spark-local")
    Files.createDirectories(p)
    p.toString
  }

  /** Directory for `spark.sql.warehouse.dir` — Spark otherwise creates
    * `./spark-warehouse` in the process working directory, i.e. the repo
    * root for every sbt-forked run. */
  def warehouseDir: String = {
    val p = root.resolve("spark-warehouse")
    Files.createDirectories(p)
    p.toString
  }

  /** Point `java.io.tmpdir` at the scratch root unless the caller already
    * pinned it somewhere safe (anything outside /tmp counts). Must run
    * before the first use of the JVM temp machinery, so call it at the
    * top of `main`. Also pins Derby's home (the JDBC spec's embedded
    * metastore writes `derby.log` into the working directory otherwise —
    * repo-root noise and a reaper hazard). */
  def pinTmpdir(): Unit = {
    val cur = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    if (cur == "/tmp" || cur.startsWith("/tmp/")) {
      val p = root.resolve("tmp")
      Files.createDirectories(p)
      System.setProperty("java.io.tmpdir", p.toString)
    }
    if (!sys.props.contains("derby.system.home")) {
      val d = root.resolve("derby")
      Files.createDirectories(d)
      System.setProperty("derby.system.home", d.toString)
      System.setProperty("derby.stream.error.file",
        d.resolve("derby.log").toString)
    }
  }
}
