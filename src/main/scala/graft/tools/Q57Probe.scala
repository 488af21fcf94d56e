package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the q57 cost decomposition (not part of the engine). */
object Q57Probe {
  def main(args: Array[String]): Unit = {
    graft.core.Scratch.pinTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir", graft.core.Scratch.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageStats = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageStats.add((si.name.takeWhile(_ != '\n').take(60),
          si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    def timeIt[T](name: String)(body: => T): T = {
      stageStats.clear()
      val t0 = System.nanoTime(); val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-40s $wall%.2f s")
      if (sys.env.contains("Q57_STAGES")) {
        import scala.jdk.CollectionConverters._
        val st = stageStats.asScala.toSeq
        println(f"[stages] n=${st.size} totalTaskMs=${st.map(_._2).sum}")
        st.sortBy(-_._2).take(8).foreach { case (n, ms, t) =>
          println(f"[stage] $ms%6d ms tasks=$t%3d  $n") }
      }
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def occ(p: org.apache.spark.sql.Column) = li.where(p)
      .select(col("l_partkey").as("item_id"), col("l_orderkey").as("reference_id"))

    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val base = graft.core.Incremental.fromOccurrences(occ(col("l_linenumber") <= 3))
      val updated = timeIt("update fold (plan only)") {
        graft.core.Incremental.update(base, occ(col("l_linenumber") > 3))
      }
      timeIt("materialize updated.items")(noop(updated.items))
      timeIt("materialize updated.co")(noop(updated.co))
      timeIt("materialize updated.n")(noop(updated.n))
      timeIt("build from in-session stats") {
        noop(graft.core.StoreBuild.scaledNeighborsFromStats(updated, 2.0))
      }
      // the same snapshot through a persisted round trip: tiny logical plans
      val snap = graft.core.Scratch.dir("q57probe_snap")
      timeIt("save snapshot")(graft.core.Incremental.save(updated, snap))
      val loaded = graft.core.Incremental.load(spark, snap)
      timeIt("build from loaded stats") {
        noop(graft.core.StoreBuild.scaledNeighborsFromStats(loaded, 2.0))
      }
      // reference point: the full-rebuild build (q38's path)
      val ct = graft.core.Crosstab.build(occ(lit(true)))
      timeIt("build from crosstab (q38 path)") {
        noop(graft.core.StoreBuild.scaledNeighbors(ct, 2.0))
      }
      if (rep == 2) {
        def shape(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val p = df.queryExecution.executedPlan.toString
          def c(pat: String) = pat.r.findAllIn(p).length
          println(s"[plan] $name: exch=${c("Exchange")} bhj=${c("BroadcastHashJoin")} " +
            s"smj=${c("SortMergeJoin")} shj=${c("ShuffledHashJoin")} " +
            s"window=${c("Window")} agg=${c("HashAggregate")} len=${p.length}")
        }
        shape("fromStats", graft.core.StoreBuild.scaledNeighborsFromStats(updated, 2.0))
        shape("fromCrosstab", graft.core.StoreBuild.scaledNeighbors(ct, 2.0))
        shape("fromLoaded", graft.core.StoreBuild.scaledNeighborsFromStats(loaded, 2.0))
        java.nio.file.Files.writeString(graft.core.Scratch.root.resolve("plan_loaded.txt"),
          graft.core.StoreBuild.scaledNeighborsFromStats(loaded, 2.0)
            .queryExecution.executedPlan.toString)
        java.nio.file.Files.writeString(graft.core.Scratch.root.resolve("plan_ct.txt"),
          graft.core.StoreBuild.scaledNeighbors(ct, 2.0)
            .queryExecution.executedPlan.toString)
      }
    }
    graft.core.Caches.clearAll(spark)
    spark.stop()
  }
}
