package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q239 cost decomposition (not part of the engine). */
object Q239Probe {
  def main(args: Array[String]): Unit = {
    graft.core.Scratch.pinTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.local.dir", graft.core.Scratch.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    def edges = graft.core.Caches.cacheOnce(
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .distinct()
        .where(col("ck") % 4 === col("pk") % 4 ||
          pmod(graft.functions.TextFunctions.hash60(
            concat_ws(":", col("ck"), col("pk"))), lit(20L)) === 0)
        .select((col("ck") * 2L).as("src"), (col("pk") * 2L + 1L).as("dst")))

    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val cp = edges
      timeIt("edges noop")(noop(cp))
      val labels = timeIt("communities construct")(
        graft.operators.Graph.communities(cp, 4, 2))
      timeIt("communities noop")(noop(labels))
      timeIt("modularity noop")(
        noop(graft.operators.Graph.modularity(cp, labels)))
      val sealedLabels = timeIt("seal labels")(labels.localCheckpoint(eager = true))
      val sealedCp = timeIt("seal edges")(cp.localCheckpoint(eager = true))
      timeIt("modularity sealed noop")(
        noop(graft.operators.Graph.modularity(sealedCp, sealedLabels)))
    }
    graft.core.Caches.clearAll(spark)
    spark.stop()
    graft.core.Scratch.cleanup()
  }
}
