package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q180 (not part of the driver contract). */
object ProfileQ180 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = graft.operators.Graph.coOccurrenceEdges(
      li, col("l_orderkey"), col("l_partkey"))
    time("edges materialize")(edges.write.format("noop").mode("overwrite").save())
    time("edges again")(edges.write.format("noop").mode("overwrite").save())
    val pr1 = graft.operators.Graph.pageRankInt(edges, 1)
    time("pagerank 1 iter")(pr1.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val pr3 = graft.operators.Graph.pageRankInt(edges, 3)
    time("pagerank 3 iters")(pr3.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val full = SparkEntry.queries("q180_pagerank_copurchase")
    time("q180 full")(full(spark, sfDir).write.format("noop").mode("overwrite").save())
    time("q180 full again")(full(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
