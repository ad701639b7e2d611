package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q221 k-core peel (not part of the driver
  * contract): times the edge build, degree/threshold derivation, and
  * each peel round separately to localize the bench cost.
  */
object ProfileQ221 {
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
    val e0 = edges.select("u", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edge build + cache")(e0.count())
    val d0 = e0.groupBy("u").agg(count(lit(1)).as("dg")).cache()
    val n = time("degree table")(d0.count())
    val idx = ((n + 9) / 10).toInt
    import spark.implicits._
    val k = time("threshold takeOrdered")(
      d0.orderBy(col("dg"), col("u")).limit(idx).agg(max("dg")).as[Long].head())
    println(s"[prof] n=$n k=$k")
    var e = e0
    for (r <- 1 to 3) {
      val deg = e.groupBy("u").agg(count(lit(1)).as("dg"))
      val keep = deg.filter(col("dg") >= k).select("u").cache()
      time(s"round $r keep")(keep.count())
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"round $r edges")(e.count())
    }
    spark.stop()
  }
}
