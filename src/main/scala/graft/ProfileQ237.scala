package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q237 (not part of the driver contract):
  * where do the 10 s go — edge build, dv distinct, or the chi-square?
  * Also times an array-fan-out edge build against the self-join form.
  */
object ProfileQ237 {
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
    time("edges (self-join build)")(
      edges.write.format("noop").mode("overwrite").save())
    val dv = edges.select(col("u").as("v"), col("du").as("dv")).distinct()
    time("dv distinct")(dv.write.format("noop").mode("overwrite").save())
    val joined = edges.join(dv, "v")
    time("edges join dv")(joined.write.format("noop").mode("overwrite").save())
    val chi = graft.operators.Stats.chiSquareBp(
      joined, length(bin(col("du"))), length(bin(col("dv"))))
    time("chi-square end")(chi.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val full = SparkEntry.queries("q237_degree_mixing_chi2")
    time("q237 full")(full(spark, sfDir).write.format("noop").mode("overwrite").save())
    time("q237 full again")(full(spark, sfDir).write.format("noop").mode("overwrite").save())

    // candidate: array fan-out pair enumeration instead of the self-join
    val g = li.select(col("l_orderkey").as("gk"), col("l_partkey").as("it"))
      .distinct()
    val arr = g.groupBy("gk").agg(sort_array(collect_set(col("it"))).as("a"))
      .filter(size(col("a")) >= 2)
    val fan = arr.select(explode(flatten(transform(
        sequence(lit(0), size(col("a")) - 2),
        i => transform(sequence(i + 1, size(col("a")) - 1),
          j => struct(element_at(col("a"), i + 1).as("u"),
            element_at(col("a"), j + 1).as("v")))))).as("p"))
      .select(col("p.u"), col("p.v")).distinct()
    val sym = fan.unionAll(fan.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("du"))
    val e2 = sym.join(deg, "u")
    time("edges (array fan-out)")(
      e2.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
