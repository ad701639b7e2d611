package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-attribution for q03 (not part of the driver contract). */
object ProfileQ03 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val o = graft.util.Tables(spark, sfDir, "orders")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warm scan")(noop(o))
    time("scan only")(noop(o))
    time("casts no sort")(noop(o.select(
      col("o_orderkey"),
      col("o_orderkey").cast("string").as("key_str"),
      col("o_orderkey").cast("string").cast("long").as("key_roundtrip"),
      expr("try_cast(o_orderstatus as int)").as("status_as_int"),
      col("o_custkey").cast("int").as("cust_int"),
      (col("o_totalprice") > 1000).cast("int").as("big_flag"),
      col("o_orderdate").cast("string").as("date_str"))))
    time("date cast only")(noop(o.select(col("o_orderdate").cast("string"))))
    time("key casts only")(noop(o.select(col("o_orderkey").cast("string"))))
    time("try_cast only")(noop(o.select(
      expr("try_cast(o_orderstatus as int)").as("status_as_int"))))
    time("guarded cast only")(noop(o.select(
      when(col("o_orderstatus").rlike("^[+-]?[0-9]+$"),
        col("o_orderstatus").cast("int")).as("status_as_int"))))
    time("sort only")(noop(o.orderBy("o_orderkey")))
    time("q03 full")(noop(SparkEntry.queries("q03_cast_matrix")(spark, sfDir)))
    spark.stop()
  }
}
