package graft.warehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing: the co-located-join layout (SURVEY §2's "repartition/
  * bucketing for co-located joins"). Writing both fact tables bucketed
  * by the join key lets the sort-merge join run WITHOUT any Exchange —
  * at 100 TB this is the difference between an hourly pipeline
  * re-shuffling the fact table on every run and reading pre-placed
  * buckets.
  */
class BucketingSpec extends SparkSpec {

  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
  }

  test("bucketed fact tables sort-merge join with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.util.Tables(spark, sf, "orders")
    val lineitem = graft.util.Tables(spark, sf, "lineitem")
    resetTable("b_orders"); resetTable("b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      assert(n === lineitem.count()) // every lineitem has its order
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle")

      // the same join over unbucketed parquet DOES shuffle — the layout,
      // not the data, is what removed the exchanges
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
