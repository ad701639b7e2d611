package graft.warehouse

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The co-located join property: two tables bucketed on the same key
  * with the same bucket count must join and aggregate WITHOUT a shuffle
  * exchange — the write-time shuffle is the only one ever paid.
  */
class BucketJoinSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed equi-join plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.util.Tables(spark, sf, "orders")
    val lineitem = graft.util.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    Warehouse.loadBucketed(orders, "b_orders", "o_orderkey", 8)
    Warehouse.loadBucketed(lineitem, "b_lineitem", "l_orderkey", 8)

    withNoBroadcast {
      val j = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: same count as the plain (shuffled) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(j.count() === plain.count())
    }
  }

  test("aggregation on the bucket key plans with zero shuffle exchanges") {
    val agg = spark.table("b_lineitem").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$plan")
    assert(agg.count() ===
      graft.util.Tables(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey").distinct().count())
  }
}
