package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BoundedLongListSpec extends SparkSpec {

  test("collects full groups at or under the cap, NULLs groups over it") {
    import spark.implicits._
    // group a: 3 values (== cap), group b: 4 values (> cap), group c: 1
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
        ("b", 10L), ("b", 11L), ("b", 12L), ("b", 13L),
        ("c", 7L))
      .toDF("k", "v")
      .repartition(8) // force partial buffers + merge paths
    val out = df.groupBy("k")
      .agg(sort_array(BoundedLongList(col("v"), 3)).as("vs"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Long](1)).map(_.toList))
      .toMap
    assert(out("a") === Some(List(1L, 2L, 3L)))
    assert(out("b") === None)
    assert(out("c") === Some(List(7L)))
  }

  test("NULL inputs are skipped, not collected") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(sort_array(BoundedLongList(col("v"), 2)).as("vs"))
      .collect()
    assert(out.head.getSeq[Long](1).toList === List(1L, 2L))
  }

  test("overflowed buffers stop absorbing input (cap is a hard bound)") {
    // 10k values into cap 5: must come back NULL without OOM-sized state
    val df = spark.range(10000).select(lit("k").as("k"), col("id").as("v"))
      .repartition(16)
    val out = df.groupBy("k").agg(BoundedLongList(col("v"), 5).as("vs"))
      .collect()
    assert(out.head.isNullAt(1))
  }
}
