package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits: x even positions, y odd") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (5L, 3L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(x=5=101b, y=3=011b): x bits at 0,4; y bits at 1,3 -> 11011b = 27
    assert(got === Seq(0L, 1L, 2L, 5L, 10L, 27L))
  }

  test("bucketStats: buckets pin the top bits of both dimensions") {
    import spark.implicits._
    val df = (0 until 256).flatMap(x => Seq((x.toLong, (x * 7 % 256).toLong)))
      .toDF("x", "y")
    val rows = ZOrder.bucketStats(df, col("x"), col("y"), bits = 8, shift = 10)
      .collect()
    // shift 10 of a 16-bit z keeps 6 bits -> top 3 bits of each dim fixed
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31, s"x span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"y span too wide: $r")
    }
  }
}
