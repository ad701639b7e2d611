package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPrefilterSpec extends SparkSpec {

  test("bloom-prefiltered anti-join == plain anti-join (fp routed to verify)") {
    import spark.implicits._
    val history = (1L to 500L).map(i => s"key$i").toDF("k")
    val batch = (400L to 700L).map(i => s"key$i").toDF("k")
    val got = BloomPrefilter.antiJoin(batch, col("k"), history, col("k"),
        expectedItems = 1000L, fpp = 0.03)
      .collect().map(_.getString(0)).toSet
    val want = (501L to 700L).map(i => s"key$i").toSet
    assert(got === want)
  }

  test("tiny sketch (high fpp) still yields exact semantics") {
    import spark.implicits._
    val history = (1L to 100L).map(i => s"h$i").toDF("k")
    val batch = (1L to 200L).map(i => s"h$i").toDF("k")
    val got = BloomPrefilter.antiJoin(batch, col("k"), history, col("k"),
        expectedItems = 10L, fpp = 0.5) // deliberately undersized
      .collect().map(_.getString(0)).toSet
    assert(got === (101L to 200L).map(i => s"h$i").toSet)
  }
}
