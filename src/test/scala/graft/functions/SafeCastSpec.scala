package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SafeCast.tryInt must agree with try_cast on every input class except
  * the documented >18-digit zero-padding case.
  */
class SafeCastSpec extends SparkSpec {

  test("tryInt == try_cast on valid, malformed, overflow, whitespace, null") {
    import spark.implicits._
    val inputs = Seq(
      "42", "-7", "+13", "  99  ", "0", "2147483647", "-2147483648",
      "2147483648", "-2147483649", "999999999999999999", // long-sized overflow
      "3.7", "F", "O", "", " ", "12a", "a12", "1 2", "--5", null)
    val df = inputs.toDF("s")
    val rows = df.select(
      col("s"),
      SafeCast.tryInt(col("s")).as("guarded"),
      expr("try_cast(s as int)").as("reference")).collect()
    rows.foreach { r =>
      assert(r.get(1) === r.get(2),
        s"input '${r.get(0)}': guarded=${r.get(1)} try_cast=${r.get(2)}")
    }
  }

  test("documented divergence: >18-digit zero-padded value is NULL") {
    import spark.implicits._
    val r = Seq("0000000000000000012345")
      .toDF("s").select(SafeCast.tryInt(col("s"))).head()
    assert(r.isNullAt(0)) // try_cast would yield 12345
  }
}
