package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Text primitive edge cases: the oracle SQL replays these bit-for-bit,
  * so their Spark behavior must be pinned.
  */
class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).head().getAs[T](0)
  }

  test("normText lowercases, trims, collapses whitespace") {
    assert(one[String](normText(col("t")), "  Hello\t WORLD  ") === "hello world")
  }

  test("wordGrams: fewer than n words gives an empty array, not an error") {
    assert(one[Seq[String]](distinctGrams(col("t"), 3), "one two") === Seq.empty)
    assert(one[Seq[String]](distinctGrams(col("t"), 3), "a b c d") === Seq("a b c", "b c d"))
  }

  test("distinctGrams dedups repeated shingles") {
    assert(one[Seq[String]](distinctGrams(col("t"), 2), "x y x y x") ===
      Seq("x y", "y x"))
  }

  test("hash60 is a non-negative 60-bit value, stable across calls") {
    val h1 = one[Long](hash60(col("t"), 0), "token")
    val h2 = one[Long](hash60(col("t"), 0), "token")
    val h3 = one[Long](hash60(col("t"), 1), "token")
    assert(h1 === h2)
    assert(h1 !== h3) // different seed -> different hash
    assert(h1 >= 0L && h1 < (1L << 60))
  }

  test("jaccard computes |A∩B|/|A∪B| on pre-distinct arrays") {
    import spark.implicits._
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
      .select(jaccard(col("a"), col("b"))).head().getDouble(0)
    assert(j === 0.5) // 2 shared / 4 total
  }
}
