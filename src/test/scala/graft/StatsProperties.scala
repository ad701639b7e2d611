package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** ScalaCheck properties for the exact-integer statistics — the
  * algebraic identities the oracle equality silently depends on,
  * exercised on arbitrary generated samples rather than hand fixtures.
  */
object StatsProperties extends Properties("graft.stats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val sample: Gen[List[(Long, Int)]] = Gen.resize(40,
    Gen.nonEmptyListOf(for {
      v <- Gen.choose(-20L, 20L)
      side <- Gen.oneOf(0, 1)
    } yield (v, side)))

  property("mannWhitneyU2: u2_a + u2_b == 2·n_a·n_b whatever the ties") =
    forAll(sample, Gen.choose(1, 7)) { (rows, bdiv) =>
      import spark.implicits._
      // both sides must be non-empty for the identity to say anything
      val hasBoth = rows.exists(_._2 == 0) && rows.exists(_._2 == 1)
      !hasBoth || {
        val df = rows.toDF("v", "side")
        val got = Stats.mannWhitneyU2(df, col("v"),
            (col("side") === 0).cast("int"), (col("side") === 1).cast("int"),
            x => (x + lit(100)) / lit(bdiv) cast "long")
          .collect().head
        val (na, nb, u2a, u2b) =
          (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
        u2a + u2b == 2 * na * nb && u2a >= 0 && u2b >= 0
      }
    }

  property("mannWhitneyU2: bucketing granularity never changes the statistic") =
    forAll(sample) { rows =>
      import spark.implicits._
      val hasBoth = rows.exists(_._2 == 0) && rows.exists(_._2 == 1)
      !hasBoth || {
        val df = rows.toDF("v", "side")
        def run(bdiv: Int) = Stats.mannWhitneyU2(df, col("v"),
            (col("side") === 0).cast("int"), (col("side") === 1).cast("int"),
            x => (x + lit(100)) / lit(bdiv) cast "long")
          .collect().head.toSeq
        run(1) == run(5)
      }
    }

  private val pairSample: Gen[List[(String, String)]] = Gen.resize(40,
    Gen.nonEmptyListOf(for {
      a <- Gen.oneOf("x", "y", "z")
      b <- Gen.oneOf("p", "q")
    } yield (a, b)))

  property("chiSquareBp: statistic is non-negative and n is the row count") =
    forAll(pairSample) { rows =>
      import spark.implicits._
      val got = Stats.chiSquareBp(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
      got.getLong(0) >= 0 && got.getLong(2) == rows.size
    }

  property("chiSquareBp: duplicating every row leaves dof fixed, scales n") =
    forAll(pairSample) { rows =>
      import spark.implicits._
      val one = Stats.chiSquareBp(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
      val two = Stats.chiSquareBp((rows ++ rows).toDF("a", "b"),
        col("a"), col("b")).collect().head
      one.getLong(1) == two.getLong(1) &&
        two.getLong(2) == 2 * one.getLong(2)
    }
}
