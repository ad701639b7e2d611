package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col

/** SURVEY §5.3 property tests (ScalaCheck): union row-count conservation,
  * unionByName null-fill, and channelKey vs a direct Scala reimplementation
  * of the reference's Python expression
  * ('_'.join(title.replace('-',' ').split('/')[0].split(' ')),
  * /root/reference/dags/extract.py:115).
  */
object UnionProperties extends Properties("graft.union") {

  // Each case runs a Spark job; keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val rows: Gen[List[(Long, String)]] =
    Gen.resize(20, Gen.listOf(Gen.zip(Gen.chooseNum(0L, 999L), Gen.alphaNumStr)))

  property("unionAll conserves row count: |A ∪all B| = |A| + |B|") =
    forAll(rows, rows) { (a, b) =>
      import spark.implicits._
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      da.union(db).count() == (a.size + b.size).toLong
    }

  property("unionByName(allowMissing) null-fills exactly the missing side") =
    forAll(rows, rows) { (a, b) =>
      import spark.implicits._
      val da = a.toDF("k", "v")
      val db = b.map(_._1).toDF("k")
      val u = da.unionByName(db, allowMissingColumns = true)
      u.count() == (a.size + b.size).toLong &&
        u.filter(col("v").isNull).count() >= b.size.toLong
    }

  // titles as word sequences joined by ' ', '-' or '/': no empty segments,
  // so Python's and Scala's split semantics agree and the oracle is exact.
  private val title: Gen[String] = for {
    words <- Gen.resize(5, Gen.nonEmptyListOf(
      Gen.resize(8, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))))
    seps <- Gen.listOfN(words.size - 1, Gen.oneOf(" ", "-", "/"))
  } yield words.head + seps.zip(words.tail).map { case (s, w) => s + w }.mkString

  private def pythonKey(t: String): String =
    t.replace('-', ' ').split('/')(0).split(' ').mkString("_")

  property("channelKey == the reference's Python derivation") =
    forAll(Gen.resize(15, Gen.nonEmptyListOf(title))) { titles =>
      import spark.implicits._
      val got = titles.toDF("t")
        .select(graft.ingest.Ingest.channelKey(col("t")))
        .collect().map(_.getString(0)).toList
      got == titles.map(pythonKey)
    }
}
