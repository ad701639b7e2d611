package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the text/dedup surface. */
object TextProperties extends Properties("graft.text") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] =
    Gen.resize(6, Gen.nonEmptyListOf(Gen.alphaLowerChar)).map(_.mkString)
  private val wordSeq: Gen[List[String]] =
    Gen.resize(30, Gen.listOf(word))

  /** The winnowing guarantee (Schleimer et al.): two documents sharing a
    * run of at least n+w-1 = 6 consecutive words share >= 1 fingerprint.
    */
  property("winnowing: shared 6-word run => shared fingerprint") =
    forAll(wordSeq, wordSeq, Gen.listOfN(6, word)) { (padA, padB, run) =>
      import spark.implicits._
      val docA = (padA ++ run).mkString(" ")
      val docB = (run ++ padB).mkString(" ")
      val fps = Seq(docA, docB).toDF("text")
        .select(graft.functions.TextFunctions
          .winnowFingerprints(col("text"), n = 3, w = 4).as("f"))
        .collect().map(_.getSeq[Long](0).toSet)
      fps(0).intersect(fps(1)).nonEmpty
    }

  /** Exact dedup conserves rows: the copy counts sum to the input size. */
  property("exact dedup: sum(n_copies) == row count") =
    forAll(Gen.resize(30, Gen.listOf(Gen.oneOf("a b c", "d e f", "g h i")))) { texts =>
      import spark.implicits._
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val total = graft.operators.Dedup.exact(df, col("text"), col("doc_id"))
          .agg(sum("n_copies")).head().getLong(0)
        total == texts.size.toLong
      }
    }
}
