package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Integrity

/** ScalaCheck properties for the table-checksum algebra — the
  * order-independence and merge laws the streaming maintenance (q204)
  * and the two-engine oracle equality both rest on, exercised on
  * arbitrary generated tables and splits rather than hand fixtures.
  */
object IntegrityProperties extends Properties("graft.integrity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val row: Gen[(Long, String, Option[String])] = for {
    id <- Gen.choose(0L, 50L)
    grp <- Gen.oneOf("a", "b", "c")
    payload <- Gen.option(Gen.resize(8, Gen.listOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('\u001f'))))
      .map(_.mkString))
  } yield (id, grp, payload)

  private val table: Gen[List[(Long, String, Option[String])]] =
    Gen.resize(25, Gen.nonEmptyListOf(row))

  private def checksum(rows: Seq[(Long, String, Option[String])],
                       parts: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    Integrity.groupChecksum(
        rows.toDF("id", "grp", "payload").repartition(parts),
        col("grp"), Seq(col("id"), col("payload")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  property("checksum invariant under permutation and partitioning") =
    forAll(table, Gen.choose(1, 5), Gen.choose(1, 5)) { (rows, p1, p2) =>
      checksum(rows, p1) == checksum(scala.util.Random.shuffle(rows), p2)
    }

  property("state merge over any split equals the one-pass checksum") =
    forAll(table, Gen.choose(0, 100)) { (rows, cut) =>
      import spark.implicits._
      val k = (rows.size * cut) / 101
      val (l, r) = rows.splitAt(k)
      val cols = Seq(col("id"), col("payload"))
      def state(part: Seq[(Long, String, Option[String])]) =
        Integrity.checksumState(
          part.toDF("id", "grp", "payload"), col("grp"), cols)
      val merged = Integrity.finishChecksum(
          Integrity.mergeChecksumState(
            Seq(state(l), state(r))))
        .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
        .toMap
      merged == checksum(rows, 3)
    }

  property("any single-field edit moves its group's checksum") =
    forAll(table) { rows =>
      val base = checksum(rows, 2)
      val (id, grp, payload) = rows.head
      val edited = (id, grp, Some(payload.getOrElse("") + "!")) +: rows.tail
      checksum(edited, 2)(grp)._2 != base(grp)._2
    }
}
