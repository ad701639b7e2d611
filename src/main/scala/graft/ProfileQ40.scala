package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only: stage-attribution for q40 winnowing (not driver contract). */
object ProfileQ40 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.util.Tables(spark, sfDir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warm")(noop(docs))
    val fp = docs.select(col("doc_id"),
      winnowFingerprints(col("text"), n = 3, w = 4).as("fps"))
    time("composed projection")(noop(fp))
    time("composed projection x2")(noop(fp))
    val fpN = docs.select(col("doc_id"),
      graft.functions.Winnow.fingerprintsCol(col("text"), 3, 4).as("fps"))
    time("native projection")(noop(fpN))
    time("native projection x2")(noop(fpN))
    val fp2 = fpN
    val ex = fp2.select(col("doc_id"), explode(col("fps")).as("fingerprint"))
    time("+ explode")(noop(ex))
    time("+ sort (q40 full)")(noop(ex.orderBy("doc_id", "fingerprint")))
    spark.stop()
  }
}
