package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q182 (not part of the driver contract). */
object ProfileQ182 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = 3
    val grams = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(graft.functions.WordGramsNative.gramsCol(col("ws"), n))
          .as("gram"))
    val tf = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
    time("tf rows")(println("tf=" + tf.count()))
    val dfreq = tf.groupBy("gram").agg(count(lit(1)).as("df"))
    time("dfreq rows")(println("dfreq=" + dfreq.count()))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tfw = tf.join(broadcast(dfreq), "gram")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("gram"),
        (col("tf") * expr("(100 * (n_docs + 1)) div (df + 1)"))
          .cast("decimal(38,0)").as("w"))
    time("tfw materialize")(tfw.write.format("noop").mode("overwrite").save())
    val norms = tfw.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    time("norms")(norms.write.format("noop").mode("overwrite").save())
    val rare = dfreq.filter(col("df") >= 2 && col("df") <= 20).select("gram")
    time("rare count")(println("rare=" + rare.count()))
    val k = tf.join(broadcast(rare), "gram").select("doc_id", "gram")
    val cand = k.as("a").join(k.as("b"), "gram")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cand count")(println("cand=" + cand.count()))
    val wa = tfw.select(col("doc_id").as("doc_a"), col("gram"),
      col("w").as("wa"))
    val wb = tfw.select(col("doc_id").as("doc_b"), col("gram"),
      col("w").as("wb"))
    val dot = cand.join(wa, "doc_a").join(wb, Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
    time("dot")(dot.write.format("noop").mode("overwrite").save())
    val full = SparkEntry.queries("q182_tfidf_cosine_join")
    time("q182 full")(full(spark, sfDir).write.format("noop").mode("overwrite").save())
    time("q182 full again")(full(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
