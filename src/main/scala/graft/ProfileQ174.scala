package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timing for q174 (prefix-filtered similarity join). */
object ProfileQ174 {
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
      println(f"[prof174] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val thr = 0.6
    val tok = graft.operators.Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), explode(col("grams")).as("token"))
    time("tok count")(println("tok=" + tok.count()))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    time("dfreq")(println("vocab=" + dfreq.count()))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("token").asc)
    val ranked = tok.join(dfreq, "token")
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val thrBp = math.round(thr * 10000)
    val need = graft.functions.IntMath.intDiv(
      lit(thrBp) * col("sz") + lit(9999L), lit(10000L))
    val prefix = ranked.filter(col("rn") <= col("sz") - need + 1).cache()
    time("prefix rows")(println("prefix=" + prefix.count()))
    time("prefix posting histogram")(
      prefix.groupBy("token").agg(count(lit(1)).as("p"))
        .agg(max("p").as("max_p"), expr("percentile(p, 0.99)").as("p99"),
          sum(col("p") * (col("p") - 1) / 2).as("pair_sum"))
        .show(false))
    val buckets = prefix.groupBy(col("token"))
      .agg(graft.functions.BoundedLongList(col("doc_id"), 1000000).as("docs"))
      .filter(col("docs").isNotNull)
      .select(sort_array(col("docs")).as("docs"))
    val cand = buckets.select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct().cache()
    time("candidates")(println("cand=" + cand.count()))
    val sets = graft.operators.Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), array_sort(col("grams")).as("toks"))
    val out = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(col("ta")).cast("long").as("n_a"),
        size(col("tb")).cast("long").as("n_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("shared"))
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= thr)
    time("verify+filter")(println("pairs=" + out.count()))
    spark.stop()
  }
}
