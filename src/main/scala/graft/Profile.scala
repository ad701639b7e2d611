package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce partitions when materializing CACHED plans too
      // (default false pins cached shuffles at the static partition count
      // — tiny cached iterables like the dedup-cluster graph would burn
      // hundreds of empty tasks per iteration otherwise)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs count")(docs.count())
    val d = Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
    time("gramSets materialize")(d.write.format("noop").mode("overwrite").save())
    val dc = d.cache()
    time("gramSets cache fill")(dc.count())
    val g = dc.select(col("doc_id"), explode(col("grams")).as("gram"))
    time("explode from cache")(g.write.format("noop").mode("overwrite").save())
    val hot = g.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") > 20).select("gram")
    time("hot grams")(println("hot=" + hot.count()))
    val kept = g.join(hot, Seq("gram"), "left_anti").cache()
    time("kept cache fill")(kept.count())
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    time("pair join+agg")(pairs.write.format("noop").mode("overwrite").save())
    val q23 = SparkEntry.queries("q23_dedup_ngram_jaccard")
    time("q23 full")(q23(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val q24 = SparkEntry.queries("q24_dedup_minhash_lsh")
    time("q24 full")(q24(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val mhPairs = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
      n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100)
    time("pairs noop")(mhPairs.write.format("noop").mode("overwrite").save())
    time("dupClusters total")(Dedup.dupClusters(mhPairs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
