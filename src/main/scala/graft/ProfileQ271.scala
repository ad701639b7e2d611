package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the r11 verdict #5 measurement — q271's composed chain
  * (capped build → sampled mining) with the split kernel
  * unmaterialized (r11 shape) vs the NARROW (vec_id, bucket, parent,
  * was_split) checkpoint + vector re-join. args: sfDir narrow(0|1)
  * [passes]. Bench session config (maxPartitionBytes=4m, AQE,
  * shuffle=cpus). Run each variant in its OWN JVM for a fair compare.
  */
object ProfileQ271 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val narrow = args.length > 1 && args(1) == "1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "4m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        graft.util.TmpDirs.perProcess("graft_warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    (0 until passes).foreach { pass =>
      val t0 = System.nanoTime()
      val post = graft.operators.Similarity.kmeansBucketsCapped(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        col("vec_id"), col("embedding"),
        rounds = 2, capNum = 9, capDen = 8, narrowCheckpoint = narrow)
      graft.operators.Similarity.mutualNnMarginIvfSampled(
          post.select("vec_id", "v", "bucket"),
          col("vec_id"), col("v"), col("bucket"),
          k = 3, nprobe = 2, m = 192, seed = 17)
        .orderBy("vec_a", "vec_b")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[profq271] narrow=$narrow pass$pass " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
