package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: isolate the r07 bench regressions (q73 +45%, q56 +37% vs
  * r06 with no source change) — per-query warmup + 3 timed passes each,
  * same session config as Bench, printed per pass so trend (JIT/cache
  * warm-in) is visible. Not part of the driver contract.
  */
object ProfileReg {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q73_substring_runs", "q56_pii_email_phone", "q69_containment")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // keep EVERY Bench session knob (the "same config as Bench"
      // claim this tool's comparisons rest on): without the bench-
      // scale split sizing the scans arrive 1-2 splits wide and the
      // isolated numbers are not comparable to suite numbers
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
    graft.util.Tables.names.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").count()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profreg] $name%-24s pass$pass ${dt}%6.2f s" +
          (if (pass == 0) " (warmup)" else ""))
      }
    }
    spark.stop()
  }
}
