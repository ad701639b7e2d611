package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic main (dev-only): reproduce the q174 in-suite
  * parallelism collapse by running q174 → q122 → q174 in one session
  * (the Bench session shape) and printing every completed stage's task
  * count + runtime for each q174 execution, plus the session confs that
  * govern partitioning. See PLANS.md "bench-noise note" lineage.
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf1")
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

    @volatile var stages = List.empty[(Int, Int, Long)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages = (si.stageId, si.numTasks, ms) :: stages
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def confs(): String = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.files.maxPartitionBytes",
      "spark.default.parallelism"
    ).map(k => s"$k=${spark.conf.getOption(k).getOrElse("<unset>")}")
      .mkString(" ")

    def run(name: String, label: String): Unit = {
      stages = Nil
      println(s"### BEFORE $label: ${confs()}")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"### $label took $sec%.1f s; stages (id, tasks, ms):")
      stages.reverse.foreach { case (id, n, ms) =>
        println(s"###   stage=$id tasks=$n ms=$ms")
      }
    }

    run("q174_prefix_jaccard", "q174-first")
    run("q122_mad_outliers", "q122")
    run("q174_prefix_jaccard", "q174-second")
    spark.stop()
  }
}
