package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where do q95/q172's ~4 s go? Prints each micro-batch's
  * durationMs breakdown (addBatch / getBatch / queryPlanning /
  * walCommit / commitOffsets / stateStore) from the streaming query's
  * progress events, so the streaming-overhead work targets the real
  * cost instead of folklore. Not part of the driver contract.
  */
object ProfileQ95 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name =
      if (args.length > 1) args(1) else "q95_stream_stream_join"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[prog] batch=${p.batchId} rows=${p.numInputRows} " +
          s"total=${d.get("triggerExecution")}ms " +
          s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} " +
          s"plan=${d.get("queryPlanning")} wal=${d.get("walCommit")} " +
          s"commit=${d.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"[prog]   state: commitMs=${so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
    }
    spark.streams.addListener(listener)
    (0 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[profq95] $name pass$pass ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
