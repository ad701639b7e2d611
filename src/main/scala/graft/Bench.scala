package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully executed via the `noop`
  * sink (all columns materialized — `count()` would let Catalyst prune
  * the projection work away and under-report).
  *
  * Failure policy: a query that throws is recorded in "errors" and the
  * process exits nonzero — a broken query must make the bench red, never
  * report a (fast, bogus) green time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev-only (the driver never sets it): comma-separated query filter so
    // a single regressed query can be re-timed without the full suite.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    def selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Cumulative executor task time (ms), fed by a listener: the r14
    // driver read the ≈1 wall-clock c8/c32 ratios at sf0.1 as "nothing
    // scales" (suspect_cpus_ignored) when the suite is actually
    // overhead-bound at this SF — per-query EXECUTOR task time >> wall
    // time is the legible form of "the cores were used". Listener
    // events are posted asynchronously, so attribution at query
    // boundaries can leak a trailing task into the next query; the
    // numbers are for the scaling picture, not sub-second accounting.
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Size file splits to the BENCH scale, not the 128 MB cluster
      // default: the test tables arrive as 1-2 splits under the
      // default, so every narrow pre-shuffle segment (tokenize, gram
      // build, signature kernels) serializes onto one core — the sf1
      // rehearsal measured a 760 s single-task shuffle-map stage that
      // 32 splits turn into ~25 s. At 100 TB the same knob is set by
      // the data (thousands of row groups); locally it must be set by
      // hand, exactly as the brief's spill-aware sizing rule says.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "4m"))
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce partitions when materializing CACHED plans too
      // (default false pins cached shuffles at the static partition count
      // — tiny cached iterables like the dedup-cluster graph would burn
      // hundreds of empty tasks per iteration otherwise)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); must be set before the
      // FIRST read (warmup included) or the vectorized reader rejects it.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // q35's warehouse tables land here, not in the repo working dir.
      .config("spark.sql.warehouse.dir",
        graft.util.TmpDirs.perProcess("graft_warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) taskMs.addAndGet(m.executorRunTime)
        }
      })

    // JVM + parquet-footer warmup so per-query numbers measure the query,
    // not first-touch class loading. Warmup failures are fatal: a table
    // that cannot even be counted means every query over it is broken.
    graft.util.Tables.names.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").count()
    }

    // One untimed pass over every query: JIT + whole-stage-codegen
    // compilation dominate cold runs of the heavy queries (±30% total
    // variance observed), so the timed pass reports steady-state numbers
    // — the figure that actually predicts sustained cluster throughput.
    // Errors are ignored here; the timed pass records them.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache()
    }

    // Two timed passes, best-of per query: a single GC pause / host
    // hiccup landing on one query would otherwise report a 10x-inflated
    // number for it (observed once: a 3.5 s query measured at 28 s).
    def timedPass(): Seq[(String, Double, Double, Option[String])] =
      selected.map { case (name, fn) =>
        val task0 = taskMs.get()
        val t0 = System.nanoTime()
        val err: Option[String] =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
          finally spark.catalog.clearCache() // release operator-level caches per query
        (name, (System.nanoTime() - t0) / 1e9,
          (taskMs.get() - task0) / 1e3, err)
      }
    val (pass1, pass2) = (timedPass(), timedPass())
    // A third pass only when the two totals disagree badly: host-load
    // spikes (observed: the same suite measuring 49s and 63s an hour
    // apart on a shared box) inflate BOTH passes, so best-of-two alone
    // cannot recover; the common quiet case stays at two passes.
    val t1 = pass1.map(_._2).sum; val t2 = pass2.map(_._2).sum
    val passes =
      if (math.abs(t1 - t2) > 0.15 * math.min(t1, t2)) Seq(pass1, pass2, timedPass())
      else Seq(pass1, pass2)
    // per query: best-of wall time, that same pass's executor task time
    val results = passes.transpose.map { ms =>
      val best = ms.minBy(_._2)
      (ms.head._1, best._2, best._3,
        ms.foldLeft(Option.empty[String])((acc, m) => acc.orElse(m._4)))
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // executor task-seconds per query (same best-of pass as the wall
    // number): task_sec >> wall sec at c32 is the direct evidence the
    // query runs wide — the scaling signal the wall-clock c8/c32 ratio
    // cannot carry on an overhead-bound SF.
    val tsk = results.map { case (k, _, ts, _) => jstr(k) + ":" + ts }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"task_sec":$tsk,"cpus":$cpus,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._4.isDefined)) sys.exit(1)
  }
}
