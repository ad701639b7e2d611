package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: r15 confirmation probe after the cache-sweep removal, the
  * q219 revert, the q237 size-gated broadcast + chiSquare contingency
  * cache. Shipped forms vs verbatim r14 forms where the change is
  * bigger than a sweep (q237); shipped-only timings where the r14 form
  * differs just by the removed unpersist sweep (q199/q218/q221/q259 —
  * session A/B for the sweep cost itself is in ProfileR15b's log).
  */
object ProfileR15c {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    def T(t: String) = graft.util.Tables(spark, sfDir, t)
    def timeIt(tag: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[r15c] $tag%-34s $dt%6.2f s")
      dt
    }

    // q237 full r14 form: forced broadcast hint AND uncached 4-branch
    // chi-square (verbatim r14 Stats.chiSquareBp inline)
    def q237OldFull(): DataFrame = {
      val e = graft.operators.Graph.coOccurrenceEdges(
        T("lineitem"), col("l_orderkey"), col("l_partkey"))
      val dv = broadcast(e.groupBy(col("v")).agg(count(lit(1)).as("dv")))
      val j = e.join(dv, "v")
      val cells = j.select(length(bin(col("du"))).as("ca"),
          length(bin(col("dv"))).as("cb"))
        .filter(col("ca").isNotNull && col("cb").isNotNull)
        .groupBy("ca", "cb")
        .agg(count(lit(1)).cast("decimal(38,0)").as("o"))
      val rowT = cells.groupBy("ca").agg(sum("o").as("r"))
      val colT = cells.groupBy("cb").agg(sum("o").as("c"))
      val tot = cells.agg(sum("o").as("nn"))
      cells
        .join(broadcast(rowT), "ca")
        .join(broadcast(colT), "cb")
        .crossJoin(broadcast(tot))
        .agg(
          sum(expr("(10000 * (o * nn - r * c) * (o * nn - r * c)) div (nn * r * c)"))
            .cast("long").as("chi2_bp"),
          (count(lit(1)) - countDistinct("ca") - countDistinct("cb") + 1)
            .cast("long").as("dof"),
          max(col("nn")).cast("long").as("n"))
    }

    def shipped(name: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, sfDir)

    val singles = Seq("q199_khop_frontiers", "q218_frequent_triples",
      "q221_kcore_peel", "q259_connected_components",
      "q219_label_propagation", "q262_join_ivm",
      "q180_pagerank_copurchase", "q209_personalized_pagerank")
    singles.foreach(n => timeIt(s"$n warm", shipped(n)))
    timeIt("q237 NEW warm", shipped("q237_degree_mixing_chi2"))
    timeIt("q237 OLDFULL warm", () => q237OldFull())
    (1 to 2).foreach { p =>
      singles.foreach(n => timeIt(s"$n pass$p", shipped(n)))
      timeIt(s"q237 NEW pass$p", shipped("q237_degree_mixing_chi2"))
      timeIt(s"q237 OLDFULL pass$p", () => q237OldFull())
    }
    spark.stop()
  }
}
