package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: regenerate the BEFORE round-body plans for the r15
  * gated-broadcast change (the after-dumps overwrote the pre-change
  * probe files). Each loop below is the verbatim r14 iteration body —
  * ungated joins, pageRank's crossJoin(broadcast(n)) init — run just
  * far enough to dump round 2's unmaterialized plan. No timing.
  */
object ProfileR15d {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
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
    def T(t: String) = graft.util.Tables(spark, sfDir, t)
    def dump(name: String, df: DataFrame): Unit = {
      val p = java.nio.file.Paths.get(outDir, s"$name.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"[r15d] wrote $name")
    }
    val Graph = graft.operators.Graph

    // q180 r14 body: crossJoin(broadcast(n)) init, ungated joins
    {
      val edges = Graph.coOccurrenceEdges(T("lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v", "du")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("u").as("node"), col("du")).distinct()
      val n = nodes.agg(count(lit(1)).as("n"))
      var score = nodes.crossJoin(broadcast(n))
        .select(col("node"), col("du"),
          expr("CAST(1000000000 AS BIGINT) div n").as("s"),
          expr("(15 * (CAST(1000000000 AS BIGINT) div n)) div 100").as("tele"))
      for (it <- 1 to 2) {
        val contrib = score
          .select(col("node").as("u"), expr("s div du").as("c"))
        val inbound = e.select("u", "v").join(contrib, "u")
          .groupBy("v").agg(sum("c").as("inc"))
          .withColumnRenamed("v", "node")
        val step = score.select("node", "du", "tele").join(inbound, "node")
          .withColumn("s", expr("tele + (85 * inc) div 100"))
          .drop("inc")
        if (it == 2) dump("q180_pagerank_copurchase_round2_before", step)
        score = step.localCheckpoint(eager = true)
      }
      spark.catalog.clearCache()
    }

    // q209 r14 body
    {
      val edges = Graph.coOccurrenceEdges(T("lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v", "du")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("u").as("node"), col("du")).distinct()
      val seed = nodes.agg(min("node").as("seed"))
      var score = nodes.crossJoin(broadcast(seed))
        .select(col("node"), col("du"), col("seed"),
          when(col("node") === col("seed"), lit(1000000000L))
            .otherwise(lit(0L)).as("s"))
      for (it <- 1 to 2) {
        val contrib = score.filter(col("s") > 0)
          .select(col("node").as("u"), expr("s div du").as("c"))
        val inbound = e.select("u", "v").join(contrib, "u")
          .groupBy("v").agg(sum("c").as("inc"))
          .withColumnRenamed("v", "node")
        val step = score.select("node", "du", "seed")
          .join(inbound, Seq("node"), "left")
          .withColumn("s",
            when(col("node") === col("seed"), lit(150000000L))
              .otherwise(lit(0L)) +
            expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) div 100"))
          .drop("inc")
        if (it == 2) dump("q209_personalized_pagerank_round2_before", step)
        score = step.localCheckpoint(eager = true)
      }
      spark.catalog.clearCache()
    }

    // q259 r14 body
    {
      val edges = Graph.coOccurrenceEdgesUV(
        T("lineitem").filter(col("l_quantity") >= 40),
        col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var lbl = e.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
        .localCheckpoint(eager = true)
      for (r <- 1 to 2) {
        val nbrMin = e.join(lbl.select(col("node").as("u"),
            col("lbl").as("nl")), "u")
          .groupBy(col("v").as("node")).agg(min("nl").as("m"))
        val step = lbl.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("m"), col("lbl"))).as("lbl"))
        if (r == 2) dump("q259_connected_components_round2_before", step)
        lbl = step.localCheckpoint(eager = true)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
