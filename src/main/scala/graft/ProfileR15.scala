package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: round-15 within-session A/B harness. The host drifts
  * ±15-20% BETWEEN sessions (PLANS.md noise ledger), so optimization
  * acceptance evidence must alternate old/new variants inside ONE JVM.
  * For each r15 change this main times the shipped (new) query against
  * an inline verbatim copy of its r14 form, interleaved (warmup, then
  * new/old/new/old), and dumps both forms' plans — the
  * `plans/r15/<query>_{before,after}.txt` evidence trail.
  * Not part of the driver contract.
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    sys.props("graft.plan.probe.dir") = outDir // loop round-body dumps
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
    def T(s: SparkSession, t: String) = graft.util.Tables(s, sfDir, t)
    def dump(name: String, df: DataFrame): Unit = {
      val p = java.nio.file.Paths.get(outDir, s"$name.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    def timeIt(tag: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[r15ab] $tag%-36s $dt%6.2f s")
      dt
    }

    // ---- old forms (verbatim r14 copies) -------------------------------

    // q262: r14 joinViewDelta — raw B rows through every term
    def oldJoinViewDelta(a0: DataFrame, da: DataFrame, b0: DataFrame,
                         db: DataFrame, key: String, groupCols: Seq[String],
                         valueBp: org.apache.spark.sql.Column): DataFrame = {
      val aD = da.withColumnRenamed("sign", "__sa")
      val bD = db.withColumnRenamed("sign", "__sb")
      val a0s = a0.withColumn("__sa", lit(1L))
      val b0s = b0.withColumn("__sb", lit(1L))
      def contrib(l: DataFrame, r: DataFrame): DataFrame =
        l.join(r, key).select(
          groupCols.map(col) ++ Seq((col("__sa") * col("__sb")).as("__s"),
            valueBp.as("__v")): _*)
      val delta = contrib(broadcast(aD), b0s)
        .unionAll(contrib(a0s, broadcast(bD)))
        .unionAll(contrib(broadcast(aD), broadcast(bD)))
      val dAgg = delta.groupBy(groupCols.map(col): _*)
        .agg(sum("__s").as("n_rows"), sum(col("__s") * col("__v")).as("total_bp"))
      val v0 = contrib(a0s, b0s)
        .groupBy(groupCols.map(col): _*)
        .agg(sum("__s").as("n_rows"), sum(col("__s") * col("__v")).as("total_bp"))
      graft.warehouse.Warehouse.mergeAggState(Seq(v0, dAgg), groupCols)
        .filter(col("n_rows") =!= 0)
    }
    def q262frames(): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      import graft.functions.TextFunctions.hash60
      val ord = T(spark, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        (hash60(col("o_orderkey").cast("string"), 7) % 1000).as("ha"),
        (hash60(col("o_orderkey").cast("string"), 8) % 1000).as("hd"))
      val a0 = ord.filter(col("ha") < 900).select("o_orderkey", "o_custkey")
      val da = ord.filter(col("ha") >= 900)
        .select(col("o_orderkey"), col("o_custkey"), lit(1L).as("sign"))
        .unionAll(ord.filter(col("ha") < 900 && col("hd") < 50)
          .select(col("o_orderkey"), col("o_custkey"), lit(-1L).as("sign")))
      val li = T(spark, "lineitem").select(
        col("l_orderkey").as("o_orderkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        (hash60(concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string")), 7) % 1000).as("hb"),
        (hash60(concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string")), 8) % 1000).as("he"))
      val b0 = li.filter(col("hb") < 900).select("o_orderkey", "cents")
      val db = li.filter(col("hb") >= 900)
        .select(col("o_orderkey"), col("cents"), lit(1L).as("sign"))
        .unionAll(li.filter(col("hb") < 900 && col("he") < 50)
          .select(col("o_orderkey"), col("cents"), lit(-1L).as("sign")))
      (a0, da, b0, db)
    }
    def q262Old(): DataFrame = {
      val (a0, da, b0, db) = q262frames()
      oldJoinViewDelta(a0, da, b0, db, "o_orderkey", Seq("o_custkey"),
          col("cents"))
        .select(col("o_custkey"), col("n_rows"),
          col("total_bp").as("total_cents"))
        .orderBy("o_custkey")
    }

    // q219: r14 label propagation — per-node top-1 via row_number window
    def q219Old(): DataFrame = {
      val edges = graft.operators.Graph.coOccurrenceEdgesUV(
        T(spark, "lineitem"), col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = e.select(col("u").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (r <- 1 to 2) {
        val counted = e
          .join(labels.select(col("node").as("v"), col("lbl")), "v")
          .groupBy(col("u").as("node"), col("lbl"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("node").orderBy(col("n").desc, col("lbl"))
        val step = counted
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("node", "lbl")
        if (r == 2) dump("q219_label_propagation_roundbody_before", step)
        labels = step.localCheckpoint(eager = true)
      }
      labels.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).cast("long").as("sz"))
        .orderBy(col("sz").desc, col("community"))
        .limit(20)
    }

    // q199: r14 k-hop — visited re-distinct'd per hop
    def q199Old(): DataFrame = {
      val edges = graft.operators.Graph.coOccurrenceEdgesUV(
        T(spark, "lineitem").filter(col("l_quantity") >= 40),
        col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v").cache()
      var visited = e.agg(min(col("u")).as("node")).cache()
      var frontier = visited
      var rows = Vector.empty[(Long, Long, Long)]
      var cum = 1L
      for (h <- 1 to 3) {
        val next = e.join(frontier.select(col("node").as("u")), "u")
          .select(col("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .cache()
        val size = next.count()
        cum += size
        rows :+= ((h.toLong, size, cum))
        visited = visited.unionAll(next).distinct().cache()
        if (h == 2) dump("q199_khop_frontiers_visited_hop2_before", visited)
        frontier = next
      }
      import spark.implicits._
      rows.toDF("hop", "frontier_size", "cumulative_visited").orderBy("hop")
    }

    // q182: r14 tf-idf cosine — gram STRINGS keyed through tf/df/self-join
    def q182Old(): DataFrame = {
      import graft.functions.TextFunctions.words
      val df0 = T(spark, "documents")
      val grams = df0.select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          explode(graft.functions.WordGramsNative.gramsCol(col("ws"), 3))
            .as("gram"))
      val tf = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 20)
      val nDocs = df0.agg(count(lit(1)).as("n_docs"))
      val tfk = tf.join(broadcast(dfreq), "gram")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("gram"),
          (col("tf") * expr("(100 * (n_docs + 1)) div (df + 1)"))
            .cast("decimal(38,0)").as("w"))
      val norms = tfk.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
      val dot = tfk.as("a").join(tfk.as("b"), "gram")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.w") * col("b.w")).as("c"))
        .groupBy("doc_a", "doc_b").agg(sum(col("c")).as("dot"))
      dot
        .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")),
          "doc_a")
        .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          expr("(dot * dot) div ((n2a * n2b) div 10000)").cast("long")
            .as("cos2_bp"))
        .filter(col("cos2_bp") >= 2500L)
        .orderBy("doc_a", "doc_b")
    }

    // q237: r14 form — forced broadcast() on the |V|-row degree table
    def q237Old(): DataFrame = {
      val e = graft.operators.Graph.coOccurrenceEdges(
        T(spark, "lineitem"), col("l_orderkey"), col("l_partkey"))
      val dv = broadcast(e.groupBy(col("v")).agg(count(lit(1)).as("dv")))
      graft.operators.Stats.chiSquareBp(
        e.join(dv, "v"),
        length(bin(col("du"))), length(bin(col("dv"))))
    }

    def shipped(name: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, sfDir)

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q262_join_ivm", shipped("q262_join_ivm"), () => q262Old()),
      ("q219_label_propagation", shipped("q219_label_propagation"),
        () => q219Old()),
      ("q199_khop_frontiers", shipped("q199_khop_frontiers"),
        () => q199Old()),
      ("q182_tfidf_cosine_join", shipped("q182_tfidf_cosine_join"),
        () => q182Old()),
      ("q237_degree_mixing_chi2", shipped("q237_degree_mixing_chi2"),
        () => q237Old()))

    // static before/after plans for the lazy (non-loop) queries
    dump("q262_join_ivm_before", q262Old())
    dump("q262_join_ivm_after", shipped("q262_join_ivm")())
    dump("q182_tfidf_cosine_join_before", q182Old())
    dump("q182_tfidf_cosine_join_after", shipped("q182_tfidf_cosine_join")())
    dump("q237_degree_mixing_chi2_before", q237Old())
    dump("q237_degree_mixing_chi2_after", shipped("q237_degree_mixing_chi2")())
    spark.catalog.clearCache()

    // warmup (one pass each form), then alternate new/old twice
    pairs.foreach { case (n, nw, old) =>
      timeIt(s"$n NEW warm", nw); timeIt(s"$n OLD warm", old)
    }
    (1 to 2).foreach { p =>
      pairs.foreach { case (n, nw, old) =>
        timeIt(s"$n NEW pass$p", nw); timeIt(s"$n OLD pass$p", old)
      }
    }

    // q218: shipped form only (the r15 change is the |L1| admission
    // guard — time its cost against the session's q218 numbers)
    timeIt("q218 warm", shipped("q218_frequent_triples"))
    (1 to 2).foreach(p => timeIt(s"q218 pass$p",
      shipped("q218_frequent_triples")))

    // q237 runtime-final plan: proves AQE picks the broadcast WITHOUT
    // the hint (the static plan cannot show a runtime rewrite)
    val q237df = SparkEntry.queries("q237_degree_mixing_chi2")(spark, sfDir)
    q237df.write.format("noop").mode("overwrite").save()
    dump("q237_degree_mixing_chi2_after_final", q237df)
    // q262 runtime-final: shows the b0-aggregate exchange reuse
    val q262df = SparkEntry.queries("q262_join_ivm")(spark, sfDir)
    q262df.write.format("noop").mode("overwrite").save()
    dump("q262_join_ivm_after_final", q262df)
    spark.catalog.clearCache()
    spark.stop()
  }
}
