package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: r15 isolation probe. The first A/B session showed the
  * SHIPPED q199 (either union form) running ~2x slower than a verbatim
  * INLINE copy of the same algorithm in the same JVM — so the suspect
  * is not the union-distinct line but something in how the shipped
  * operator differs from the copy. This probe runs minimal-diff
  * variants interleaved to pin the cause, plus a 3-pass re-test of the
  * q182 gram-hashing change that read noisy in session A.
  */
object ProfileR15b {
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
      println(f"[r15b] $tag%-34s $dt%6.2f s")
      dt
    }

    // q199 inline, parameterized on the two candidate causes: the
    // union distinct and the trailing unpersist sweep.
    def khopInline(dedupUnion: Boolean, release: Boolean): DataFrame = {
      val edges = graft.operators.Graph.coOccurrenceEdgesUV(
        T("lineitem").filter(col("l_quantity") >= 40),
        col("l_orderkey"), col("l_partkey"))
      val e = edges.select("u", "v").cache()
      val cached = scala.collection.mutable.ArrayBuffer[DataFrame](e)
      var visited = e.agg(min(col("u")).as("node")).cache()
      cached += visited
      var frontier = visited
      var rows = Vector.empty[(Long, Long, Long)]
      var cum = 1L
      for (h <- 1 to 3) {
        val next = e.join(frontier.select(col("node").as("u")), "u")
          .select(col("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .cache()
        cached += next
        val size = next.count()
        cum += size
        rows :+= ((h.toLong, size, cum))
        val u = visited.unionAll(next)
        visited = (if (dedupUnion) u.distinct() else u).cache()
        cached += visited
        frontier = next
      }
      if (release) cached.foreach(_.unpersist(blocking = false))
      import spark.implicits._
      rows.toDF("hop", "frontier_size", "cumulative_visited").orderBy("hop")
    }

    val q199variants: Seq[(String, () => DataFrame)] = Seq(
      ("q199 shipped (nodist+rel)",
        () => SparkEntry.queries("q199_khop_frontiers")(spark, sfDir)),
      ("q199 inline nodist norel", () => khopInline(false, false)),
      ("q199 inline dist norel", () => khopInline(true, false)),
      ("q199 inline dist rel", () => khopInline(true, true)),
      ("q199 inline nodist rel", () => khopInline(false, true)))

    // q182 string-gram (old) form
    def q182Old(): DataFrame = {
      import graft.functions.TextFunctions.words
      val df0 = T("documents")
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

    // warmups
    q199variants.foreach { case (n, f) => timeIt(s"$n warm", f) }
    timeIt("q182 NEW warm",
      () => SparkEntry.queries("q182_tfidf_cosine_join")(spark, sfDir))
    timeIt("q182 OLD warm", () => q182Old())
    (1 to 3).foreach { p =>
      q199variants.foreach { case (n, f) => timeIt(s"$n pass$p", f) }
      timeIt(s"q182 NEW pass$p",
        () => SparkEntry.queries("q182_tfidf_cosine_join")(spark, sfDir))
      timeIt(s"q182 OLD pass$p", () => q182Old())
    }
    spark.stop()
  }
}
