package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over relational co-occurrence graphs, in EXACT
  * integer arithmetic so an independent engine replays every score
  * bit-for-bit (the same no-libm contract as q94/q100/q148).
  *
  * Reference analogue: none — extension in the analytics pack, the
  * "which items anchor the catalog" ranking a recommendation/curation
  * pipeline derives from co-engagement.
  */
object Graph {

  /** Co-occurrence edges: distinct undirected item pairs sharing a
    * group (e.g. parts sharing an order). Output one row per ordered
    * direction (u, v) plus each source's out-degree — the shape the
    * propagation loop consumes.
    *
    * Scale shape: the pair enumeration is a self-join keyed on the
    * GROUP id, so fan-out per group is bounded by the group size
    * (orders hold single-digit lineitems; a 100 TB feed with
    * pathological groups would cap or sample groups first — loud
    * contract, same family as every dedup maxDf). Distinct-edges and
    * degree are each one hash shuffle on the edge/node key.
    */
  def coOccurrenceEdges(df: DataFrame, group: Column, item: Column): DataFrame = {
    val g = df.select(group.as("gk"), item.as("it")).distinct()
    val pairs = g.as("a").join(g.as("b"), "gk")
      .filter(col("a.it") < col("b.it"))
      .select(col("a.it").as("u"), col("b.it").as("v"))
      .distinct()
    val sym = pairs.unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("du"))
    sym.join(deg, "u")
  }

  /** PageRank over a symmetric edge list, `iters` synchronous
    * iterations, damping 85/100, all in scaled integer arithmetic
    * (scores scaled by 1e9; every division integral, so both engines
    * truncate identically — no float ever enters).
    *
    *   init        = 1e9 div n
    *   contrib(u)  = score(u) div deg(u)
    *   next(v)     = (15·init) div 100 + (85·Σ_in contrib) div 100
    *
    * Integer truncation leaks a few units of mass per node per
    * iteration relative to real-valued PageRank — deliberately: the
    * contract is THIS fixed-point program, replayed exactly, the same
    * bargain as q100's integer BM25. On a symmetric graph every node
    * has in-edges, so no dangling-mass term is needed.
    *
    * Scale shape: each iteration is one join of the score table to the
    * edge list on the source key plus one aggregation keyed on the
    * target — the canonical Pregel step as two exchanges; at cluster
    * scale you'd co-partition edges and scores on the node key once
    * (bucketing) so the join side of every iteration is exchange-free,
    * and checkpoint scores every few iterations to cut the lineage.
    * `edges` is analyzed once and reused across iterations — Spark
    * re-executes the scan per iteration (no cache, by design: at 100 TB
    * the edge list outlives executor storage; the scan is columnar and
    * pruned to 3 ints).
    *
    * Input columns: u, v, du (from `coOccurrenceEdges`).
    * Output: (node, pr) — pr = scaled score after `iters` iterations.
    */
  def pageRankInt(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pageRankInt needs iters >= 1")
    val nodes = edges.select(col("u").as("node"), col("du")).distinct()
    val n = nodes.agg(count(lit(1)).as("n"))
    var score = nodes.crossJoin(broadcast(n))
      .select(col("node"), col("du"),
        expr("CAST(1000000000 AS BIGINT) div n").as("s"),
        expr("(15 * (CAST(1000000000 AS BIGINT) div n)) div 100").as("tele"))
    for (_ <- 1 to iters) {
      val contrib = score
        .select(col("node").as("u"), expr("s div du").as("c"))
      val inbound = edges.select("u", "v").join(contrib, "u")
        .groupBy("v").agg(sum("c").as("inc"))
        .withColumnRenamed("v", "node")
      score = score.select("node", "du", "tele").join(inbound, "node")
        .withColumn("s", expr("tele + (85 * inc) div 100"))
        .drop("inc")
    }
    score.select(col("node"), col("s").as("pr"))
  }
}
