package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over (basket, item) pairs — the Apriori
  * staircase (Agrawal & Srikant, VLDB'94) with the candidate pruning
  * done the distributed way: every Lₖ level is a broadcast-sized
  * frequency table, and the basket stream is filtered against it BEFORE
  * the next level's enumeration, so per-basket fan-out only ever runs
  * over items that can still participate in a frequent set.
  *
  * Reference analogue: none — analytics-pack extension (q129's pair
  * counting promoted to the full L1→L2→L3 candidate-generation loop).
  */
object Itemsets {

  /** Frequent item TRIPLES at relative support `supNum/supDen` (e.g.
    * 1/2 = "in at least half the baskets"), top-`k` by support.
    *
    * The three Apriori moves, in plan terms:
    *  1. L1: per-item basket counts; items below support leave the
    *     basket stream via a broadcast semi-join — every later stage
    *     fans out only over L1 survivors.
    *  2. L2: pair enumeration is a self-join keyed on the BASKET id
    *     (fan-out bounded by basket width, the q129/Graph contract);
    *     the surviving pair set is again broadcast-sized.
    *  3. L3 candidates: a pair row (x, y) in a basket extends by a
    *     third item z — and the Apriori closure prunes (x,y) against
    *     L2 BEFORE the extension join, and (x,z)/(y,z) against L2
    *     before the count, so the count agg sees only candidates whose
    *     every 2-subset is frequent.
    *
    * Scale shape: baskets shuffle once on the basket key and stay
    * co-partitioned through both enumeration self-joins; every Lₖ
    * table rides as a broadcast; the support thresholds are exact
    * integer cross-multiplications (sup·supDen ≥ n·supNum — no
    * division anywhere). Pathologically wide baskets would be capped
    * upstream, the same loud contract as every dedup maxDf.
    */
  def frequentTriples(df: DataFrame, basket: Column, item: Column,
                      supNum: Int, supDen: Int, k: Int): DataFrame = {
    require(supNum >= 1 && supDen >= supNum,
      "frequentTriples needs a relative support in (0, 1]")
    val b = df.select(basket.as("bk"), item.as("it")).distinct().cache()
    val nB = b.agg(countDistinct("bk").as("nb"))
    def frequent(counted: DataFrame, supCol: Column): DataFrame =
      counted.crossJoin(broadcast(nB))
        .filter(supCol * supDen >= col("nb") * supNum)
    val l1 = frequent(
      b.groupBy("it").agg(count(lit(1)).as("sup")), col("sup"))
      .select("it")
    val bf = b.join(broadcast(l1), "it").select("bk", "it").cache()
    val pairs = bf.as("pa").join(bf.as("pb"), "bk")
      .filter(col("pa.it") < col("pb.it"))
      .select(col("bk"), col("pa.it").as("x"), col("pb.it").as("y"))
    val l2 = frequent(
      pairs.groupBy("x", "y").agg(count(lit(1)).as("sup")), col("sup"))
      .select("x", "y").cache()
    val cand = pairs
      .join(broadcast(l2), Seq("x", "y"), "left_semi")
      .join(bf.withColumnRenamed("it", "z"), "bk")
      .filter(col("y") < col("z"))
      .join(broadcast(l2.select(col("x"), col("y").as("z"))),
        Seq("x", "z"), "left_semi")
      .join(broadcast(l2.select(col("x").as("y"), col("y").as("z"))),
        Seq("y", "z"), "left_semi")
    cand.groupBy(col("x").as("item1"), col("y").as("item2"),
        col("z").as("item3"))
      .agg(count(lit(1)).cast("long").as("sup"))
      .orderBy(col("sup").desc, col("item1"), col("item2"), col("item3"))
      .limit(k)
  }
}
