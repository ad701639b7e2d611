package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental TOP-K view maintenance under inserts AND deletions —
  * the IVM family's order-statistic member (q200 abelian aggregates,
  * q262 join views, q264/q270 COUNT(DISTINCT) support state; this is
  * the one that is NOT abelian, which is exactly what the threshold
  * state is for).
  *
  * State per group = a BUFFER of the top-B live rows (B >= k) plus a
  * THRESHOLD θ — the (value, id) rank key of the best row ever
  * evicted from the buffer (none until the first eviction). The
  * standing invariant, preserved by every [[step]]:
  *
  *     buffer = ALL live rows ranking strictly above θ.
  *
  * (Rank order: value desc, id asc — a total order, ids unique.)
  * Proof by induction: inserts above θ enter the candidate set,
  * inserts below θ are discarded (they cannot crack any top that θ
  * certifies); deletes remove live rows wherever they sit (in-buffer
  * rows by anti-join, below-θ rows are a no-op on the buffer); an
  * eviction keeps the top-B candidates and raises θ to the (B+1)-th —
  * every candidate was above the old θ, so θ only ever rises and the
  * kept rows are exactly the live rows above the new θ.
  *
  * The top-k read is therefore EXACT whenever |buffer| >= k (rows
  * outside the buffer rank below θ, below every buffer row). Deletion
  * churn can drain a buffer below k while the group still has live
  * rows below θ — the one case order statistics cannot absorb
  * incrementally — and that is a WATERMARK-style certified condition,
  * not a guess: [[topkWithRefill]] detects |buffer| < k AND
  * n_live > |buffer|, rescans the BASE for exactly the flagged
  * groups (broadcast semi-join — refill cost is per-flagged-group,
  * never a full re-scan), and reports the `refilled` verdict as a
  * first-class output column so the rescan rate is observable in
  * production. At 100 TB: per-batch cost after warm-up is
  * O(|delta above θ| + B·|groups|) — the corpus is touched only by
  * flagged-group refills.
  *
  * Column contract: groupCols ++ (id, v) long columns; deltas carry
  * `sign` (+1 insert of a NEW unique id, −1 delete of a previously
  * inserted id). Meta schema: groupCols ++ (theta_v, theta_id,
  * has_theta, n_live).
  */
object TopKState {

  /** Empty buffer/meta state frames with the right schemas, derived
    * from any delta-shaped frame (its lineage is filtered to nothing,
    * so no job runs).
    */
  def emptyState(delta: DataFrame, groupCols: Seq[String])
      : (DataFrame, DataFrame) = {
    val g = groupCols.map(col)
    val none = delta.filter(lit(false))
    (none.select(g :+ col("id") :+ col("v"): _*),
      none.select(g :+ lit(0L).as("theta_v") :+ lit(0L).as("theta_id")
        :+ lit(0L).as("has_theta") :+ lit(0L).as("n_live"): _*))
  }

  /** One maintenance batch: fold a signed `delta` into (buf, meta).
    * Candidates ride the TopKPerKey node (map-side partial top-k), so
    * the only window runs over the ≤ (B+1)·|groups| survivor set.
    */
  def step(buf: DataFrame, meta: DataFrame, delta: DataFrame,
           groupCols: Seq[String], b: Int): (DataFrame, DataFrame) = {
    require(b >= 1, "TopKState.step needs buffer size B >= 1")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val ins = delta.filter(col("sign") === 1L)
      .select(g :+ col("id") :+ col("v"): _*)
    val del = delta.filter(col("sign") === -1L)
      .select(g :+ col("id"): _*)
    // admission: only rows ranking above θ can ever crack a certified
    // top — everything else is discarded here, which is what keeps
    // the steady-state batch cost delta-sized
    val insAdm = ins.join(
        meta.select(g :+ col("theta_v") :+ col("theta_id")
          :+ col("has_theta"): _*),
        groupCols, "left")
      .filter(col("has_theta").isNull || col("has_theta") === 0L ||
        col("v") > col("theta_v") ||
        (col("v") === col("theta_v") && col("id") < col("theta_id")))
      .select(g :+ col("id") :+ col("v"): _*)
    val cand = buf.select(g :+ col("id") :+ col("v"): _*)
      .unionByName(insAdm)
      .join(del, groupCols :+ "id", "left_anti")
    val ranked = graft.plans.TopK.perKey(cand, groupCols, "v",
        desc = true, tiebreak = Seq("id"), k = b + 1)
      .withColumn("rn", row_number().over(Window
        .partitionBy(g: _*).orderBy(col("v").desc, col("id").asc)))
    val bufNew = ranked.filter(col("rn") <= b)
      .select(g :+ col("id") :+ col("v"): _*)
    // the (B+1)-th candidate is the best row evicted this batch; every
    // candidate ranks above the old θ, so θ' = eviction when present
    val evict = ranked.filter(col("rn") === b + 1)
      .select(g :+ col("v").as("e_v") :+ col("id").as("e_id"): _*)
    val dn = delta.groupBy(g: _*)
      .agg(sum(col("sign").cast("long")).as("dn"))
    val metaNew = meta
      .join(dn, groupCols, "full_outer")
      .join(evict, groupCols, "full_outer")
      .select(g
        :+ coalesce(col("e_v"), col("theta_v"), lit(0L)).as("theta_v")
        :+ coalesce(col("e_id"), col("theta_id"), lit(0L)).as("theta_id")
        :+ greatest(coalesce(col("has_theta"), lit(0L)),
          when(col("e_v").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("has_theta")
        :+ (coalesce(col("n_live"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_live"): _*)
    (bufNew, metaNew)
  }

  /** The certified top-k read: buffer groups serve straight from
    * state; groups whose buffer drained below k with live rows still
    * outstanding (n_live > |buffer|) REFILL from `base` — the full
    * signed history (live row = positive sign sum), restricted to the
    * flagged groups by a broadcast semi-join. Output: groupCols ++
    * (refilled, rnk, id, v), `rnk` 1..k in (v desc, id asc) order;
    * groups with fewer than k live rows report what exists.
    */
  def topkWithRefill(buf: DataFrame, meta: DataFrame, base: DataFrame,
                     groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "topkWithRefill needs k >= 1")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val sizes = buf.groupBy(g: _*).agg(count(lit(1)).as("nb"))
    val flags = meta.join(sizes, groupCols, "left")
      .select(g :+ coalesce(col("nb"), lit(0L)).as("nb")
        :+ col("n_live"): _*)
      .withColumn("refilled",
        when(col("nb") < k && col("n_live") > col("nb"), lit(1L))
          .otherwise(lit(0L)))
    val flagged = flags.filter(col("refilled") === 1L)
      .select(groupCols.map(col): _*)
    val live = base.join(broadcast(flagged), groupCols, "left_semi")
      .groupBy(g :+ col("id") :+ col("v"): _*)
      .agg(sum(col("sign").cast("long")).as("s"))
      .filter(col("s") > 0)
      .select(g :+ col("id") :+ col("v"): _*)
    val rows = buf.join(broadcast(flagged), groupCols, "left_anti")
      .select(g :+ col("id") :+ col("v"): _*)
      .unionByName(live)
    graft.plans.TopK.perKey(rows, groupCols, "v",
        desc = true, tiebreak = Seq("id"), k = k)
      .withColumn("rnk", row_number().over(Window
        .partitionBy(g: _*).orderBy(col("v").desc, col("id").asc))
        .cast("long"))
      .join(broadcast(flags.select(g :+ col("refilled"): _*)),
        groupCols)
      .select(g :+ col("refilled") :+ col("rnk") :+ col("id")
        :+ col("v"): _*)
  }
}
