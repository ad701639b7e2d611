package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE runtime skew handling — the complement of the manual `SkewJoin`
  * salting utility (q41): with adaptive execution on and the skew
  * thresholds reachable, a join whose shuffle has one hot key must be
  * split at RUNTIME into multiple tasks (OptimizeSkewedJoin), with the
  * same join result. Manual salting remains for aggregations and for
  * engines of record where plan stability matters; AQE covers ad-hoc
  * joins with no code change.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime, result unchanged") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // make the hot partition cross the skew thresholds at test size
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one hot key + a sprinkle of cold keys, joined to a
      // small-but-not-broadcastable dim of the same keys
      val facts = (0 until 50000).map(i => (1L, i.toLong)) ++
        (0 until 500).map(i => ((i % 50 + 2).toLong, i.toLong))
      val fdf = facts.toDF("k", "v").repartition(8)
      val dim = (1L to 51L).map(k => (k, s"dim$k")).toDF("k", "name")
        .repartition(8)
      val joined = fdf.join(dim, "k")
      // materialize THIS dataframe's own plan (count() would spin up a
      // separate query execution and leave joined's AQE plan unfinalized)
      assert(joined.collect().length === 50500)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      // OptimizeSkewedJoin marks the join and the skewed shuffle read
      assert(finalPlan.contains("skew=true") ||
        finalPlan.contains("isSkew=true") ||
        finalPlan.contains("skewed"),
        s"expected a runtime skew-split marker in:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
