package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup — "is this batch row already in
  * the history?" answered without shuffling the batch against 100 TB of
  * history: a Bloom sketch of the history keys rides to every task as a
  * broadcast literal, rows the sketch rejects are DEFINITELY new (Bloom
  * filters have no false negatives), and only the `might contain`
  * candidates — fpp of the genuinely-new rows plus the true duplicates
  * — pay the exact verification join. Semantics are EXACTLY the plain
  * anti-join (the sketch only routes rows), which is what the oracle
  * replays.
  *
  * This is the scan-side prefilter pattern Spark's own runtime bloom
  * join injects for equi-joins; building it explicitly makes it
  * available to the incremental-ingest path where the "join" is a
  * nightly batch vs a persisted key index. Keys travel as xxhash64
  * longs on both the build and probe side (one sketch insert per
  * distinct key, `might_contain` probing the same hash domain).
  *
  * Scale note: the sketch is sized by `expectedItems`/`fpp` (~1.2 GB
  * per 10⁹ distinct keys at 1% — at that point build per history
  * partition and OR the sketches, or raise fpp; the verification join
  * keeps correctness whatever the sketch quality). The build is one
  * distributed aggregation; only the sketch bytes land on the driver.
  */
object BloomPrefilter {

  def antiJoin(batch: DataFrame, key: Column,
               history: DataFrame, histKey: Column,
               expectedItems: Long, fpp: Double): DataFrame = {
    val bloom = history.select(xxhash64(histKey).as("hk"))
      .stat.bloomFilter("hk", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // BloomFilterMightContain is not in the public function registry
    // (Catalyst reserves it for its own runtime bloom joins); build the
    // expression node directly — same codegen'd probe the optimizer
    // injects, fed our broadcast sketch literal.
    import org.apache.spark.sql.graftshim.GraftPlanBuilder
    val maybe = GraftPlanBuilder.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftPlanBuilder.expression(lit(bos.toByteArray)),
        GraftPlanBuilder.expression(xxhash64(key))))
    val tagged = batch.withColumn("__maybe", maybe)
    val definitelyNew = tagged.filter(!col("__maybe")).drop("__maybe")
    val verified = tagged.filter(col("__maybe")).drop("__maybe")
      .join(history.select(histKey.as("__hk")), key === col("__hk"),
        "left_anti")
    definitelyNew.unionByName(verified)
  }
}
