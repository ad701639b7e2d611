package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins: when one join key carries a hot value,
  * the shuffle puts the whole key on one reducer. Salting splits each
  * left-side key into `buckets` sub-keys (deterministic hash of a
  * row-level column, NOT a random — results must be replayable) and
  * replicates the right side once per bucket, so the hot key spreads
  * over `buckets` reducers at the cost of a `buckets`x copy of the
  * (small) right side.
  *
  * The output is EXACTLY the plain join's rows — salting is a physical
  * rewrite, not a semantic one — which is what the oracle checks.
  * (Spark's AQE skew-join handles moderate skew automatically; explicit
  * salting is the tool when a single key exceeds what split-and-replay
  * can fix, e.g. a null-key flood or one pathological customer.)
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with left-side salting.
    *
    * @param saltSrc row-level column(s) on `left` giving each row a
    *                stable sub-key (e.g. a line number); hashed mod
    *                `buckets`.
    */
  def salted(left: DataFrame, right: DataFrame, key: String,
             saltSrc: Column, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
