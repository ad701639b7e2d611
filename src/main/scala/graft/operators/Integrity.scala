package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Content checksums for pipeline-migration validation: "did the two
  * pipelines produce the SAME TABLE?" answered with one scan and a
  * constant-size result — the cheap equality proof this repo's whole
  * oracle methodology rests on, packaged as an operator a user can run
  * against any pair of table versions (old engine vs new, pre- vs
  * post-backfill, replica vs primary).
  *
  * The checksum is ORDER-INDEPENDENT by construction: each row
  * serializes canonically (explicit null sentinel + unit separator —
  * concat_ws alone would silently merge adjacent nulls), hashes to the
  * repo-standard 60-bit md5 value, and the group checksum is the SUM of
  * row hashes mod 2^61−1 (a Mersenne prime; sums commute, so partition
  * order, shuffle order and file order all wash out). Collision risk is
  * the usual birthday bound on 61 bits — fine for validation, not for
  * adversarial integrity (this is a checksum, not a MAC).
  *
  * Scale shape: serialization + hash are per-row projections inside the
  * scan; the checksum is an algebraic aggregate (map-side partial sums
  * collapse each partition to one row per group), so the exchange
  * carries |groups| rows no matter the table size. A 100 TB equality
  * check is one columnar scan per side.
  *
  * Caveat, stated loudly: canonical serialization must be engine-stable,
  * so callers stick to integer/string columns (floats and timestamps
  * format differently across engines — cast them to scaled integers
  * first, the same rule every oracle in this repo follows).
  */
object Integrity {

  private val Sep = "\u001f"          // oracle: chr(31)
  private val NullSentinel = "\u0001" // oracle: chr(1)
  private val MersennePrime61 = "2305843009213693951" // 2^61 - 1

  /** MERGEABLE checksum state: (grp, n_rows, hsum) with hsum the raw
    * DECIMAL(38) sum of row hashes — deliberately NOT reduced mod the
    * prime yet, so states from different batches/shards merge by plain
    * addition ([[mergeChecksumState]]) and a streaming sink can
    * maintain the checksum incrementally (q204) exactly like the q99
    * aggregate partials. Headroom: 2⁶⁰-bounded hashes overflow 38
    * digits only past ~10¹⁹ rows.
    */
  def checksumState(df: DataFrame, group: Column, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "checksumState needs at least one column")
    val rowStr = concat_ws(Sep,
      cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*)
    df.select(group.as("grp"), hash60(rowStr, 0).as("h"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).as("hsum"))
  }

  /** Merge checksum states by addition — the abelian-group property the
    * whole order-independence argument rests on, now load-bearing for
    * incremental maintenance too.
    */
  def mergeChecksumState(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeChecksumState needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy("grp")
      .agg(sum("n_rows").as("n_rows"), sum("hsum").as("hsum"))
  }

  /** Reduce a state to the reportable checksum. */
  def finishChecksum(state: DataFrame): DataFrame =
    state.select(col("grp"), col("n_rows"),
      expr(s"CAST(hsum % $MersennePrime61 AS BIGINT)").as("checksum"))

  /** One row per group: (group, n_rows, checksum). Two tables are equal
    * (as multisets of the serialized columns, per group) iff both
    * columns match on every group.
    */
  def groupChecksum(df: DataFrame, group: Column, cols: Seq[Column]): DataFrame =
    finishChecksum(checksumState(df, group, cols))
}
