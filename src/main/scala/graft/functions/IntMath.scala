package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftshim.GraftPlanBuilder

/** Exact integer arithmetic helpers shared by every ratio-emitting
  * operator (quality scoring, curation filters).
  *
  * `intDiv` is Catalyst's `IntegralDivide` (SQL `div`): true integer
  * division over longs, the same operation as DuckDB's `//`. Spark's
  * `/` on long columns is DOUBLE division, so the earlier
  * `floor(a / b)` form only matched the oracle under an unstated range
  * argument (quotient exactly representable below 2^53); routing
  * through IntegralDivide makes both engines perform the identical
  * integer operation with no float in the path at any magnitude.
  */
object IntMath {

  def intDiv(a: Column, b: Column): Column =
    GraftPlanBuilder.column(IntegralDivide(
      GraftPlanBuilder.expression(a), GraftPlanBuilder.expression(b)))

  /** Exact round-half-up of the rational num/den at fixed-point `scale`
    * (basis points for scale 10^4): halfUp(num·scale/den) =
    * (2·num·scale + den) div (2·den) over non-negative longs. DuckDB
    * replays it verbatim as `(num*2*scale + den) // (den*2)`. See the
    * q31/q50 rounding-boundary rationale: rounding a double-computed
    * ratio flips across engines when the value lands within 1 ulp of a
    * boundary (~1 in 15k docs at sf0.1).
    */
  def halfUp(num: Column, den: Column, scale: Long): Column =
    intDiv(num * (2L * scale) + den, den * 2L)

  /** halfUp at basis-point scale (4 decimal digits). */
  def bp(num: Column, den: Column): Column = halfUp(num, den, 10000L)

  /** Exact integer square root: the largest s with s·s <= n. Driver-side
    * scalar arithmetic — math.sqrt only seeds the search and integer
    * comparisons correct any ulp boundary, so no libm value reaches the
    * result (the oracle replays it as max(s) over s·s <= n).
    */
  def isqrt(n: Long): Long = {
    require(n >= 0, "isqrt needs n >= 0")
    val cap = 3037000499L // isqrt(Long.MaxValue): keep s·s overflow-free
    var s = math.min(math.sqrt(n.toDouble).toLong, cap)
    while (s > 0 && s * s > n) s -= 1
    while (s < cap && (s + 1) * (s + 1) <= n) s += 1
    s
  }
}
