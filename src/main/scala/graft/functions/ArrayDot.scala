package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),...)`)
  * is correct but interpreted and allocates an intermediate array per row —
  * on an O(pairs) similarity join that dominated the benchmark. This
  * expression generates a tight fused Java loop inside whole-stage codegen
  * (no allocation, no virtual calls), keeping vector math on the 100 TB
  * path codegen'd like every other operator.
  *
  * Accumulation order is left-to-right over elements, matching both the
  * HOF formulation and DuckDB's list functions, so oracle results are
  * unchanged. Mismatched array lengths yield NULL (same contract as
  * ArrayCosine) — the bad row is surfaced, never silently truncated.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> — all call sites cast explicitly
  // (toDouble), so no implicit-coercion contract is needed here.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_dot"
  // NULL on length mismatch even when both inputs are non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftDotN = $a.numElements();
         |if ($b.numElements() != graftDotN) {
         |  ${ev.isNull} = true;
         |} else {
         |  double graftDotS = 0.0;
         |  for (int graftDotI = 0; graftDotI < graftDotN; graftDotI++) {
         |    graftDotS += $a.getDouble(graftDotI) * $b.getDouble(graftDotI);
         |  }
         |  ${ev.value} = graftDotS;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  // Weak keys: a retired SparkSession must be collectable — the registry
  // cache must never pin it. Synchronized map access also removes the
  // check-then-act race of the old Set-based version.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register `graft_array_dot` in the session's function registry (the
    * public way to surface a custom expression without internal Column
    * constructors), idempotently per session. createOrReplaceTempFunction
    * is itself idempotent, so a racing double-registration is harmless.
    */
  def register(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_array_dot", exprs => ArrayDot(exprs.head, exprs(1)), "scala_udf")
    }
  }

  /** Column API over the registered function. Callers must have called
    * `register(spark)` for the active session first.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_array_dot", a, b)
}
