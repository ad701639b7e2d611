package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: one pass over the (pre-distinct) gram
  * array computing md5-derived hash60 per gram and the running min of
  * all `numPerm` universal-hash permutations — replacing an explode of
  * one row per gram plus a numPerm-column min aggregate. The signature
  * stage of the MinHash+LSH path becomes a pure per-row projection
  * (no exchange); the only shuffles left in the operator are the
  * band-bucket candidate join and the verify joins.
  *
  * Bit-exact with the aggregate form (property-tested): gram hash =
  * hash60(gram, 0); permutation s = (a_s·h₁ + b_s·h₂ + c_s) mod
  * 2^31−1 with the same `TextFunctions.permConst` constants the DuckDB
  * oracle inlines. Returns NULL for an empty gram array (gramSets
  * never produces one; callers filter isNotNull defensively).
  */
object MinHashNative {

  private val seedPrefix = "0#".getBytes("UTF-8")

  private val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Permutation constants flattened to (a,b,c) triples in one long
    * array, computed once per numPerm — the per-row loop must only
    * READ three longs per permutation, not re-derive (and re-box) the
    * splitmix-mixed tuples on every row of a per-row-throughput kernel.
    */
  private val constsCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def consts(numPerm: Int): Array[Long] =
    constsCache.computeIfAbsent(numPerm, np => {
      val arr = new Array[Long](3 * np)
      var s = 0
      while (s < np) {
        val (a, b, c) = TextFunctions.permConst(s)
        arr(3 * s) = a; arr(3 * s + 1) = b; arr(3 * s + 2) = c
        s += 1
      }
      arr
    })

  def signature(grams: ArrayData, numPerm: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return null
    val cs = consts(numPerm)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val md = localMd5.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(seedPrefix)
      md.update(grams.getUTF8String(i).getBytes)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = v >>> 4
      val h1 = v % 1073741824L
      val h2 = v >> 30
      var s = 0
      while (s < numPerm) {
        val p = (cs(3 * s) * h1 + cs(3 * s + 1) * h2 + cs(3 * s + 2)) % 2147483647L
        if (p < mins(s)) mins(s) = p
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def signatureCol(grams: Column, numPerm: Int): Column =
    GraftPlanBuilder.column(MinHashSigExpr(
      GraftPlanBuilder.expression(grams), numPerm))
}

case class MinHashSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullable: Boolean = true // NULL for empty gram arrays

  override def nullSafeEval(grams: Any): Any =
    MinHashNative.signature(grams.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData graftMhSig =
         |  graft.functions.MinHashNative.signature($c, $numPerm);
         |if (graftMhSig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = graftMhSig; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
