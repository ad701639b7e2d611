package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 60-bit SimHash: the whole fingerprint — md5 hash per token,
  * 60 ±1-bit counters, sign threshold — in ONE pass over the words
  * array. This replaces an explode (one row per TOKEN) plus a 60-sum
  * hash aggregate: the aggregate formulation shuffles 60 longs per doc
  * and pays the exchange; this is a pure per-row projection, so the
  * fingerprint stage of the SimHash dedup path becomes shuffle-FREE
  * (the only remaining shuffle is the chunk-bucket candidate join).
  *
  * Bit-exact with the aggregate form (property-tested): token hash =
  * hash60(word, 0) = first 60 bits of md5("0#" + word) big-endian;
  * empty tokens are skipped; bit i of the fingerprint is set iff the
  * ±1 sum of token-hash bit i is strictly positive. Returns NULL for
  * docs with no non-empty tokens — the rows the aggregate form never
  * emits (callers filter isNotNull to reproduce that contract).
  */
object SimHashNative {

  private val seedPrefix = "0#".getBytes("UTF-8")

  private val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel: words array → boxed fingerprint Long, or null when
    * the doc has no non-empty tokens.
    */
  def fingerprint(ws: ArrayData): java.lang.Long = {
    val numWords = ws.numElements()
    val sums = new Array[Int](60)
    val md = localMd5.get()
    var seenToken = false
    var i = 0
    while (i < numWords) {
      val bytes = ws.getUTF8String(i).getBytes
      if (bytes.length > 0) {
        seenToken = true
        md.reset()
        md.update(seedPrefix)
        md.update(bytes)
        val d = md.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = v >>> 4
        var bit = 0
        while (bit < 60) {
          if (((v >> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    if (!seenToken) return null
    var fp = 0L
    var bit = 0
    while (bit < 60) {
      if (sums(bit) > 0) fp |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(fp)
  }

  def fingerprintCol(text: Column): Column =
    GraftPlanBuilder.column(SimHashExpr(
      GraftPlanBuilder.expression(TextFunctions.words(text))))
}

case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = true // NULL for token-less docs

  override def nullSafeEval(ws: Any): Any =
    SimHashNative.fingerprint(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long graftShFp = graft.functions.SimHashNative.fingerprint($c);
         |if (graftShFp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = graftShFp.longValue(); }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
