package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native winnowing kernel: the whole MOSS fingerprint computation —
  * positional word n-gram md5 hashes, sliding window-of-w minima,
  * first-occurrence dedup — as ONE expression over the words array,
  * replacing the interpreted zip_with-fold chain of
  * `TextFunctions.winnowFingerprints` (~1 s of q40's ~2 s at sf0.1 was
  * that chain's lambda evaluation and intermediate array churn).
  *
  * Hash compatibility is bit-exact with `hash60(gram, 0)`: the value is
  * the first 15 hex chars of md5("0#" + gram) — i.e. the first 60 bits
  * of the digest big-endian — so the DuckDB oracle and the composed
  * expression agree fingerprint-for-fingerprint (equality is property-
  * tested against the composed form on arbitrary inputs).
  *
  * Codegen calls the static kernel directly: one JVM method per row,
  * no virtual dispatch per lambda element like the interpreted
  * higher-order evaluator.
  */
object Winnow {

  private val seedPrefix = "0#".getBytes("UTF-8")

  // one digest per task thread, not one lookup+alloc per row
  private val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel: words array → distinct window-min gram hashes.
    * Input elements must be non-null (the `words()` tokenizer output).
    */
  def fingerprints(ws: ArrayData, n: Int, w: Int): ArrayData = {
    val numWords = ws.numElements()
    val numGrams = numWords - (n - 1)
    if (numGrams < w) return new GenericArrayData(Array.empty[Long])
    val wordBytes = new Array[Array[Byte]](numWords)
    var i = 0
    while (i < numWords) {
      wordBytes(i) = ws.getUTF8String(i).getBytes
      i += 1
    }
    val md = localMd5.get()
    val hs = new Array[Long](numGrams)
    i = 0
    while (i < numGrams) {
      md.reset()
      md.update(seedPrefix)
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(wordBytes(i + j))
        j += 1
      }
      val d = md.digest()
      // first 60 bits of the digest, big-endian == conv(substr(hex,1,15),16,10)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = v >>> 4
      i += 1
    }
    val numWindows = numGrams - (w - 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](numWindows)
    i = 0
    while (i < numWindows) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      if (seen.add(m)) out += m
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API over the words array of `text` (normText tokenization,
    * same as the composed form).
    */
  def fingerprintsCol(text: Column, n: Int, w: Int): Column =
    GraftPlanBuilder.column(WinnowHashes(
      GraftPlanBuilder.expression(TextFunctions.words(text)), n, w))
}

case class WinnowHashes(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_hashes"

  override def nullSafeEval(ws: Any): Any =
    Winnow.fingerprints(ws.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow.fingerprints($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}
