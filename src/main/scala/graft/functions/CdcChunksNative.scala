package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking kernel: the whole Rabin-style cut
  * sweep — 4-char base-31 rolling hash over code points, cut where the
  * hash ≡ 0 (mod mask), segment slicing, min-length floor — as ONE
  * expression over the document string, replacing the composed
  * sequence→filter(substr·ascii)→zip→explode→substr program in
  * `Dedup.cdcChunks`.
  *
  * Why native: `substr(txt, p, 1)` on a UTF8String seeks from byte 0 to
  * char p on every call, so the composed sweep's 4 probes per position
  * are O(len) EACH — O(len²) total per document (12.1 s at sf0.1, the
  * suite's slowest query; the "materialize a code-point array" fix was
  * worse — projection collapse inlines the array into every lambda use
  * site, measured 190 s). One decode pass + one rolling sweep is O(len).
  *
  * Bit-compat contract with the composed form (spec-pinned):
  *  - code(p) == `ascii(substr(txt, p, 1))` == codePointAt(0) of the
  *    p-th UTF-8 character — `String.codePoints()` indexing matches
  *    UTF8String char indexing one-to-one (a supplementary char is one
  *    4-byte UTF-8 sequence and one code-point element);
  *  - hash arithmetic is exact (Long): identical to the composed
  *    `ascii * lit(29791) + …` Int column wherever that column is
  *    defined — code points above ~72k would overflow Int and make the
  *    ANSI-mode composed form THROW, so the kernel (which stays exact
  *    there) strictly extends it to supplementary-plane text;
  *  - `h % mask == 0` matches Spark's Remainder zero test (h ≥ 0 here).
  */
object CdcChunksNative {

  /** Static kernel: document string → chunk array.
    * Cuts after each 4-char window (1-based start i in 1..n-3) whose
    * hash ≡ 0 (mod mask); emits segments between consecutive bounds
    * (0, cuts…, n) of at least `minLen` chars. Documents shorter than
    * 4 chars yield no chunks (matches the composed form's length≥4
    * pre-filter, enforced here so the caller's filter is belt-and-
    * braces rather than load-bearing).
    */
  def chunks(s: UTF8String, mask: Int, minLen: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < 4) return new GenericArrayData(Array.empty[AnyRef])
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n / 16 + 1)
    var prev = 0 // 0-based exclusive start of the current segment
    var i = 0    // 0-based window start; 1-based position i+1 runs 1..n-3
    while (i + 3 < n) {
      val h = cps(i) * 29791L + cps(i + 1) * 961L +
        cps(i + 2) * 31L + cps(i + 3)
      if (h % mask == 0) {
        val cut = i + 4 // 1-based cut end == (i+1) + 3
        if (cut - prev >= minLen)
          out += UTF8String.fromString(new String(cps, prev, cut - prev))
        prev = cut
      }
      i += 1
    }
    if (n - prev >= minLen)
      out += UTF8String.fromString(new String(cps, prev, n - prev))
    new GenericArrayData(out.toArray[AnyRef])
  }

  /** Column API: array of CDC chunks of `text` (null text → null). */
  def chunksCol(text: Column, mask: Int, minLen: Int): Column =
    GraftPlanBuilder.column(CdcChunks(
      GraftPlanBuilder.expression(text), mask, minLen))
}

case class CdcChunks(child: Expression, mask: Int, minLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(s: Any): Any =
    CdcChunksNative.chunks(s.asInstanceOf[UTF8String], mask, minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunksNative.chunks($c, $mask, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
