package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding word n-grams: one pass over the words array building
  * each gram with UTF8String.concatWs, replacing the n-fold
  * zip_with/concat chain of `TextFunctions.wordGrams` whose interpreted
  * lambdas dominate the per-row cost of every gram-based operator
  * (dedup candidate generation, decontamination, repetition signals).
  * Bit-identical output (property-tested against the composed form).
  */
object WordGramsNative {

  private val space = UTF8String.fromString(" ")

  /** Static kernel: words → grams of `n` joined by single spaces;
    * empty array when the doc has fewer than n words. Elements must be
    * non-null (the `words()` tokenizer output).
    */
  def grams(ws: ArrayData, n: Int): ArrayData = {
    val numWords = ws.numElements()
    val numGrams = numWords - (n - 1)
    if (numGrams <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val words = new Array[UTF8String](numWords)
    var i = 0
    while (i < numWords) { words(i) = ws.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](numGrams)
    val parts = new Array[UTF8String](n)
    i = 0
    while (i < numGrams) {
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def gramsCol(ws: Column, n: Int): Column =
    GraftPlanBuilder.column(WordGramsExpr(GraftPlanBuilder.expression(ws), n))
}

case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def nullSafeEval(ws: Any): Any =
    WordGramsNative.grams(ws.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramsNative.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}
