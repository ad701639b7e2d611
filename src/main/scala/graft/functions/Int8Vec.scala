package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** The PHYSICAL int8 ANN scan path: quantized vectors stored as
  * `BinaryType` (one byte per component — the real 8x cut vs
  * `array<double>`, 4x vs `array<float>`), scored by a fused byte-domain
  * cosine. `VectorFunctions.quantizeInt8` produces the int values; these
  * two kernels make the storage claim physically true instead of
  * rhetorical:
  *
  *  - `PackInt8`: `array<int>` (each in [-128, 127]) → `binary`. An
  *    out-of-range component throws — silent truncation would corrupt
  *    every downstream similarity score.
  *  - `ByteCosine`: cosine of two packed vectors. Dot and norms
  *    accumulate in LONG arithmetic (exact: |x·y| ≤ 127² · len, no
  *    overflow below ~2^47 components) and convert to double only for
  *    the final division — bit-identical to running ArrayCosine over the
  *    same integer values as doubles, because every partial sum is an
  *    integer below 2^53 (doubles represent those exactly), which is
  *    what lets the DuckDB oracle keep scoring `q8::DOUBLE[]` while
  *    Spark scans bytes.
  *
  * Malformed-input contract matches ArrayCosine: length mismatch → NULL
  * (surfaced, never silently truncated); a NULL element inside the
  * int array → NULL packed vector.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_int8"
  // NULL on null-element input even when the child array is non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getInt(i)
      if (v < -128 || v > 127)
        throw new IllegalArgumentException(
          s"graft_pack_int8: component $i = $v outside int8 range")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int graftPkN = $a.numElements();
         |byte[] graftPkOut = new byte[graftPkN];
         |for (int graftPkI = 0; graftPkI < graftPkN && !${ev.isNull}; graftPkI++) {
         |  if ($a.isNullAt(graftPkI)) { ${ev.isNull} = true; break; }
         |  int graftPkV = $a.getInt(graftPkI);
         |  if (graftPkV < -128 || graftPkV > 127)
         |    throw new IllegalArgumentException(
         |      "graft_pack_int8: component " + graftPkI + " = " + graftPkV +
         |      " outside int8 range");
         |  graftPkOut[graftPkI] = (byte) graftPkV;
         |}
         |${ev.value} = graftPkOut;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

/** Cosine similarity of two int8-packed `binary` vectors — see PackInt8. */
case class ByteCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_byte_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = x.length
    if (y.length != n) return null
    var s = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = x(i).toLong; val yi = y(i).toLong
      s += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    s.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftBcN = $a.length;
         |if ($b.length != graftBcN) {
         |  ${ev.isNull} = true;
         |} else {
         |  long graftBcS = 0L; long graftBcA = 0L; long graftBcB = 0L;
         |  for (int graftBcI = 0; graftBcI < graftBcN; graftBcI++) {
         |    long graftBcX = $a[graftBcI];
         |    long graftBcY = $b[graftBcI];
         |    graftBcS += graftBcX * graftBcY;
         |    graftBcA += graftBcX * graftBcX;
         |    graftBcB += graftBcY * graftBcY;
         |  }
         |  ${ev.value} = ((double) graftBcS) /
         |    (java.lang.Math.sqrt((double) graftBcA) *
         |     java.lang.Math.sqrt((double) graftBcB));
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteCosine =
    copy(left = newLeft, right = newRight)
}

/** binary (int8-packed) → array<int>, sign-extending — the scan-side
  * inverse of PackInt8, for readers that consume packed codes (e.g. the
  * PQ ADC scorer, which unpacks an 8-byte code vector and folds it
  * against a broadcast lookup table).
  */
case class UnpackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_unpack_int8"

  override def nullSafeEval(input: Any): Any =
    Int8Vec.unpackBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Int8Vec.unpackBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): UnpackInt8 =
    copy(child = newChild)
}

object Int8Vec {
  /** array<int> (values in [-128, 127]) → packed binary. */
  def pack(c: Column): Column =
    GraftPlanBuilder.column(PackInt8(GraftPlanBuilder.expression(c)))

  /** packed binary → array<int> (sign-extending; see UnpackInt8). */
  def unpack(c: Column): Column =
    GraftPlanBuilder.column(UnpackInt8(GraftPlanBuilder.expression(c)))

  /** Shared by interpreted and generated UnpackInt8 paths. */
  def unpackBytes(b: Array[Byte]): GenericArrayData = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  /** Cosine over two packed int8 binary vectors. */
  def byteCosine(a: Column, b: Column): Column =
    GraftPlanBuilder.column(
      ByteCosine(GraftPlanBuilder.expression(a), GraftPlanBuilder.expression(b)))
}
