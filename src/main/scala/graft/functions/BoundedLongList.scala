package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftPlanBuilder
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Skew-proof bounded collect: gathers at most `maxKeep + 1` child
  * values per group and evals to NULL the moment the cap is exceeded.
  *
  * This is the aggregation the DF-capped dedup pair machinery wants:
  * `groupBy(gram).agg(boundedLongList(doc_id, maxDf))` yields the full
  * posting list for grams with document frequency <= maxDf and NULL
  * for hot grams — in ONE aggregation whose per-group state is hard
  * -bounded at (maxDf+1)*8 bytes regardless of how hot the key is. The
  * alternative shapes are strictly worse at 100 TB: `collect_list` +
  * post-filter materializes the full posting list of a stopword shingle
  * (unbounded memory on one reducer); the count-then-anti-join shape is
  * safe but costs two extra shuffles of the exploded gram table plus a
  * self-join. Partial (map-side) aggregation applies as usual — a
  * buffer that has already overflowed stops absorbing input, so hot
  * keys ship at most maxDf+1 longs per map partition.
  *
  * Output order is partition-arrival order (non-deterministic, exactly
  * like collect_list); callers needing determinism sort downstream.
  */
case class BoundedLongListAgg(
    child: Expression,
    maxKeep: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(maxKeep >= 1, s"maxKeep must be >= 1, got $maxKeep")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(maxKeep + 1, 16))

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buffer.size <= maxKeep) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < other.size && buffer.size <= maxKeep) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: ArrayBuffer[Long]): Any =
    if (buffer.size > maxKeep) null
    else new GenericArrayData(buffer.toArray)

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedLongListAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedLongListAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(newChild: Expression): BoundedLongListAgg =
    copy(child = newChild)

  override def prettyName: String = "bounded_long_list"
}

object BoundedLongList {
  /** `boundedLongList(c, maxKeep)`: array of the group's values if the
    * group has <= maxKeep of them, else NULL. NULL inputs are skipped.
    */
  def apply(c: Column, maxKeep: Int): Column =
    GraftPlanBuilder.column(
      BoundedLongListAgg(GraftPlanBuilder.expression(c), maxKeep)
        .toAggregateExpression())
}
