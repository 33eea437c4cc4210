package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Native per-group top-k aggregate: `top_k(expr, k)` returns the k largest
  * values of any orderable expression (use a `struct(score, tiebreak)` for
  * deterministic ordering).
  *
  * Why a custom aggregate instead of `row_number() OVER (...) <= k`: the
  * window form sorts and shuffles EVERY row of every group; this aggregate
  * keeps a bounded k-buffer per group and participates in partial (map-side)
  * aggregation, so each partition ships at most k values per group to the
  * exchange. At 100 TB "top 3 documents per source" moves k·|groups| rows
  * instead of the corpus.
  *
  * Buffer management is the truncate-at-2k trick: append until the buffer
  * holds 2k values, then sort-desc and cut back to k — amortized O(log k)
  * per row without a heap allocation per element.
  */
case class TopK(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ArrayBuffer[Any]] with BinaryLike[Expression] {

  private def child: Expression = left

  private lazy val k: Int = right.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"top_k k must be an int literal, got $other")
  }

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable) {
      TypeCheckResult.TypeCheckFailure("top_k k must be a literal")
    } else if (!RowOrdering.isOrderable(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k input must be orderable, got ${child.dataType.catalogString}")
    } else if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"top_k k must be positive, got $k")
    } else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  private def shrink(buffer: ArrayBuffer[Any]): Unit =
    if (buffer.length > 2 * k) {
      val kept = buffer.sortWith((a, b) => ord.compare(a, b) > 0).take(k)
      buffer.clear()
      buffer ++= kept
    }

  override def update(buffer: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      buffer += InternalRow.copyValue(v)
      shrink(buffer)
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    buffer ++= other
    shrink(buffer)
    buffer
  }

  override def eval(buffer: ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.sortWith((a, b) => ord.compare(a, b) > 0).take(k).toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val buffer = ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buffer += InternalRow.copyValue(v))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopK =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "top_k"
}
