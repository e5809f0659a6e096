package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Hll

/** Native Catalyst HLL distinct-count aggregate (SURVEY.md §2.2 tier 3's
  * "custom UDAF surface"): a `TypedImperativeAggregate` over the same
  * 16 KiB p=14 register file as [[graft.functions.Hll]].
  *
  * vs the `Aggregator`+`udaf()` wrapper ([[graft.functions.HllAggregator]]):
  * no Encoder round-trip per update/merge — the buffer lives as a raw
  * byte array in the aggregation map and serializes as itself. The
  * partial/final split (`merge` = slot-wise max) is what distributes the
  * reference's single-sketch design across executors.
  *
  * Register for SQL via [[graft.GraftExtensions]]: `hll_distinct_native(x)`.
  */
case class HllDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters()

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = child.dataType match {
        case StringType => v.asInstanceOf[UTF8String].getBytes
        case _ => UTF8String.fromString(v.toString).getBytes
      }
      Hll.add(buffer, org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L))
    }
    buffer
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] =
    Hll.merge(buffer, input)

  override def eval(buffer: Array[Byte]): Any = Hll.estimate(buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
