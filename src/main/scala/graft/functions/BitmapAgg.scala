package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.{Shims => ExpressionUtils}
import org.apache.spark.sql.types._
import org.roaringbitmap.RoaringBitmap

import graft.core.Bitmaps

/** `bitmap_or_agg(docid)` — aggregates integer docids into one roaring
  * bitmap (Cbo-serialized binary), the Spark-native replacement for the
  * reference's `merge_roaring_bitmaps` grenad merge function
  * (`/root/reference/milli/src/update/index_documents/helpers/merge_functions.rs:13-30`).
  *
  * A [[TypedImperativeAggregate]] so Spark runs it as partial + final hash
  * aggregation: the map-side combine stands in for milli's per-chunk local
  * sorters, and the shuffle's reduce stands in for the k-way grenad merge —
  * hot terms (stop-word-scale df) therefore never funnel through a single
  * unaggregated stream.
  */
@ExpressionDescription(usage = "bitmap_or_agg(docid) - roaring bitmap of all docids")
case class BitmapOrAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buffer: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) v match {
      case i: Int  => buffer.add(i)
      case l: Long => buffer.add(l.toInt)
      case other   => buffer.add(other.toString.toInt)
    }
    buffer
  }

  override def merge(buffer: RoaringBitmap, input: RoaringBitmap): RoaringBitmap = {
    buffer.or(input)
    buffer
  }

  override def eval(buffer: RoaringBitmap): Any = Bitmaps.cboSerialize(buffer)

  override def serialize(buffer: RoaringBitmap): Array[Byte] = Bitmaps.cboSerialize(buffer)

  override def deserialize(bytes: Array[Byte]): RoaringBitmap = Bitmaps.cboDeserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapOrAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bitmap_or_agg"
}

/** `bitmap_union_agg(binary)` — OR together already-serialized bitmaps
  * (merging per-partition posting shards / incremental index deltas). */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buffer: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.or(Bitmaps.cboDeserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: RoaringBitmap, input: RoaringBitmap): RoaringBitmap = {
    buffer.or(input); buffer
  }

  override def eval(buffer: RoaringBitmap): Any = Bitmaps.cboSerialize(buffer)
  override def serialize(buffer: RoaringBitmap): Array[Byte] = Bitmaps.cboSerialize(buffer)
  override def deserialize(bytes: Array[Byte]): RoaringBitmap = Bitmaps.cboDeserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapUnionAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_union_agg"
}

object BitmapAgg {
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

  def bitmapOrAgg(c: Column): Column =
    ExpressionUtils.column(
      BitmapOrAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  def bitmapUnionAgg(c: Column): Column =
    ExpressionUtils.column(
      BitmapUnionAgg(ExpressionUtils.expression(c)).toAggregateExpression())
}
