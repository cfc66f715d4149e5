package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{Shims => ExpressionUtils}
import org.apache.spark.sql.types._

import graft.core.Bitmaps

/** Scalar Catalyst expressions over Cbo-serialized roaring bitmaps —
  * the set algebra the reference runs on posting lists
  * (`/root/reference/milli/src/search/criteria/mod.rs:458-505`).
  */
case class BitmapCardinality(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Bitmaps.cboDeserialize(v.asInstanceOf[Array[Byte]]).getLongCardinality
  override protected def withNewChildInternal(c: Expression): BitmapCardinality = copy(c)
  override def prettyName: String = "bitmap_cardinality"
}

case class BitmapToArray(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Bitmaps.cboDeserialize(v.asInstanceOf[Array[Byte]]).toArray)
  override protected def withNewChildInternal(c: Expression): BitmapToArray = copy(c)
  override def prettyName: String = "bitmap_to_array"
}

case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  /** A literal/foldable bitmap (the common case: a broadcast filter or
    * tombstone set tested against every row) is deserialized ONCE per task,
    * not once per row. */
  @transient private lazy val foldedLeft: Option[org.roaringbitmap.RoaringBitmap] =
    if (left.foldable)
      Option(left.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
        .map(b => Bitmaps.cboDeserialize(b.asInstanceOf[Array[Byte]]))
    else None
  override def nullSafeEval(bytes: Any, id: Any): Any = {
    val docid = id match { case i: Int => i; case l: Long => l.toInt }
    foldedLeft.getOrElse(Bitmaps.cboDeserialize(bytes.asInstanceOf[Array[Byte]]))
      .contains(docid)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapContains =
    copy(l, r)
  override def prettyName: String = "bitmap_contains"
}

case class BitmapAnd(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmaps.cboSerialize(Bitmaps.and(
      Bitmaps.cboDeserialize(a.asInstanceOf[Array[Byte]]),
      Bitmaps.cboDeserialize(b.asInstanceOf[Array[Byte]])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAnd =
    copy(l, r)
  override def prettyName: String = "bitmap_and"
}

case class BitmapOr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmaps.cboSerialize(Bitmaps.or(
      Bitmaps.cboDeserialize(a.asInstanceOf[Array[Byte]]),
      Bitmaps.cboDeserialize(b.asInstanceOf[Array[Byte]])))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOr =
    copy(l, r)
  override def prettyName: String = "bitmap_or"
}

case class BitmapAndNot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  /** literal subtrahend (e.g. a tombstone set applied to every row) is
    * deserialized once per task */
  @transient private lazy val foldedRight: Option[org.roaringbitmap.RoaringBitmap] =
    if (right.foldable)
      Option(right.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
        .map(b => Bitmaps.cboDeserialize(b.asInstanceOf[Array[Byte]]))
    else None
  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmaps.cboSerialize(Bitmaps.andNot(
      Bitmaps.cboDeserialize(a.asInstanceOf[Array[Byte]]),
      foldedRight.getOrElse(Bitmaps.cboDeserialize(b.asInstanceOf[Array[Byte]]))))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNot =
    copy(l, r)
  override def prettyName: String = "bitmap_and_not"
}

/** Haversine distance in meters — `/root/reference/milli/src/lib.rs:198-205`. */
case class Haversine(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 4, "haversine(lat1, lng1, lat2, lng2)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(lat1, lng1, lat2, lng2) = vs.map {
        case d: Double => d
        case f: Float  => f.toDouble
        case other     => other.toString.toDouble
      }
      GeoMath.haversine(lat1, lng1, lat2, lng2)
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Haversine = copy(newChildren)
  override def prettyName: String = "haversine"
}

/** Morton geo-cell encoder: (lat, lng) → 52-bit Z-order cell id (the
  * `geo_cells` sort key — see `graft.core.GeoCell`). */
case class GeoCellEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(lat: Any, lng: Any): Any =
    graft.core.GeoCell.encode(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoCellEncode =
    copy(l, r)
  override def prettyName: String = "geo_cell"
}

object GeoMath extends Serializable {
  /** Distance between two (lat, lng) points in meters (reference formula). */
  def haversine(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val r = 6371000.0 // radius of the earth in meters
    val dLat = math.toRadians(lat2 - lat1)
    val dLng = math.toRadians(lng2 - lng1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLng / 2), 2)
    2.0 * r * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }
}

/** Column wrappers + SQL registration for all graft expressions. */
object GraftFunctions {
  import ExpressionUtils.{column => col, expression => ex}

  def bitmap_cardinality(c: Column): Column = col(BitmapCardinality(ex(c)))
  def bitmap_to_array(c: Column): Column = col(BitmapToArray(ex(c)))
  def bitmap_contains(b: Column, id: Column): Column = col(BitmapContains(ex(b), ex(id)))
  def bitmap_and(a: Column, b: Column): Column = col(BitmapAnd(ex(a), ex(b)))
  def bitmap_or(a: Column, b: Column): Column = col(BitmapOr(ex(a), ex(b)))
  def bitmap_and_not(a: Column, b: Column): Column = col(BitmapAndNot(ex(a), ex(b)))
  def bitmap_or_agg(c: Column): Column = BitmapAgg.bitmapOrAgg(c)
  def bitmap_union_agg(c: Column): Column = BitmapAgg.bitmapUnionAgg(c)
  def haversine(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column =
    col(Haversine(Seq(ex(lat1), ex(lng1), ex(lat2), ex(lng2))))
  def geo_cell(lat: Column, lng: Column): Column = col(GeoCellEncode(ex(lat), ex(lng)))

  /** Register SQL names so `spark.sql("... bitmap_or_agg(x) ...")` works. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bitmap_or_agg",
      es => BitmapOrAgg(es.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("bitmap_union_agg",
      es => BitmapUnionAgg(es.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("bitmap_cardinality",
      es => BitmapCardinality(es.head), "built-in")
    reg.createOrReplaceTempFunction("bitmap_to_array",
      es => BitmapToArray(es.head), "built-in")
    reg.createOrReplaceTempFunction("bitmap_contains",
      es => BitmapContains(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("bitmap_and",
      es => BitmapAnd(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("bitmap_or",
      es => BitmapOr(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("bitmap_and_not",
      es => BitmapAndNot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("haversine",
      es => Haversine(es), "built-in")
    reg.createOrReplaceTempFunction("geo_cell",
      es => GeoCellEncode(es.head, es(1)), "built-in")
  }
}
