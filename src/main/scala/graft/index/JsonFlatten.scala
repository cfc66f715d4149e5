package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-document flattening for ingestion — port of
  * `/root/reference/flatten-serde-json/src/lib.rs:5-69`:
  * objects become dotted keys, arrays flatten element-wise (arrays of
  * objects contribute their fields under `parent.field`), scalar
  * collisions merge into arrays, and every intermediate key that lost all
  * its direct values materializes as an empty array.
  *
  * Two forms:
  *  - [[flatten]]: the dynamic (JSON-valued) port, used for schemaless
  *    document maps and as the oracle for the reference's own test suite;
  *  - [[flattenColumns]]: the Spark-first typed twin — one `select` that
  *    rewrites nested struct/array columns into dotted top-level columns
  *    (Catalyst extracts fields; nothing is shuffled or re-parsed).
  */
object JsonFlatten {

  /** JSON model: null | Boolean | Number | String | Seq[Any] (array) |
    * collection.Map[String, Any] (object). */
  def flatten(json: collection.Map[String, Any]): mutable.LinkedHashMap[String, Any] = {
    val obj = mutable.LinkedHashMap.empty[String, Any]
    val allKeys = mutable.ArrayBuffer.empty[String]
    insertObject(obj, None, json, allKeys)
    // keys whose values all moved deeper leave an empty array behind
    allKeys.foreach(k => if (!obj.contains(k)) obj(k) = Vector.empty[Any])
    obj
  }

  private def insertObject(
      base: mutable.LinkedHashMap[String, Any],
      baseKey: Option[String],
      obj: collection.Map[String, Any],
      allKeys: mutable.ArrayBuffer[String]): Unit =
    obj.foreach { case (key, value) =>
      val newKey = baseKey.map(b => s"$b.$key").getOrElse(key)
      allKeys += newKey
      value match {
        case arr: Seq[_]  => insertArray(base, newKey, arr, allKeys)
        case o: collection.Map[_, _] =>
          insertObject(base, Some(newKey),
            o.asInstanceOf[collection.Map[String, Any]], allKeys)
        case v => insertValue(base, newKey, v)
      }
    }

  private def insertArray(
      base: mutable.LinkedHashMap[String, Any],
      baseKey: String,
      array: Seq[Any],
      allKeys: mutable.ArrayBuffer[String]): Unit =
    array.foreach {
      case o: collection.Map[_, _] =>
        insertObject(base, Some(baseKey),
          o.asInstanceOf[collection.Map[String, Any]], allKeys)
      case sub: Seq[_] => insertArray(base, baseKey, sub, allKeys)
      case v           => insertValue(base, baseKey, v)
    }

  private def insertValue(
      base: mutable.LinkedHashMap[String, Any],
      key: String,
      toInsert: Any): Unit =
    base.get(key) match {
      case Some(existing: Vector[_]) => base(key) = existing :+ toInsert
      case Some(existing)            => base(key) = Vector(existing, toInsert)
      case None                      => base(key) = toInsert
    }

  // ------------------------------------------------------ DataFrame twin

  /** Rewrite nested struct / array-of-struct columns into dotted
    * top-level columns (`user.address.city`), arrays flattening
    * element-wise like the reference. Pure projection — Catalyst field
    * extraction, no UDF, no shuffle. Idempotent on flat schemas. */
  def flattenColumns(df: DataFrame): DataFrame = {
    def expand(name: String, c: Column, dt: DataType): Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          expand(s"$name.${f.name}", c.getField(f.name), f.dataType))
      case ArrayType(st: StructType, _) =>
        st.fields.toSeq.flatMap { f =>
          val extracted = filter(transform(c, x => x.getField(f.name)), _.isNotNull)
          expand(s"$name.${f.name}", extracted, ArrayType(f.dataType))
        }
      case ArrayType(ArrayType(inner, n2), _) =>
        expand(name, org.apache.spark.sql.functions.flatten(c), ArrayType(inner, n2))
      case _ => Seq(name -> c)
    }
    val cols = df.schema.fields.toSeq.flatMap(f => expand(f.name, col(f.name), f.dataType))
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
