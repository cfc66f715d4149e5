package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-batch enrichment: primary-key discovery + validation and _geo
  * field validation, the Spark re-expression of `enrich_documents_batch`
  * (`/root/reference/milli/src/update/index_documents/enrich.rs:28-145`,
  * validators at :328-400). All checks run as ONE distributed aggregation
  * over the batch; the first offending value and the offence count come
  * back for the error message (milli fails on the first bad document —
  * a distributed pass reports them all at once).
  */
object Enrich {

  final case class GeoColumns(lat: String, lng: String)

  /** Primary-key discovery (`enrich.rs:74-92`): an explicitly-set key wins —
    * and, like the reference's MissingDocumentId, its ABSENCE from the batch
    * is an error (a typo'd key must not silently re-key the corpus on a
    * discovered column); with no configured key, exactly one column whose
    * name contains "id" (case-insensitive) must exist. */
  def resolvePrimaryKey(docs: DataFrame, configured: Option[String]): String =
    configured match {
      case Some(pk) =>
        if (docs.columns.contains(pk)) pk
        else throw new IllegalArgumentException(
          s"missing document id: configured primary key column '$pk' is " +
            "absent from the batch (enrich.rs MissingDocumentId)")
      case None =>
        val candidates = docs.columns.filter(_.toLowerCase.contains("id"))
        candidates match {
          case Array(one) => one
          case Array() => throw new IllegalArgumentException(
            "no primary key candidate found: no column name contains 'id' " +
              "(set one explicitly)")
          case many => throw new IllegalArgumentException(
            s"multiple primary key candidates found: ${many.mkString(", ")} " +
              "(set one explicitly)")
        }
    }

  private def q(name: String): Column = col(s"`${name.replace("`", "")}`")

  /** `validate_document_id`: non-empty [a-zA-Z0-9_-]+ strings or integers
    * (integers and negative integers stringify into that charset; floats
    * don't — matching milli's is_i64-only rule). */
  private def validIdCol(c: Column): Column =
    c.isNotNull && c.cast("string").rlike("^[a-zA-Z0-9_-]+$")

  /** Validate the batch; throws with counts on bad ids / duplicate ids /
    * malformed geo. Returns the resolved primary key name. */
  def validate(docs: DataFrame, configured: Option[String],
      geo: Option[GeoColumns] = None): String = {
    val pk = resolvePrimaryKey(docs, configured)
    val withPk = docs.withColumn("__pk__", q(pk))
    val geoCols = geo.orElse {
      val cols = docs.columns.toSet
      if (cols.contains("_geo.lat") && cols.contains("_geo.lng"))
        Some(GeoColumns("_geo.lat", "_geo.lng"))
      else None
    }

    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(when(col("__pk__").isNull, 1).otherwise(0)).as("missing_id"),
      sum(when(!validIdCol(col("__pk__")), 1).otherwise(0)).as("invalid_id"),
      countDistinct(col("__pk__")).as("distinct_id"),
      max(when(!validIdCol(col("__pk__")), col("__pk__").cast("string")))
        .as("example_bad_id")) ++
      geoCols.toSeq.flatMap { g =>
        val lat = q(g.lat); val lng = q(g.lng)
        // extract_finite_float_from_value: parseable + finite; lat and lng
        // must be present together (enrich.rs:373-400)
        def bad(c: Column) = c.isNotNull &&
          (c.try_cast("double").isNull || isnan(c.try_cast("double")))
        Seq(
          sum(when(lat.isNotNull =!= lng.isNotNull, 1).otherwise(0)).as("geo_half"),
          sum(when(bad(lat) || bad(lng), 1).otherwise(0)).as("geo_bad"))
      }

    val row = withPk.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("n")
    val missing = row.getAs[Long]("missing_id")
    val invalid = row.getAs[Long]("invalid_id")
    val distinct = row.getAs[Long]("distinct_id")
    if (missing > 0)
      throw new IllegalArgumentException(
        s"missing document id in column '$pk' for $missing of $n documents")
    if (invalid > 0)
      throw new IllegalArgumentException(
        s"invalid document id in column '$pk' for $invalid of $n documents " +
          s"(e.g. '${row.getAs[String]("example_bad_id")}'); ids must be " +
          "integers or strings of [a-zA-Z0-9_-]")
    if (distinct != n)
      throw new IllegalArgumentException(
        s"duplicate document ids in column '$pk': $n documents, " +
          s"$distinct distinct ids (milli keeps the last occurrence in file " +
          "order; an unordered distributed batch must deduplicate explicitly)")
    geoCols.foreach { g =>
      val half = row.getAs[Long]("geo_half")
      val bad = row.getAs[Long]("geo_bad")
      if (half > 0) throw new IllegalArgumentException(
        s"$half documents define only one of ${g.lat}/${g.lng} " +
          "(lat and lng must be present together)")
      if (bad > 0) throw new IllegalArgumentException(
        s"$bad documents carry a non-finite or non-numeric ${g.lat}/${g.lng}")
    }
    pk
  }
}
