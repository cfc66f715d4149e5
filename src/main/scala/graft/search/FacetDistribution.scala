package graft.search

import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap

import graft.core.Bitmaps

/** Per-field facet value → count over an optional candidate set —
  * `/root/reference/milli/src/search/facet/facet_distribution.rs:27-314`.
  *
  * The reference switches between three algorithms by candidate count
  * (forward index < 3000 / level-tree iterator / whole level 0); in Spark a
  * single hash aggregate with AQE covers all three regimes. String keys
  * return the original (un-normalized) form via `first(orig)` like the
  * reference's forward-table lookup; values capped at `maxValuesPerFacet`
  * (default 100, facet_distribution.rs:21) in normalized order.
  */
class FacetDistribution(index: GraftIndex) {
  import index.spark
  import spark.implicits._

  def execute(
      facets: Seq[String],
      candidates: Option[RoaringBitmap] = None,
      maxValuesPerFacet: Int = 100): Map[String, Seq[(String, Long)]] = {
    if (facets.isEmpty) return Map.empty
    val base = index.facetStrings.where($"field".isin(facets: _*))
    val filtered = candidates match {
      case None => base
      case Some(bm) =>
        // foldable-literal bitmap_contains: deserialized once per task
        base.where(graft.functions.GraftFunctions.bitmap_contains(
          lit(Bitmaps.cboSerialize(bm)), $"docid"))
    }
    // `maxValuesPerFacet` is enforced INSIDE the plan: the rank-limit filter
    // triggers Spark's WindowGroupLimit (a partial per-field top-N runs
    // map-side before the shuffle), so a 10^8-distinct-value facet ships at
    // most fields × max rows to the driver — never the full value list.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"field").orderBy($"norm")
    val rows = filtered
      .groupBy($"field", $"norm")
      .agg(countDistinct($"docid").as("count"), first($"orig").as("orig"))
      .withColumn("rn__", row_number().over(w))
      .where($"rn__" <= maxValuesPerFacet)
      .orderBy($"field", $"norm")
      .select($"field", $"norm", $"count", $"orig")
      .as[(String, String, Long, String)]
      .collect()
    val grouped = rows.groupBy(_._1).map { case (f, vs) =>
      f -> vs.sortBy(_._2).map(v => (v._4, v._3)).toSeq
    }
    facets.map(f => f -> grouped.getOrElse(f, Seq.empty)).toMap
  }
}
