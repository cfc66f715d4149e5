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
      maxValuesPerFacet: Int = 100,
      /** false forces the distributed aggregation (parity tests). */
      allowLocal: Boolean = true): Map[String, Seq[(String, Long)]] =
    // in-flight marker: deferred background fills must not land mid-query
    index.markQuery(
      executeImpl(facets, candidates, maxValuesPerFacet, allowLocal))

  private def executeImpl(
      facets: Seq[String],
      candidates: Option[RoaringBitmap],
      maxValuesPerFacet: Int,
      allowLocal: Boolean): Map[String, Seq[(String, Long)]] = {
    if (facets.isEmpty) return Map.empty
    // serving path: every requested field's rows pinned driver-side →
    // iterate in-process (zero jobs warm) — the reference's small-candidate
    // forward-index algorithm (facet_distribution.rs:75-147)
    if (allowLocal) {
      val pinned = facets.map(f => f -> index.facetRowsLocal(f))
      if (pinned.forall(_._2.isDefined))
        return pinned.map { case (f, rowsOpt) =>
          val rows = rowsOpt.get // norm-sorted
          val out = Seq.newBuilder[(String, Long)]
          var taken = 0
          var i = 0
          while (i < rows.length && taken < maxValuesPerFacet) {
            val norm = rows(i)._2
            // one norm group: count distinct candidate docids, keep the
            // first orig (deterministic: (norm, docid) row order)
            val seen = new java.util.HashSet[Integer]()
            var orig: String = null
            var count = 0L
            while (i < rows.length && rows(i)._2 == norm) {
              val d = rows(i)._1
              if (candidates.forall(_.contains(d)) && seen.add(d)) {
                if (orig == null) orig = rows(i)._3
                count += 1
              }
              i += 1
            }
            if (count > 0) { out += ((orig, count)); taken += 1 }
          }
          f -> out.result()
        }.toMap
    }
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
