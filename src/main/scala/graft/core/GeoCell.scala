package graft.core

import scala.collection.mutable.ArrayBuffer

/** Z-order (Morton) geo cells — the Spark re-expression of the pruning
  * role of the reference's geo R-tree (`milli/src/search/facet/filter.rs`
  * `_geoRadius` evaluation :349-387 and the Geo criterion's `rtree`,
  * `milli/src/search/criteria/geo.rs:67-154`).
  *
  * Instead of a driver-side spatial tree, each document's point is encoded
  * as one 52-bit Morton cell (26 bits per dimension, bit-interleaved) and
  * stored in a `geo_cells` parquet table sorted by cell. A radius query
  * covers its bounding box with O(cells) contiguous Morton ranges, which
  * push down to parquet footer min/max pruning — the scan reads only the
  * row groups intersecting the circle, not a whole latitude band, exactly
  * the IO contract of an R-tree descent. The exact haversine check on the
  * surviving candidates keeps results identical to the brute-force path
  * (the cover is a superset by construction).
  *
  * 26 bits per dimension = lat cells of ~2.7e-6 deg (~0.3 m) — finer than
  * any practical radius, so the cover's resolution never limits pruning.
  */
object GeoCell extends Serializable {

  val BitsPerDim = 26
  val MaxIdx: Long = (1L << BitsPerDim) - 1

  /** lat ∈ [-90, 90] → cell row index (clamped). */
  def latIdx(lat: Double): Long =
    clamp(math.floor((lat + 90.0) / 180.0 * (MaxIdx + 1).toDouble).toLong)

  /** lng ∈ [-180, 180] → cell column index (clamped). */
  def lngIdx(lng: Double): Long =
    clamp(math.floor((lng + 180.0) / 360.0 * (MaxIdx + 1).toDouble).toLong)

  private def clamp(v: Long): Long = math.min(math.max(v, 0L), MaxIdx)

  /** Spread the low 26 bits of `v` to even bit positions (Morton dilate). */
  private def spread(v: Long): Long = {
    var x = v & 0x3ffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: gather even bit positions into the low bits. */
  private def gather(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  /** Interleave (latIdx even bits, lngIdx odd bits) → 52-bit Morton code. */
  def interleave(latI: Long, lngI: Long): Long =
    spread(latI) | (spread(lngI) << 1)

  /** Point → Morton cell. */
  def encode(lat: Double, lng: Double): Long = interleave(latIdx(lat), lngIdx(lng))

  /** Cell → (lat, lng) of the cell's lower-left corner (for diagnostics /
    * tests; query evaluation never decodes — it keeps the exact per-doc
    * coordinates next to the cell column). */
  def decode(cell: Long): (Double, Double) = {
    val latI = gather(cell)
    val lngI = gather(cell >> 1)
    (latI.toDouble / (MaxIdx + 1).toDouble * 180.0 - 90.0,
      lngI.toDouble / (MaxIdx + 1).toDouble * 360.0 - 180.0)
  }

  /** Cover the index-space box [latIdxLo..latIdxHi] × [lngIdxLo..lngIdxHi]
    * with at most `maxRanges` contiguous Morton ranges (inclusive bounds).
    * The cover is a SUPERSET of the box: when the budget runs out, partial
    * quadtree nodes are emitted whole — callers re-verify candidates with
    * the exact haversine, so a coarse cover costs IO, never correctness. */
  def coverIdx(latLo: Long, latHi: Long, lngLo: Long, lngHi: Long,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(latLo <= latHi && lngLo <= lngHi, "empty cover box")
    // frontier of PARTIALLY-overlapping nodes at the current level;
    // fully-inside nodes emit immediately
    val out = ArrayBuffer.empty[(Long, Long)]
    var frontier = List((0L, 0L)) // (latPrefix, lngPrefix) at level `level`
    var level = 0
    def nodeRange(level: Int, latP: Long, lngP: Long): (Long, Long) = {
      val shift = 2 * (BitsPerDim - level)
      val prefix = interleave(latP, lngP) // low 2·level bits meaningful
      (prefix << shift, ((prefix + 1L) << shift) - 1L)
    }
    while (frontier.nonEmpty && level < BitsPerDim &&
        out.length + frontier.length * 4 <= maxRanges) {
      val next = List.newBuilder[(Long, Long)]
      for ((latP, lngP) <- frontier; dLat <- 0 to 1; dLng <- 0 to 1) {
        val clat = (latP << 1) | dLat
        val clng = (lngP << 1) | dLng
        val s = BitsPerDim - (level + 1)
        val nLatLo = clat << s; val nLatHi = ((clat + 1L) << s) - 1L
        val nLngLo = clng << s; val nLngHi = ((clng + 1L) << s) - 1L
        val disjoint = nLatHi < latLo || nLatLo > latHi || nLngHi < lngLo || nLngLo > lngHi
        if (!disjoint) {
          val inside = nLatLo >= latLo && nLatHi <= latHi && nLngLo >= lngLo && nLngHi <= lngHi
          if (inside) out += nodeRange(level + 1, clat, clng)
          else next += ((clat, clng))
        }
      }
      frontier = next.result()
      level += 1
    }
    // budget (or max depth) reached: emit remaining partial nodes whole
    frontier.foreach { case (latP, lngP) => out += nodeRange(level, latP, lngP) }
    // merge adjacent/overlapping ranges in Morton order
    val sorted = out.sortBy(_._1)
    val merged = ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    merged.toSeq
  }

  /** Cover a degree-space bounding box (lat band × lng band). */
  def cover(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double,
      maxRanges: Int = 64): Seq[(Long, Long)] =
    coverIdx(latIdx(latLo), latIdx(latHi), lngIdx(lngLo), lngIdx(lngHi), maxRanges)
}
