package graft.search

import org.apache.spark.sql.functions._

/** Driver-side LRU cache of decoded posting lists, keyed by word — the
  * serving-tier twin of milli's LMDB point reads (one `word_docids` /
  * posting fetch hits the OS page cache in-process,
  * `/root/reference/milli/src/search/mod.rs:136-242`). A long-lived Spark
  * serving wrapper pays ONE pruned parquet fetch per cold word and then
  * answers warm queries without launching any job.
  *
  * Scale story: the cache is byte-budgeted (default 256 MiB) and
  * fetch-through — at 10^12 docs it simply holds the hot head of the
  * dictionary (Zipf makes that most of the traffic) and evicts the tail;
  * correctness never depends on it (a miss is a pruned distributed scan).
  */
final class PostingCache(index: GraftIndex, maxBytes: Long = 256L << 20) {
  import index.spark
  import spark.implicits._

  /** word → postings sorted by docid: (docid, tf). */
  private val lru = new java.util.LinkedHashMap[String, Array[Long]](256, 0.75f, true)
  private var bytes = 0L

  @inline private def entryBytes(a: Array[Long]): Long = 64L + 8L * a.length

  private def evict(): Unit = {
    val it = lru.entrySet().iterator()
    while (bytes > maxBytes && it.hasNext) {
      val e = it.next()
      bytes -= entryBytes(e.getValue)
      it.remove()
    }
  }

  /** Fetch-through: postings of every word, as (docid, tf) pairs packed in a
    * long (docid high, tf low) so the hot array is primitive. Misses are
    * fetched in ONE pruned posting-block scan; absent words cache empty. */
  def get(words: Seq[String]): Map[String, Array[Long]] = synchronized {
    val missing = words.distinct.filterNot(lru.containsKey)
    if (missing.nonEmpty) {
      val rows = index.postingBlocks
        .where(col("word").isin(missing: _*))
        .select(col("word"), col("block_id"), col("bytes"))
        .as[(String, Int, Array[Byte])].collect()
      val byWord = rows.groupBy(_._1)
      missing.foreach { w =>
        val ps: Array[Long] = byWord.get(w) match {
          case None => Array.empty[Long]
          case Some(blocks) =>
            blocks.sortBy(_._2).iterator.flatMap { case (_, _, bs) =>
              graft.core.PostingBlocks.decode(bs).iterator
            }.map { case (docid, tf) => (docid.toLong << 32) | (tf & 0xffffffffL) }.toArray
        }
        lru.put(w, ps)
        bytes += entryBytes(ps)
      }
    }
    // snapshot BEFORE evicting so an over-budget batch can't evict its own
    // entries out from under the caller
    val out = words.distinct.map(w => w -> lru.get(w)).toMap
    evict()
    out
  }

  @inline def docidOf(packed: Long): Int = (packed >>> 32).toInt
  @inline def tfOf(packed: Long): Int = packed.toInt
}

/** Driver-side LRU cache of candidate bitmaps keyed by `<ns>:<key>` —
  * `word_docids` / `exact_word_docids` / `word_prefix_docids` /
  * `exact_word_prefix_docids` point reads (ns `w`/`e`/`p`/`q`) plus
  * dictionary-miss prefix range unions (ns `r`). PRESENCE-AWARE: a key
  * absent from its table caches as Absent so `resolveTreeBitmap` can still
  * distinguish "prefix not in the prefix dict" (→ range-union fallback)
  * from "not fetched yet". Warm no-rank/count queries and the bitmap-
  * bucketed rank pass run zero Spark jobs (the reference's equivalent reads
  * hit LMDB in-process, `milli/src/search/mod.rs:136-242`). */
final class BitmapCache(maxBytes: Long = 128L << 20) {
  import org.roaringbitmap.RoaringBitmap

  private object Absent
  private val lru = new java.util.LinkedHashMap[String, AnyRef](256, 0.75f, true)
  private var bytes = 0L

  @inline private def entryBytes(v: AnyRef): Long = v match {
    case bm: RoaringBitmap => 64L + bm.getSizeInBytes
    case _                 => 64L
  }

  private def evict(): Unit = {
    val it = lru.entrySet().iterator()
    while (bytes > maxBytes && it.hasNext) {
      val e = it.next()
      bytes -= entryBytes(e.getValue)
      it.remove()
    }
  }

  /** Fetch-through lookup: `fetch` is called ONCE with the uncached keys and
    * returns bitmaps for those present in the table; the rest cache as
    * Absent. Result maps every requested key to Some(bitmap) | None(absent).
    * Returned bitmaps are SHARED — callers must not mutate them. */
  def get(ns: String, keys: Seq[String])(
      fetch: Seq[String] => Map[String, RoaringBitmap]): Map[String, Option[RoaringBitmap]] =
    synchronized {
      val distinct = keys.distinct
      val missing = distinct.filterNot(k => lru.containsKey(ns + ":" + k))
      if (missing.nonEmpty) {
        val fetched = fetch(missing)
        missing.foreach { k =>
          val v: AnyRef = fetched.get(k) match {
            case Some(bm) => bm
            case None     => Absent
          }
          lru.put(ns + ":" + k, v)
          bytes += entryBytes(v)
        }
      }
      // snapshot before evicting (same rationale as PostingCache.get)
      val out = distinct.map { k =>
        k -> (lru.get(ns + ":" + k) match {
          case bm: RoaringBitmap => Some(bm)
          case _                 => None
        })
      }.toMap
      evict()
      out
    }
}

/** Driver-side LRU cache of forward-index rows (docid, word, positions) for
  * the small-query rank path, keyed by exact word (`w:foo`) or prefix range
  * (`p:fo`) — the serving twin of the pruned `doc_word_positions` scans.
  * Byte-budgeted like [[PostingCache]]; misses cost one pruned scan for the
  * whole miss batch. */
final class DwpCache(index: GraftIndex, maxBytes: Long = 256L << 20) {
  import index.spark
  import spark.implicits._

  private val lru =
    new java.util.LinkedHashMap[String, Array[(Int, String, Array[Int])]](64, 0.75f, true)
  private var bytes = 0L

  private def entryBytes(a: Array[(Int, String, Array[Int])]): Long =
    64L + a.iterator.map(r => 48L + 2L * r._2.length + 4L * r._3.length).sum

  private def evict(): Unit = {
    val it = lru.entrySet().iterator()
    while (bytes > maxBytes && it.hasNext) {
      val e = it.next()
      bytes -= entryBytes(e.getValue)
      it.remove()
    }
  }

  /** Rows for every exact word and every prefix, fetched through one pruned
    * scan per miss batch. Values are docid-sorted (binary-searchable). */
  def get(words: Seq[String], prefixes: Seq[String])
      : (Map[String, Array[(Int, String, Array[Int])]],
         Map[String, Array[(Int, String, Array[Int])]]) = synchronized {
    val missW = words.distinct.filterNot(w => lru.containsKey("w:" + w))
    val missP = prefixes.distinct.filterNot(p => lru.containsKey("p:" + p))
    if (missW.nonEmpty || missP.nonEmpty) {
      val in = if (missW.nonEmpty) Seq(col("word").isin(missW: _*)) else Nil
      val pref = missP.map(p => col("word").startsWith(p))
      val predicate = (in ++ pref).reduce(_ || _)
      val rows = index.docWordPositions.where(predicate)
        .select(col("docid"), col("word"), col("positions"))
        .as[(Int, String, Array[Int])].collect()
      // entries are docid-SORTED (collect() order is per-partition only):
      // the rank path binary-searches each array by docid
      missW.foreach { w =>
        val a = rows.filter(_._2 == w).sortBy(_._1)
        lru.put("w:" + w, a); bytes += entryBytes(a)
      }
      missP.foreach { p =>
        val a = rows.filter(_._2.startsWith(p)).sortBy(_._1)
        lru.put("p:" + p, a); bytes += entryBytes(a)
      }
    }
    // snapshot before evicting (same rationale as PostingCache.get)
    val out = (words.distinct.map(w => w -> lru.get("w:" + w)).toMap,
      prefixes.distinct.map(p => p -> lru.get("p:" + p)).toMap)
    evict()
    out
  }
}
