package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap

import graft.core.Bitmaps
import QueryTree._

/** Ranking rule (criterion) list entries — `milli/src/criterion.rs`. */
sealed trait Criterion
object Criterion {
  case object Words extends Criterion
  case object Typo extends Criterion
  case object Proximity extends Criterion
  case object Attribute extends Criterion
  case object Sort extends Criterion
  case object Exactness extends Criterion
  final case class Asc(field: String) extends Criterion
  final case class Desc(field: String) extends Criterion

  def parse(s: String): Criterion = s.trim.toLowerCase match {
    case "words"     => Words
    case "typo"      => Typo
    case "proximity" => Proximity
    case "attribute" => Attribute
    case "sort"      => Sort
    case "exactness" => Exactness
    case other if other.startsWith("asc(")  => Asc(other.stripPrefix("asc(").stripSuffix(")"))
    case other if other.startsWith("desc(") => Desc(other.stripPrefix("desc(").stripSuffix(")"))
    case other => throw new IllegalArgumentException(s"unknown criterion: $other")
  }
}

/** sort-at-query-time entry (`AscDesc` in milli); `geoPoint` = sort by
  * haversine distance to a point (the Geo criterion, criteria/geo.rs). */
final case class SortSpec(field: String, ascending: Boolean,
    geoPoint: Option[(Double, Double)] = None)

final case class SearchRequest(
    query: Option[String] = None,
    filter: Option[String] = None,
    offset: Int = 0,
    limit: Int = 20,
    strategy: MatchingStrategy = MatchingStrategy.Last,
    authorizeTypos: Boolean = true,
    /** max primitive query parts (`Search::words_limit`, mod.rs:68) */
    wordsLimit: Int = 10,
    sortCriteria: Seq[SortSpec] = Nil,
    criteriaOverride: Option[Seq[Criterion]] = None,
    distinctOverride: Option[Option[String]] = None,
    /** compute the exact candidate count (`exhaustive_number_hits`);
      * false skips one counting job and reports -1 */
    exhaustive: Boolean = true)

final case class SearchResult(
    documentsIds: Seq[Int],
    candidates: Long)

/** `Search::execute` re-expressed Spark-first
  * (`/root/reference/milli/src/search/mod.rs:136-288`):
  *
  *   1. driver: tokenize query, build query tree (probing the index),
  *      resolve typo derivations against term_dict (one distributed scan);
  *   2. driver: evaluate the filter DSL to a candidate bitmap (pushdown
  *      reads on the facet tables);
  *   3. executors: one job over `doc_word_positions` restricted to the
  *      derived words (parquet IN-pushdown on the word-major table —
  *      footer pruning skips every non-query-word row group) computes the
  *      full per-candidate rank vector (words/typo/proximity/attribute/
  *      exactness) — the bucket cascade becomes a lexicographic sort key;
  *   4. `orderBy(rankVector, docid).limit(offset+limit)` →
  *      TakeOrderedAndProject, then distinct + pagination.
  *
  * The reference drains criteria lazily and stops at `limit`; ranking here
  * is computed for every candidate but each candidate is O(matched words)
  * and the final top-k never materializes more than offset+limit rows per
  * partition (TakeOrdered). At 10^12 docs the scan is pruned by the word
  * IN-filter; candidates without any query word never leave the scan.
  */
object Search {
  /** A resolved filter: Left = handle-cached docids bitmap (zero-job
    * application), Right = streaming one-column docid plan (web-scale
    * results), None = no filter. */
  type Filt = Option[Either[org.roaringbitmap.RoaringBitmap,
    org.apache.spark.sql.DataFrame]]

  /** default bound for the small-query driver path (raised round 4:
    * 2-word stop/common queries at 100k docs estimate ~180k posting rows
    * once the last-word prefix range counts in — 2^17 bounced them to the
    * distributed path; 2^18 ≈ 2 MB of packed postings, still driver-safe,
    * and the byte-budgeted caches evict under pressure anyway). */
  val DefaultMaxLocalPostings: Long = 1L << 18

  /** byte companion to the row gate: the local path also requires the
    * estimated driver materialization (48 B/row + 4 B/position, from the
    * pinned df/ttf sums) to fit this budget. A typical 2^18-row query is
    * ~14 MB and passes untouched; a position-heavy stop word whose rows
    * average hundreds of positions is priced by its BYTES, not its row
    * count — the cleaner long-term shape of the serve gate (round-4
    * notes). Overridable per process for bench experiments. */
  val MaxLocalBytes: Long =
    sys.env.get("SPARK_GRAFT_MAX_LOCAL_BYTES").map(_.toLong).getOrElse(64L << 20)

  /** Drain cap for the cell-path admission that BYPASSES the volume gate
    * (Words-led phrase-free queries): at most this many docs may rank
    * in-process before the query aborts to the distributed path. Sized to
    * what the parallel per-doc ranker clears in tens of ms (the 63.7k-doc
    * worst rung ranks in ~15 ms); the docid-restricted forward fetch
    * collects ≤ words × cap rows — bounded at any corpus size. */
  val MaxLocalDrain: Long =
    sys.env.get("SPARK_GRAFT_MAX_LOCAL_DRAIN").map(_.toLong).getOrElse(1L << 17)

  /** SPARK_GRAFT_TRACE=1 prints local-path stage timings to stderr. */
  private[search] val trace: Boolean =
    sys.env.get("SPARK_GRAFT_TRACE").contains("1")

  /** Shared CPU pool for the local rank drain (daemon threads; the pool is
    * bounded so concurrent serving clients share the cores fairly). */
  private lazy val rankPool: java.util.concurrent.ExecutorService = {
    val n = math.max(2, Runtime.getRuntime.availableProcessors() - 1)
    java.util.concurrent.Executors.newFixedThreadPool(n,
      (r: Runnable) => { val t = new Thread(r, "graft-rank"); t.setDaemon(true); t })
  }

  /** Parallel indexed map: small inputs run inline; large ones fan out in
    * contiguous slices over [[rankPool]] (each worker fills its own slice —
    * no shared mutable state beyond the result array). */
  private[search] def parMap[A: scala.reflect.ClassTag](n: Int)(f: Int => A): Array[A] = {
    val out = new Array[A](n)
    // inline threshold 256: a mid-size drain cell (a few hundred docs at
    // ~100 µs/doc of sweep+attribute work) gains 10× from the fan-out,
    // while the pool round-trip (~50 µs) still never dominates tiny cells
    if (n < 256) {
      var i = 0
      while (i < n) { out(i) = f(i); i += 1 }
    } else {
      val slices = math.max(2, Runtime.getRuntime.availableProcessors() - 1)
      val step = (n + slices - 1) / slices
      val futs = (0 until slices).map { s =>
        rankPool.submit(new Runnable {
          override def run(): Unit = {
            var i = s * step
            val end = math.min(n, i + step)
            while (i < end) { out(i) = f(i); i += 1 }
          }
        })
      }
      futs.foreach(_.get())
    }
    out
  }
  @inline private[search] def traced[A](label: => String)(f: => A): A =
    if (!trace) f
    else {
      val t0 = System.nanoTime()
      val a = f
      System.err.println(f"[graft-trace] $label ${(System.nanoTime() - t0) / 1e6}%.2f ms")
      a
    }

  /** Per-criterion doc comparators for the LOCAL sort path, built from the
    * driver-pinned facet/geo value maps. None when any referenced field
    * (or the geo table) can't pin — callers keep the distributed
    * facet-join path. Semantics mirror `criterionColumns` exactly:
    * numbers order before strings, absent values last (for asc AND desc —
    * Spark's `*_nulls_last`), strings compare in CODE POINT order (the
    * UTF8String binary order the distributed sort uses). */
  private[search] def localSortComparators(index: GraftIndex,
      criteria: Seq[Criterion], sorts: Seq[SortSpec])
      : Option[Map[Criterion, (Int, Int) => Int]] = {

    def fieldCmp(field: String, asc: Boolean): Option[(Int, Int) => Int] =
      index.sortValuesLocal(field).map { pins =>
        // keep-first facet-sort semantics: asc compares a doc's MIN value,
        // desc its MAX (matches the distributed per-direction aggregates)
        val nm = if (asc) pins.numMin else pins.numMax
        val sm = if (asc) pins.strMin else pins.strMax
        (a: Int, b: Int) => {
          val na = nm.get(a); val nb = nm.get(b)
          val c1 =
            if (na != null && nb != null) {
              val c = java.lang.Double.compare(na.doubleValue(), nb.doubleValue())
              if (asc) c else -c
            } else if (na != null) -1
            else if (nb != null) 1
            else 0
          if (c1 != 0) c1
          else {
            val sa = sm.get(a); val sb = sm.get(b)
            if (sa != null && sb != null) {
              val c = cmpCodePoints(sa, sb); if (asc) c else -c
            } else if (sa != null) -1
            else if (sb != null) 1
            else 0
          }
        }
      }

    def geoCmp(qlat: Double, qlng: Double, asc: Boolean): Option[(Int, Int) => Int] =
      index.geoLocal.map { gm =>
        // per-query memo: each doc's haversine computes once across the
        // whole top-k comparison pass (NaN = missing geo → last)
        val memo = new java.util.HashMap[Integer, java.lang.Double]()
        def dist(d: Int): Double = {
          val cached = memo.get(d)
          if (cached != null) cached.doubleValue()
          else {
            val g = gm.get(d)
            val v =
              if (g == null) Double.NaN
              else graft.functions.GeoMath.haversine(g._1, g._2, qlat, qlng)
            memo.put(d, v)
            v
          }
        }
        (a: Int, b: Int) => {
          val da = dist(a); val db = dist(b)
          val aMiss = java.lang.Double.isNaN(da)
          val bMiss = java.lang.Double.isNaN(db)
          if (!aMiss && !bMiss) {
            val c = java.lang.Double.compare(da, db); if (asc) c else -c
          } else if (!aMiss) -1
          else if (bMiss) 0
          else 1
        }
      }

    def compose(cs: Seq[(Int, Int) => Int]): (Int, Int) => Int = (a, b) => {
      var i = 0; var r = 0
      while (i < cs.length && r == 0) { r = cs(i)(a, b); i += 1 }
      r
    }

    val needed: Seq[(Criterion, Option[(Int, Int) => Int])] = criteria.collect {
      case c @ Criterion.Asc(f)  => c -> fieldCmp(f, asc = true)
      case c @ Criterion.Desc(f) => c -> fieldCmp(f, asc = false)
      case c @ Criterion.Sort if sorts.nonEmpty =>
        val entries = sorts.map { s =>
          s.geoPoint match {
            case Some((la, ln)) => geoCmp(la, ln, s.ascending)
            case None           => fieldCmp(s.field, s.ascending)
          }
        }
        c -> (if (entries.exists(_.isEmpty)) None
              else Some(compose(entries.map(_.get))))
    }
    if (needed.exists(_._2.isEmpty)) None
    else Some(needed.map { case (c, f) => c -> f.get }.toMap)
  }

  /** code-point string order = the UTF-8 binary order Spark sorts by
    * (Java compareTo's UTF-16 unit order diverges for supplementary
    * characters). */
  private def cmpCodePoints(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}

class Search(index: GraftIndex,
    /** queries whose scan provably touches ≤ this many posting rows rank
      * driver-side (small-query path); 0 forces the distributed path. */
    maxLocalPostings: Long = Search.DefaultMaxLocalPostings,
    /** cell-drain admission cap: Words-led phrase-free queries past the
      * volume gate still rank driver-side unless more than this many docs
      * must drain (then: distributed). */
    maxLocalDrain: Long = Search.MaxLocalDrain) extends Serializable {
  import index.spark
  import spark.implicits._

  private val settings = index.settings

  def execute(req: SearchRequest): SearchResult =
    // in-flight marker: background complete fills defer (bounded) while any
    // query runs — their 32-thread Spark scan otherwise competes with the
    // scheduling query's own driver-side ranking tail (PostingCache)
    index.markQuery(executeImpl(req))

  private def executeImpl(req: SearchRequest): SearchResult = {
    index.checkFresh() // stale-handle guard: caches pin the opened version
    val criteria: Seq[Criterion] =
      req.criteriaOverride.getOrElse(settings.criteria.map(Criterion.parse))
    val distinctField = req.distinctOverride.getOrElse(settings.distinctField)

    // `SortRankingRuleMissing` (search/mod.rs:177-204): sorting at query
    // time requires the `sort` ranking rule in the criteria list.
    if (req.sortCriteria.nonEmpty && !criteria.contains(Criterion.Sort))
      throw new IllegalArgumentException(
        "sort ranking rule missing: query-time sort requires the `sort` criterion")

    // ---- filter → distributed candidate plan (None = all); soft-deleted
    // docs are always subtracted (`excluded_candidates`, search/mod.rs:252).
    // The filter is a one-column docid DataFrame applied as a semi-join —
    // the driver never materializes the candidate set (the tombstone bitmap
    // IS driver-side, but it's bounded by deletes-since-last-compact).
    // bounded filter results cache as a handle-scoped BITMAP (milli's
    // in-process filter algebra): warm repeated filters run zero jobs on
    // the local paths and a foldable-literal predicate on the distributed
    // ones. Oversized results keep the streaming semi-join plan (Right).
    val filterDf: Search.Filt =
      req.filter.map { f =>
        index.filterBitmap(f) match {
          case Some(bm) => Left(bm)
          case None =>
            Right(FilterEvaluator.candidates(index, FilterParser.parse(f)))
        }
      }
    val deleted = Search.traced("deleted-bitmap")(index.deletedDocids)

    // emptiness test only — the query string itself must keep its trailing
    // whitespace: primitiveQuery marks the last word as a prefix only when
    // the query ends MID-WORD (reference query_tree.rs — "w96 " means the
    // word is finished, no prefix expansion), and a trim here would silently
    // re-prefix it
    req.query.filter(_.trim.nonEmpty) match {
      case None =>
        executeNoQuery(criteria, filterDf, deleted, distinctField, req)
      case Some(q) =>
        Search.traced("execute-query")(
          executeQuery(q, criteria, filterDf, deleted, distinctField, req))
    }
  }

  /** Apply the filter (bitmap predicate or semi-join) + tombstone predicate
    * to any docid-keyed plan. Bitmap operands are foldable literals —
    * deserialized once per task, not per row. */
  private def applyFilter(
      df: DataFrame,
      filterDf: Search.Filt,
      deleted: RoaringBitmap): DataFrame = {
    val semi = filterDf match {
      case None => df
      case Some(Left(bm)) =>
        df.where(graft.functions.GraftFunctions.bitmap_contains(
          lit(Bitmaps.cboSerialize(bm)), $"docid"))
      case Some(Right(fd)) => df.join(fd, Seq("docid"), "left_semi")
    }
    if (deleted.isEmpty) semi
    else semi.where(!graft.functions.GraftFunctions.bitmap_contains(
      lit(Bitmaps.cboSerialize(deleted)), $"docid"))
  }

  // ------------------------------------------------------------- no query

  private def executeNoQuery(
      criteria: Seq[Criterion],
      filterDf: Search.Filt,
      deleted: RoaringBitmap,
      distinctField: Option[String],
      req: SearchRequest): SearchResult = {
    val docids0 = applyFilter(index.documents.select($"docid"), filterDf, deleted)
    // exhaustive counting + top-k are two actions over the same filter
    // plan: persist so it runs once
    val persisted =
      if (req.exhaustive && filterDf.nonEmpty)
        Some(docids0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None
    val docids = persisted.getOrElse(docids0)
    try {
      val ranked = attachSortColumns(docids, criteria, req.sortCriteria)
      val sortCols = sortColumns(criteria, req.sortCriteria) :+ $"docid".asc
      val total =
        if (req.exhaustive) docids.count()
        else if (filterDf.isEmpty && deleted.isEmpty) index.numberOfDocuments
        else -1L
      finish(ranked, sortCols, distinctField, req, total)
    } finally persisted.foreach(_.unpersist(false))
  }

  // ---------------------------------------------------------------- query

  private def executeQuery(
      q: String,
      criteria: Seq[Criterion],
      filterDf: Search.Filt,
      deleted: RoaringBitmap,
      distinctField: Option[String],
      req: SearchRequest): SearchResult = {

    // 1. primitive query + tree (driver)
    val parts = Search.traced("primitive-query") {
      QueryTree.primitiveQuery(q, settings.stopWords, req.wordsLimit)
    }
    if (parts.isEmpty)
      return executeNoQuery(criteria, filterDf, deleted, distinctField, req)
    val queryWords = parts.collect { case PWord(w, _) => w }
    val ctx = Search.traced("prime-ctx") { index.primedQueryContext(queryWords) }
    val tree = Search.traced("tree-build") {
      QueryTree.build(ctx, req.strategy, req.authorizeTypos, parts).get
    }
    val branches = QueryTree.wordsBranches(tree)

    // 2. derivations for every key of every branch (one term_dict scan);
    // 0-typo prefix keys stay un-enumerated and become scan range
    // predicates below
    val allKeys = branches.flatMap(Ranker.derivationKeys).toSet
    val derivations = Search.traced("derivations") { index.derivations(allKeys) }
    val relevantWords: Seq[String] =
      (derivations.map.values.flatten.map(_._1) ++
        allKeys.collect { case (w, false, 0) => w }).toSeq.distinct
    val prefixWords: Seq[String] =
      allKeys.collect { case (w, true, _) => w }.toSeq
        // drop prefixes already covered by a shorter one
        .sortBy(_.length)
        .foldLeft(Vector.empty[String]) { (acc, p) =>
          if (acc.exists(p.startsWith)) acc else acc :+ p
        }

    val exactParts = Ranker.exactParts(parts, ctx.synonyms)
    val searchableFids = settings.searchableFields.indices

    // no-rank fast path (criteria empty, no sort): resolve the query tree
    // with bitmap algebra over word_docids / word_prefix_docids point
    // reads — ONE pre-unioned row per prefix instead of scanning every
    // extension's posting rows (milli criteria/mod.rs:590-637). Trees with
    // phrases need positions and fall through; maxLocalPostings == 0 pins
    // the distributed scan path (tests / forced-distributed callers).
    // Distinct stays on the fast path when its min-norm map pins AND the
    // filter is absent/bitmap-cached (docid order IS the rank order here,
    // so a keep-first walk is the window's row_number==1 exactly); the walk
    // is O(candidates) — bounded to ≤ 4M candidates.
    if (criteria.isEmpty && req.sortCriteria.isEmpty && maxLocalPostings > 0) {
      val distinctPin: Option[java.util.HashMap[Integer, String]] =
        distinctField.flatMap(f => index.sortValuesLocal(f).map(_.strMin))
      val distinctOk = distinctField.isEmpty ||
        (distinctPin.isDefined && !filterDf.exists(_.isRight))
      if (distinctOk) {
        index.resolveTreeBitmap(tree, derivations) match {
          case Some(cand)
              if distinctField.isEmpty || cand.getLongCardinality <= (1L << 22) =>
            cand.andNot(deleted)
            return finishBitmapCandidates(cand, filterDf, req,
              if (distinctField.isEmpty) None else distinctPin)
          case _ => ()
        }
      }
    }

    // driver-side small-query path: when the pinned dictionary proves the
    // scan touches few posting rows (and no sort-ish criterion / distinct
    // needs facet joins), collect those rows once and rank in-process —
    // the adaptive twin of milli's in-process execution. Web-scale
    // dictionaries return None here and always rank distributed.
    // sort-ish = facet joins needed: Asc/Desc always; the Sort criterion
    // only when the request actually carries query-time sort entries (a
    // criteria list containing `sort` with no sortCriteria is a no-op —
    // milli's default list includes it, and those queries must still be
    // eligible for the driver path)
    val sortish = criteria.exists {
      case Criterion.Asc(_) | Criterion.Desc(_) => true
      case Criterion.Sort => req.sortCriteria.nonEmpty
      case _ => false
    }
    val smallEnough = index.estimatePostings(relevantWords, prefixWords)
        .exists(_ <= maxLocalPostings) &&
      index.estimatePostingBytes(relevantWords, prefixWords)
        .exists(_ <= Search.MaxLocalBytes)
    // sort-ish criteria stay LOCAL when every referenced facet field (and
    // the geo point table) pins driver-side — milli's asc_desc/geo criteria
    // read their facet trees in-process too; None → the distributed
    // facet-join path below (web-scale fields, multi-valued numerics).
    // Probed only for queries the small gate already admits, so a
    // distributed-routed query never triggers the pinning collects.
    val localSortCmps: Option[Map[Criterion, (Int, Int) => Int]] =
      if (!sortish) Some(Map.empty)
      else if (!smallEnough || maxLocalPostings == 0) None
      else Search.localSortComparators(index, criteria, req.sortCriteria)
    // distinct stays local when the field's min-norm map pins (the
    // distributed dedup key is exactly groupBy-min(norm)); None → the
    // distributed window path
    val distinctLocal: Option[Option[java.util.HashMap[Integer, String]]] =
      distinctField match {
        case None => Some(None)
        case Some(f) if smallEnough && maxLocalPostings > 0 =>
          index.sortValuesLocal(f).map(p => Some(p.strMin))
        case _ => None
      }
    // Sort-only queries on an UNPINNABLE field (too many rows for the
    // driver maps — localSortCmps is None) walk the facet LEVEL TREE
    // instead of paying a distributed orderBy: milli's ascending/
    // descending_facet_sort (facet_sort_ascending.rs:32-110) — keep-first
    // value-group iteration over the candidates, O(offset+limit · levels)
    // level-0 band fetches regardless of field cardinality. Candidates
    // must resolve to a bitmap (phrase-free) and any filter must be a
    // cached bitmap; deeper criteria cascades keep the distributed path.
    if (Search.trace) System.err.println(
      s"[graft-trace] sort-led outer gate: cmpsEmpty=${localSortCmps.isEmpty} " +
      s"mlp=$maxLocalPostings distinct=$distinctField " +
      s"phraseFree=${branches.forall(b => !QueryTree.hasPhrase(b))} " +
      s"filtLeft=${filterDf.forall(_.isLeft)}")
    if (localSortCmps.isEmpty && maxLocalPostings > 0 && distinctField.isEmpty &&
        branches.forall(b => !QueryTree.hasPhrase(b)) && filterDf.forall(_.isLeft)) {
      // sort-LED criteria: a leading Sort/Asc/Desc followed by any cascade
      // of non-sort criteria (milli's criterion nesting: the sort yields
      // value buckets, the children order WITHIN each bucket). rest empty
      // = the plain sort-only page.
      val sortLed: Option[(String, Boolean, Seq[Criterion])] = criteria match {
        case Criterion.Sort +: rest => req.sortCriteria match {
          case Seq(s) if s.geoPoint.isEmpty => Some((s.field, s.ascending, rest))
          case _ => None
        }
        case Criterion.Asc(f) +: rest  => Some((f, true, rest))
        case Criterion.Desc(f) +: rest => Some((f, false, rest))
        case _ => None
      }
      if (Search.trace) System.err.println(
        s"[graft-trace] sort-led gate: criteria=$criteria sortLed=$sortLed")
      sortLed.filter(_._3.forall {
        case Criterion.Sort | Criterion.Asc(_) | Criterion.Desc(_) => false
        case _ => true // a second sort level would need comparators we lack
      }).foreach { case (f, asc, rest) =>
        if (Search.trace) System.err.println(
          s"[graft-trace] sort-led resolve: ${index.resolveTreeBitmap(tree, derivations).isDefined}")
        index.resolveTreeBitmap(tree, derivations).foreach { cand =>
          cand.andNot(deleted)
          filterDf.foreach {
            case Left(fbm) => cand.and(fbm)
            case Right(_)  => () // unreachable (gate above)
          }
          val take = req.offset + req.limit
          if (rest.isEmpty) {
            FacetLevels.sortedPage(index, f, asc, cand, take).foreach { ids =>
              return SearchResult(ids.drop(req.offset), cand.getLongCardinality)
            }
          } else {
            FacetLevels.sortedGroups(index, f, asc, cand, take).foreach { groups =>
              // groups fully before the page window only count; groups
              // overlapping it rank through the remaining cascade
              val out = Seq.newBuilder[Int]
              var before = 0L
              var got = 0
              val it = groups.iterator
              var failed = false
              while (!failed && got < req.limit && it.hasNext) {
                val g = it.next()
                val size = g.getLongCardinality
                if (before + size <= req.offset) before += size
                else {
                  val innerOff = math.max(0L, req.offset - before).toInt
                  val innerLim = req.limit - got
                  executeQueryLocal(branches.toVector, derivations,
                    exactParts, searchableFids, relevantWords, prefixWords,
                    Some(Left(g)), deleted, rest,
                    req.copy(offset = innerOff, limit = innerLim),
                    Map.empty, None, drainCap = maxLocalDrain) match {
                    case Some(r) =>
                      r.documentsIds.foreach { id => out += id; got += 1 }
                      before += size
                    case None => failed = true // cap hit → distributed path
                  }
                }
              }
              if (!failed)
                return SearchResult(out.result(), cand.getLongCardinality)
            }
          }
        }
      }
    }

    if (smallEnough && localSortCmps.isDefined && distinctLocal.isDefined)
      return executeQueryLocal(branches.toVector, derivations, exactParts,
        searchableFids, relevantWords, prefixWords, filterDf, deleted, criteria,
        req, localSortCmps.get, distinctLocal.get).get
    // Words-led phrase-free queries stay LOCAL even past the postings-volume
    // gate: their drain is O(offset+limit + drained cells), not O(postings)
    // — branch candidates resolve via cached bitmap point reads, big buckets
    // subdivide into (typo, prox) cells, the forward-index fetch is
    // docid-restricted to the chosen docs, and a filter either intersects as
    // a cached bitmap or is absent. This is the query shape milli serves
    // in-process at ANY corpus size (criteria cascade over LMDB bitmaps);
    // without it, head-word multi-word queries fall off the local path the
    // moment the corpus outgrows maxLocalPostings and pay 4 distributed
    // jobs per query. The one unbounded dimension — a giant tie cell, e.g.
    // a bare stop word whose whole bucket must rank — aborts to the
    // distributed path via the drain cap.
    val cellDrainEligible =
      maxLocalPostings > 0 && !sortish && distinctField.isEmpty &&
        criteria.headOption.contains(Criterion.Words) &&
        branches.forall(b => !QueryTree.hasPhrase(b)) &&
        filterDf.forall(_.isLeft)
    if (cellDrainEligible) {
      executeQueryLocal(branches.toVector, derivations, exactParts,
        searchableFids, relevantWords, prefixWords, filterDf, deleted, criteria,
        req, Map.empty, None, drainCap = maxLocalDrain) match {
        case Some(r) => return r
        case None    => () // drain cap hit — rank distributed below
      }
    }

    val bBranches = spark.sparkContext.broadcast(branches.toVector)
    val bDerivations = spark.sparkContext.broadcast(derivations)
    val bExactParts = spark.sparkContext.broadcast(exactParts.toVector)
    val bFids = spark.sparkContext.broadcast(searchableFids.toVector)
    val bFlats = spark.sparkContext.broadcast(
      branches.toVector.map(Ranker.flattenQueryTree))

    // 3. per-candidate rank vector job. doc_word_positions is written
    // WORD-major (IndexBuilder: range-partitioned + sorted on
    // (word, docid)), so the word IN-filter and prefix StartsWith ranges
    // prune at the parquet footer — at 10^12 docs the scan touches only
    // the query words' row groups, the physical twin of milli's
    // word_docids key ranges. The surviving rows (≈ candidates × query
    // words) are then hash-repartitioned by docid for the consecutive-run
    // per-doc grouping: a candidate-sized shuffle, orders of magnitude
    // smaller than the un-pruned scan it replaces.
    val dwp = applyFilter(
      index.docWordPositions.where(wordPredicate(relevantWords, prefixWords)),
      filterDf, deleted)
    val docData0 = dwp.select($"docid", $"word", $"positions")
      .repartition($"docid")
      .sortWithinPartitions($"docid")
      .as[(Int, String, Array[Int])]
      .mapPartitions { it =>
        val src = it.buffered
        new Iterator[(Int, Map[String, Array[Int]])] {
          override def hasNext: Boolean = src.hasNext
          override def next(): (Int, Map[String, Array[Int]]) = {
            val docid = src.head._1
            val m = Map.newBuilder[String, Array[Int]]
            while (src.hasNext && src.head._1 == docid) {
              val r = src.next(); m += (r._2 -> r._3)
            }
            (docid, m.result())
          }
        }
      }
      .toDF("docid", "positions")
    // fid→word_count maps are ONLY an Exactness input: when the criteria
    // don't rank by exactness the join is skipped outright (the local
    // path's needFwc gate). When they do, doc_fid_word_counts is
    // semi-joined against the candidates' docids BEFORE the per-doc map
    // aggregation — without the bound, at 10^12 docs every ranked query
    // would shuffle the whole (docid, fid, wc) table to build maps for a
    // candidate set many orders of magnitude smaller (fetchFwc is the
    // driver-path twin of this same bound).
    val docData =
      if (!criteria.contains(Criterion.Exactness))
        docData0.withColumn("fwc", lit(null).cast("map<int,int>"))
      else
        docData0.join(
          index.docFidWordCounts
            .join(dwp.select($"docid").distinct(), Seq("docid"), "left_semi")
            .groupBy($"docid")
            .agg(map_from_arrays(collect_list($"fid"), collect_list($"word_count")).as("fwc")),
          Seq("docid"), "left")

    val rankedRows = docData
      .select($"docid", $"positions", $"fwc")
      .as[(Int, Map[String, Array[Int]], Map[Int, Int])]
      .flatMap { case (docid, positions, fwcOrNull) =>
        val fwc = Option(fwcOrNull).getOrElse(Map.empty[Int, Int])
        val doc = Ranker.DocData(positions, fwc)
        Ranker.rankVector(doc, bBranches.value, bDerivations.value,
            bExactParts.value, bFids.value, Some(bFlats.value))
          .map { case (w, t, p, a, e) => (docid, w, t, p, a, e) }
          .iterator
      }
      .toDF("docid", "r_words", "r_typo", "r_proximity", "r_attribute", "r_exactness")

    val withSorts = attachSortColumns(rankedRows, criteria, req.sortCriteria)
    val sortCols = criteria.flatMap(criterionColumns(_, req.sortCriteria)) :+ $"docid".asc
    // exhaustive counting + top-k are two actions: persist the (small,
    // candidates × rank-ints) rank rows so the scan/rank job runs once
    val persisted =
      if (req.exhaustive)
        Some(withSorts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None
    try {
      val total = persisted.map(_.count()).getOrElse(-1L)
      finish(persisted.getOrElse(withSorts), sortCols, distinctField, req, total)
    } finally persisted.foreach(_.unpersist(false))
  }

  /** Word scan predicate: IN over the enumerated derivations + StartsWith
    * ranges for prefix keys (both push down to the parquet footers). */
  private def wordPredicate(relevantWords: Seq[String], prefixWords: Seq[String]) = {
    val in = if (relevantWords.nonEmpty) Seq($"word".isin(relevantWords: _*)) else Nil
    val pref = prefixWords.map(p => $"word".startsWith(p))
    (in ++ pref).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Small-query path: pruned posting rows through the forward-index LRU
    * cache (zero jobs when warm), then the SAME rank vector + ordering
    * in-process. Only reachable when the pinned dictionary bounds the scan
    * size. The filter NEVER collects its full candidate set: it is
    * semi-joined against the (≤ maxLocalPostings) query candidates, so the
    * driver materializes at most that many filter survivors. Word counts
    * come from the pinned (docid,fid)→wc map when the index is small enough,
    * else a candidate-bounded semi-join. */
  private def executeQueryLocal(
      branches: Vector[QueryTree.Op],
      derivations: Ranker.Derivations,
      exactParts: Seq[Ranker.ExactPart],
      searchableFids: Seq[Int],
      relevantWords: Seq[String],
      prefixWords: Seq[String],
      filterDf: Search.Filt,
      deleted: RoaringBitmap,
      criteria: Seq[Criterion],
      req: SearchRequest,
      sortCmps: Map[Criterion, (Int, Int) => Int] = Map.empty,
      distinctVals: Option[java.util.HashMap[Integer, String]] = None,
      drainCap: Long = Long.MaxValue): Option[SearchResult] = {
    // Lazy words-bucket drain (milli's criterion iterator stops at `limit`,
    // criteria/words.rs:31-106): pass 1 computes only BUCKET MEMBERSHIP per
    // candidate; when the FIRST active criterion is Words, only docs in the
    // leading buckets covering offset+limit get the full rank vector
    // (typo/proximity/attribute/exactness) — a common-word query over 10^5
    // local candidates ranks a few hundred docs, not all.
    //
    // Pass 1 itself is BITMAP ALGEBRA whenever the branches are phrase-free:
    // per-branch candidate bitmaps off the cached word/prefix docids tables
    // (zero jobs warm — the same resolver the no-rank fast path uses), so
    // DocData maps are built ONLY for the docs actually ranked. Branches
    // with phrases need positions and fall back to per-doc matching.
    val take = req.offset + req.limit
    // distinct must rank EVERY candidate: a dedup in a leading bucket pulls
    // later buckets into the page, and the distinct-adjusted candidate
    // count spans all buckets (facet_distinct.rs semantics)
    val wordsFirst =
      criteria.headOption.contains(Criterion.Words) && distinctVals.isEmpty
    val flats: Vector[Ranker.Flat] = branches.map(Ranker.flattenQueryTree)
    val branchPrefixKeys: Vector[Seq[(String, Boolean, Int)]] =
      branches.map(b => Ranker.derivationKeys(b).filter(_._2).toSeq)
    val needFwc = criteria.contains(Criterion.Exactness)
    val branchBms: Option[Vector[RoaringBitmap]] = Search.traced("branch-bitmaps") {
      val bms = branches.map(b => index.resolveTreeBitmap(b, derivations))
      if (bms.contains(None)) None else Some(bms.map(_.get))
    }

    /** fid → word_count map for one doc (exactness input). */
    def fwcFor(fetched: Map[Int, Map[Int, Int]])(d: Int): Map[Int, Int] =
      if (!needFwc) Map.empty
      else index.fidWordCountsLocal match {
        case Some(lm) =>
          searchableFids.flatMap(f =>
            lm.get((d.toLong << 16) | f.toLong).map(f -> _)).toMap
        case None => fetched.getOrElse(d, Map.empty)
      }
    /** candidate-bounded semi-join fetch when the wc map isn't pinned. */
    def fetchFwc(ids: Seq[Int]): Map[Int, Map[Int, Int]] =
      if (!needFwc || ids.isEmpty || index.fidWordCountsLocal.isDefined) Map.empty
      else {
        val candDf = spark.createDataset(ids).toDF("docid")
        index.docFidWordCounts
          .join(broadcast(candDf), Seq("docid"), "left_semi")
          .select($"docid", $"fid", $"word_count")
          .as[(Int, Int, Int)].collect()
          .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => r._2 -> r._3).toMap }
      }

    // lexicographic order over the criteria that are active, then docid —
    // identical to the distributed sortCols. Engine criteria compare
    // rank-vector components; sort-ish criteria compare driver-pinned
    // facet/geo values (localSortComparators). Hoisted above the drain:
    // the bound-cell verification loop needs the full order to find the
    // page's take-th doc.
    type R = (Int, (Int, Int, Int, Long, Int))
    val comps: Array[(R, R) => Int] = criteria.flatMap {
      case Criterion.Words =>
        Seq((a: R, b: R) => Integer.compare(a._2._1, b._2._1))
      case Criterion.Typo =>
        Seq((a: R, b: R) => Integer.compare(a._2._2, b._2._2))
      case Criterion.Proximity =>
        Seq((a: R, b: R) => Integer.compare(a._2._3, b._2._3))
      case Criterion.Attribute =>
        Seq((a: R, b: R) => java.lang.Long.compare(a._2._4, b._2._4))
      case Criterion.Exactness =>
        Seq((a: R, b: R) => Integer.compare(a._2._5, b._2._5))
      case c =>
        sortCmps.get(c).map(f => (a: R, b: R) => f(a._1, b._1)).toSeq
    }.toArray
    val ord = new Ordering[R] {
      override def compare(a: R, b: R): Int = {
        var i = 0
        while (i < comps.length) {
          val c = comps(i)(a, b)
          if (c != 0) return c
          i += 1
        }
        Integer.compare(a._1, b._1)
      }
    }

    val (totalCandidates, ranked) = branchBms match {
      case Some(bms) =>
        // disjoint buckets: bucket i = docs whose FIRST matching branch is i
        // (indexWhere semantics), tombstones out
        val seen = new RoaringBitmap()
        val buckets = bms.map { bm =>
          val b = RoaringBitmap.andNot(bm, seen)
          b.andNot(deleted)
          seen.or(bm)
          b
        }
        // filter application: a handle-cached bitmap intersects in-process
        // (zero jobs warm); a streaming plan semi-joins against the bounded
        // candidate union — one job, collect bounded by the union's
        // cardinality (≤ maxLocalPostings), so a broad filter over 10^9
        // docs never reaches the driver
        filterDf.foreach {
          case Left(fbm) => buckets.foreach(_.and(fbm))
          case Right(fd) =>
            val union = buckets.reduce((a, b) => RoaringBitmap.or(a, b))
            if (!union.isEmpty) {
              val candDf = spark.createDataset(union.toArray.toSeq).toDF("docid")
              val survivors = fd.join(broadcast(candDf), Seq("docid"), "left_semi")
                .select($"docid").as[Int].collect()
              val survBm = Bitmaps.fromInts(survivors)
              buckets.foreach(_.and(survBm))
            }
        }
        val total = buckets.iterator.map(_.getLongCardinality).sum
        // lazy drain: whole leading buckets until offset+limit is covered.
        // When the criteria continue with typo/proximity, a LARGE leading
        // bucket is first SUBDIVIDED into (typo, prox) cells resolved with
        // word/pair bitmap algebra (RankCells — milli's criterion cascade
        // as set operations, criteria/typo.rs + proximity.rs:185-347) and
        // only the leading cells covering offset+limit drain: a 35k-doc
        // stop-word bucket ranks tens of docs per-doc, not all of them.
        // Cell labels never enter the final order (chosen docs still get
        // the full per-doc rank vector below); cells only pick WHICH docs
        // to rank, so the drain is rank-identical by construction as long
        // as the cells are lexicographically sound.
        val cellDims: Seq[Criterion] =
          if (!wordsFirst) Nil
          else criteria.drop(1)
            .takeWhile(c => c == Criterion.Typo || c == Criterion.Proximity)
            .take(2)
        val chosenIds = scala.collection.mutable.ArrayBuffer.empty[Int]
        val chosenBuckets = scala.collection.mutable.ArrayBuffer.empty[Int]
        // per-chosen-doc criterion values PROVEN by the drain cell (−1 =
        // unknown → computed per-doc); packed (typo << 8 | prox+1)-free as
        // two parallel buffers for the hot loop
        val chosenTypo = scala.collection.mutable.ArrayBuffer.empty[Int]
        val chosenProx = scala.collection.mutable.ArrayBuffer.empty[Int]
        val chosenAttr = scala.collection.mutable.ArrayBuffer.empty[Long]
        val chosenExact = scala.collection.mutable.ArrayBuffer.empty[Int]
        var drained = 0L
        var capHit = false
        var anyBoundCell = false
        // ---- cell REFINEMENT (tables #10/#12 + fid_word_count_docids):
        // a large cell whose labels prove every criterion up to the next
        // Attribute / Exactness subdivides by that criterion's EXACT
        // strata (RankCells.attrCells / exactCells — the set re-expression
        // of milli's attribute.rs / exactness.rs algorithms), so a giant
        // tie cell (stop-word queries) drains tens of docs per-doc instead
        // of thousands — or aborting to the distributed path at the drain
        // cap. Refinement only applies when every criterion BEFORE the
        // refined one is exactly labeled (else the subdivided emission
        // order wouldn't be lexicographically sound).
        val critTail = criteria.drop(1)
        def nextUnprovenRefinable(c: RankCells.Cell): Option[Criterion] = {
          var i = 0
          while (i < critTail.length) {
            critTail(i) match {
              case Criterion.Typo =>
                if (c.typo < 0) return None
              case Criterion.Proximity =>
                if (c.prox < 0 || c.proxBound) return None
              case Criterion.Attribute =>
                if (c.attr == RankCells.AttrUnknown)
                  return Some(Criterion.Attribute)
              case Criterion.Exactness =>
                if (c.exact < 0) return Some(Criterion.Exactness)
              case other =>
                // sort-ish criteria compare pinned per-doc values — but an
                // INACTIVE one (no comparator: the default rules' `sort`
                // placeholder without a query-time sort) contributes
                // nothing to the order and is skippable
                if (sortCmps.contains(other)) return None
            }
            i += 1
          }
          None
        }
        def refineCell(c: RankCells.Cell, bi: Int): Iterator[RankCells.Cell] =
          if (!wordsFirst || c.noRefine ||
              c.docs.getLongCardinality < RankCells.RefineMinDocs)
            Iterator.single(c)
          else nextUnprovenRefinable(c) match {
            case Some(Criterion.Attribute) =>
              // forced: unrefined, this cell alone overflows the remaining
              // drain budget and aborts the query to the distributed path —
              // wide-material algebra (normally refused) still beats that
              val forced = c.docs.getLongCardinality > drainCap - drained
              Search.traced(s"attr-cells(${c.docs.getLongCardinality})") {
                RankCells.attrCells(index, derivations, flats(bi), c, forced)
              } match {
                case Some(cs) => cs.flatMap(refineCell(_, bi))
                case None     => Iterator.single(c)
              }
            case Some(Criterion.Exactness) =>
              Search.traced(s"exact-cells(${c.docs.getLongCardinality})") {
                RankCells.exactCells(index, exactParts, searchableFids, c)
              }.getOrElse(Iterator.single(c))
            case _ => Iterator.single(c)
          }
        // resumable flattened cell stream across buckets (lazy: a bucket's
        // cells build only when the drain reaches it, with the CURRENT
        // drained count sizing the pays-off check exactly like the old loop)
        val cellStream: BufferedIterator[(RankCells.Cell, Int)] =
          buckets.iterator.zipWithIndex.flatMap { case (b, bi) =>
            val cellIt: Iterator[RankCells.Cell] =
              if (cellDims.isEmpty || b.getLongCardinality <= math.max(64L, take - drained))
                Iterator.single(RankCells.Cell(b, -1, -1))
              else Search.traced(s"cells(bucket $bi)") {
                RankCells.cellIterator(index, branches(bi), derivations, cellDims, b)
                  .getOrElse(Iterator.single(RankCells.Cell(b, -1, -1)))
              }
            cellIt.flatMap(refineCell(_, bi)).map(c => (c, bi))
          }.buffered
        def drainOne(): Unit = {
          val (cell, bi) = cellStream.next()
          drained += cell.docs.getLongCardinality
          // drain cap: a tie cell too large to rank in-process sends the
          // whole query to the distributed rank path (only reachable from
          // the cell-drain admission; the volume-gated entry passes
          // Long.MaxValue and keeps its r4 behavior exactly)
          if (drained > drainCap) { capHit = true; return }
          if (cell.proxBound) anyBoundCell = true
          val it = cell.docs.getIntIterator
          while (it.hasNext) {
            chosenIds += it.next(); chosenBuckets += bi
            chosenTypo += cell.typo
            // a bound label is NOT the rank component — force the per-doc
            // plane sweep for these docs
            chosenProx += (if (cell.proxBound) -1 else cell.prox)
            chosenAttr += cell.attr
            chosenExact += cell.exact
          }
        }
        // take-check BEFORE hasNext: the buffered flatMap materializes the
        // next head on hasNext, which would run one refinement (possibly a
        // forced strata sweep) for a cell the satisfied drain never takes
        while (!capHit && (!wordsFirst || drained < take) && cellStream.hasNext)
          drainOne()
        if (capHit) return None
        // incremental fetch+rank over chosen index ranges: the verification
        // loop below may resume the drain, so ranking happens in slices
        // FULLY-PROVEN docs — every ACTIVE engine criterion's component
        // carried by their drain cell — skip the forward fetch and the
        // DocData build entirely (the rank tuple assembles from labels;
        // inactive components are never compared by `ord`). A giant tie
        // cell refined by attr/exact strata ranks with ZERO forward rows.
        val needTypoC = criteria.contains(Criterion.Typo)
        val needProxC = criteria.contains(Criterion.Proximity)
        val needAttrC = criteria.contains(Criterion.Attribute)
        val needExactC = criteria.contains(Criterion.Exactness)
        def provenAt(i: Int): Boolean =
          (!needTypoC || chosenTypo(i) >= 0) &&
            (!needProxC || chosenProx(i) >= 0) &&
            (!needAttrC || chosenAttr(i) != RankCells.AttrUnknown) &&
            (!needExactC || chosenExact(i) >= 0)
        def rankRange(from: Int, until: Int): Array[R] = {
          if (from >= until) return Array.empty
          val needIdx = (from until until).filterNot(provenAt)
          val sliceIds = needIdx.map(chosenIds(_))
          // positions are needed only for the DRAINED buckets' branches
          // (plus the query-level exactness part words): a Last-strategy
          // query carries every reduced branch's derivations in
          // relevantWords, but the page usually drains from branch 0 alone
          val usedKeys: Set[(String, Boolean, Int)] =
            needIdx.map(chosenBuckets(_)).distinct
              .flatMap(bi => Ranker.derivationKeys(branches(bi))).toSet
          // exactness part words are fetched LITERALLY and unconditionally:
          // a part word that reaches the tree only as a PREFIX key (last
          // query word) is absent from relevantWords, but exactnessRank
          // needs its literal positions — the distributed path sees them
          // through the prefix range scan, so without this the drained
          // docs' exactness collapses into a tie (seed-424242 #210 /
          // seed-77001122 #29 parity failures)
          val exactWords: Seq[String] = exactParts.flatMap {
            case Ranker.ESynonyms(ws) => ws
            case Ranker.EPhrase(ws)   => ws.flatten
          }
          val neededWordSet: Set[String] =
            usedKeys.flatMap { case (w, pfx, t) =>
              derivations.map.getOrElse((w, pfx, t), Nil).map(_._1) ++
                (if (!pfx) Seq(w) else Nil)
            } ++ exactWords
          // presence filter: of the (possibly hundreds of) derivation
          // words, fetch positions only for those whose candidate bitmap
          // intersects this slice's docs — zero jobs warm, and the scan
          // predicate shrinks to the words that can contribute rows
          val arrays: Array[Array[(Int, String, Array[Int])]] =
            if (needIdx.isEmpty) Array.empty
            else {
              val sliceBm = graft.core.Bitmaps.fromInts(sliceIds.toArray)
              val fetchP = prefixWords.filter(p =>
                usedKeys.exists { case (w, pfx, _) => pfx && w.startsWith(p) })
              // exact-part words already covered by a fetched prefix range
              // arrive with its rows — only the uncovered ones fetch as
              // literal words
              val fetchW = index.presentWords(
                (relevantWords.filter(neededWordSet) ++
                  exactWords.filterNot(w => fetchP.exists(w.startsWith)))
                  .distinct, sliceBm)
              if (Search.trace) System.err.println(
                s"[graft-trace] rank-fetch fetchW=$fetchW fetchP=$fetchP " +
                  s"usedKeys=$usedKeys")
              val (wRows, pRows) = Search.traced("dwp-fetch") {
                // docid-restricted cold fetch for heavy words (async
                // complete fill warms the cache behind this query) — the
                // drain only needs positions for the CHOSEN docs
                index.dwpCache.getForDocs(fetchW, fetchP, sliceIds.toArray)
              }
              (wRows.valuesIterator ++ pRows.valuesIterator).toArray
            }
          val fetched = fetchFwc(sliceIds.toSeq)
          val fwcOf = fwcFor(fetched) _
          // positions ONLY for the ranked docs: each cached row array is
          // docid-sorted (DwpCache sorts at fill), so per chosen doc we
          // binary-search each array — O(|chosen| · arrays · log rows),
          // independent of the total cached row count — build its DocData
          // inline and rank it with the KNOWN bucket; the drain is
          // embarrassingly parallel and fans out over the driver's cores
          if (Search.trace) Ranker.Prof.reset()
          val out = Search.traced(s"rank(${until - from} docs)") {
            Search.parMap(until - from) { k =>
              val i = from + k
              val d = chosenIds(i)
              if (provenAt(i))
                // label-only assembly: inactive components carry their
                // sentinel (−1 / AttrUnknown) — `ord` never reads them
                d -> ((chosenBuckets(i), chosenTypo(i), chosenProx(i),
                  chosenAttr(i), chosenExact(i)))
              else {
                val pos = scala.collection.mutable.HashMap.empty[String, Array[Int]]
                arrays.foreach { a =>
                  var lo = 0
                  var hi = a.length
                  while (lo < hi) { // first row with docid >= d
                    val mid = (lo + hi) >>> 1
                    if (a(mid)._1 < d) lo = mid + 1 else hi = mid
                  }
                  while (lo < a.length && a(lo)._1 == d) {
                    pos.update(a(lo)._2, a(lo)._3)
                    lo += 1
                  }
                }
                val bi = chosenBuckets(i)
                val doc = Ranker.DocData(pos, fwcOf(d))
                d -> Ranker.rankVectorAt(doc, branches(bi), bi, derivations,
                  exactParts, searchableFids, flats(bi), branchPrefixKeys(bi),
                  knownTypo = chosenTypo(i), knownProx = chosenProx(i),
                  knownAttr = chosenAttr(i), knownExact = chosenExact(i))
              }
            }
          }
          if (Search.trace)
            System.err.println(s"[graft-trace] rank-components ${Ranker.Prof.summary}")
          out
        }
        val rankedBuf = scala.collection.mutable.ArrayBuffer.empty[R]
        var rankedUpTo = 0
        def rankMore(): Unit = {
          val u = chosenIds.length
          rankedBuf ++= rankRange(rankedUpTo, u)
          rankedUpTo = u
        }
        rankMore()
        // BOUND-CELL VERIFICATION: lower-bound prox cells (≥3-word
        // branches) may have drained docs whose TRUE proximity exceeds the
        // next cell's bound — keep draining while the next cell could
        // still place a doc at or above the page's take-th position. The
        // comparison walks (words bucket, then the cell dims in criteria
        // order); equality drains too (later dims break the tie). Exact
        // cell streams never set anyBoundCell and keep the r4 stop rule.
        if (wordsFirst && anyBoundCell) {
          def cellCouldBeat(c: RankCells.Cell, bi: Int, kth: R): Boolean = {
            if (bi != kth._2._1) return bi < kth._2._1
            var i = 0
            while (i < cellDims.length) {
              val (cv, kv) = cellDims(i) match {
                case Criterion.Typo => (c.typo, kth._2._2)
                case _              => (c.prox, kth._2._3)
              }
              if (cv == -1) return true // unknown label → conservative drain
              if (cv != kv) return cv < kv
              i += 1
            }
            true // full tie on the proven prefix → later dims could beat
          }
          var stop = false
          while (!stop && !capHit && cellStream.hasNext) {
            val (nc, nbi) = cellStream.head
            val mustDrain =
              rankedBuf.length < take || {
                val kth = rankedBuf.sorted(ord).apply(take - 1)
                cellCouldBeat(nc, nbi, kth)
              }
            if (mustDrain) { drainOne(); if (!capHit) rankMore() }
            else stop = true
          }
          if (capHit) return None
        }
        (total, rankedBuf.toArray)

      case None =>
        // phrase fallback: per-doc boolean matching over every candidate row
        val (wRows, pRows) = index.dwpCache.get(relevantWords, prefixWords)
        val m = scala.collection.mutable.LinkedHashMap
          .empty[Int, scala.collection.mutable.HashMap[String, Array[Int]]]
        (wRows.valuesIterator ++ pRows.valuesIterator).flatten.foreach { case (d, w, ps) =>
          if (!deleted.contains(d))
            m.getOrElseUpdate(d,
              scala.collection.mutable.HashMap.empty[String, Array[Int]]).update(w, ps)
        }
        // filter: cached bitmap in-process; otherwise a semi-join against
        // the bounded candidate set (never a full filter collect — ADVICE r2)
        filterDf.foreach {
          case Left(fbm) => m.filterInPlace((d, _) => fbm.contains(d))
          case Right(fd) =>
            if (m.nonEmpty) {
              val candDf = spark.createDataset(m.keys.toSeq).toDF("docid")
              val survivors = fd.join(broadcast(candDf), Seq("docid"), "left_semi")
                .select($"docid").as[Int].collect().toSet
              m.filterInPlace((d, _) => survivors.contains(d))
            }
        }
        val bucketed: Array[scala.collection.mutable.ArrayBuffer[Int]] =
          Array.fill(branches.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
        m.foreach { case (docid, pos) =>
          val doc = Ranker.DocData(pos, Map.empty) // matching needs no fwc
          val bi = branches.indexWhere(b => Ranker.matches(b, doc, derivations))
          if (bi >= 0) bucketed(bi) += docid
        }
        val total = bucketed.iterator.map(_.length.toLong).sum
        val chosenIds: Seq[Int] =
          if (!wordsFirst) bucketed.iterator.flatten.toSeq
          else {
            val acc = Vector.newBuilder[Int]
            var n = 0
            bucketed.iterator.takeWhile(_ => n < take).foreach { b =>
              acc ++= b; n += b.length
            }
            acc.result()
          }
        val fetched = fetchFwc(chosenIds)
        val fwcOf = fwcFor(fetched) _
        val out = chosenIds.iterator.flatMap { docid =>
          val doc = Ranker.DocData(m(docid), fwcOf(docid))
          Ranker.rankVector(doc, branches, derivations, exactParts,
              searchableFids, Some(flats))
            .map(v => (docid, v))
        }.toArray
        (total, out)
    }
    distinctVals match {
      case Some(sm) =>
        // distinct drain: full rank order, keep the FIRST doc per distinct
        // value (docs without a value never dedup — the distributed window
        // partitions them by docid); the distinct-adjusted candidate count
        // is the kept count over ALL candidates (wordsFirst was disabled,
        // so `ranked` covers every bucket)
        val sortedAll = Search.traced(s"distinct-sort(${ranked.length})") {
          ranked.sorted(ord)
        }
        val seen = new java.util.HashSet[String]()
        val ids = Vector.newBuilder[Int]
        var kept = 0L
        sortedAll.foreach { r =>
          val v = sm.get(r._1)
          if (v == null || seen.add(v)) {
            if (kept < take) ids += r._1
            kept += 1
          }
        }
        Some(SearchResult(ids.result().drop(req.offset), kept))
      case None =>
        // bounded top-k selection instead of a full sort: a size-
        // (offset+limit) max-heap over the rank order — O(n) peek
        // comparisons for the common case (most candidates never displace
        // the heap head)
        val k = take
        val page = Search.traced(s"topk(${ranked.length})") {
          if (k == 0) Array.empty[(Int, (Int, Int, Int, Long, Int))]
          else if (ranked.length <= math.max(k * 4, 64)) ranked.sorted(ord)
          else {
            val heap = new java.util.PriorityQueue[(Int, (Int, Int, Int, Long, Int))](
              k + 1, ord.reverse)
            ranked.foreach { r =>
              if (heap.size < k) heap.offer(r)
              else if (ord.lt(r, heap.peek())) { heap.poll(); heap.offer(r) }
            }
            val arr = heap.toArray(Array.empty[(Int, (Int, Int, Int, Long, Int))])
            arr.sorted(ord)
          }
        }
        Some(SearchResult(
          page.iterator.map(_._1).slice(req.offset, req.offset + req.limit).toSeq,
          totalCandidates))
    }
  }

  /** Finish a bitmap-resolved no-rank query: ascending-docid page + count.
    * Without a filter this is zero jobs (roaring iteration); with one, the
    * candidate bitmap rides along as a foldable `bitmap_contains` literal
    * (deserialized once per task) and only the ≤ offset+limit page plus one
    * count come back — the driver never materializes the filter set. */
  private def finishBitmapCandidates(
      cand: RoaringBitmap,
      filterDf: Search.Filt,
      req: SearchRequest,
      distinctPin: Option[java.util.HashMap[Integer, String]] = None): SearchResult = {
    val take = req.offset + req.limit
    /** docid-order page; with a distinct pin, keep-first-per-value (docid
      * order IS the rank order here, so this equals the distributed
      * window's row_number==1 + count — which always counts exactly). */
    def pageOf(c: RoaringBitmap, exactCountAlways: Boolean): SearchResult =
      distinctPin match {
        case Some(sm) =>
          val seen = new java.util.HashSet[String]()
          val ids = Vector.newBuilder[Int]
          var kept = 0L
          val it = c.iterator()
          while (it.hasNext) {
            val d = it.next().intValue()
            val v = sm.get(d)
            if (v == null || seen.add(v)) {
              if (kept < take) ids += d
              kept += 1
            }
          }
          SearchResult(ids.result().drop(req.offset), kept)
        case None =>
          val ids = Vector.newBuilder[Int]
          val it = c.iterator()
          var i = 0
          while (it.hasNext && i < take) { ids += it.next().intValue(); i += 1 }
          SearchResult(ids.result().drop(req.offset),
            if (exactCountAlways || req.exhaustive) c.getLongCardinality else -1L)
      }
    filterDf match {
      case None => pageOf(cand, exactCountAlways = true)
      case Some(Left(fbm)) =>
        // cached filter bitmap: in-process intersection, zero jobs. Count
        // honors `exhaustive` like the streaming branch (parity with the
        // distributed path's -1).
        cand.and(fbm)
        pageOf(cand, exactCountAlways = false)
      case Some(Right(fd)) =>
        val filtered = fd.where(graft.functions.GraftFunctions.bitmap_contains(
          lit(Bitmaps.cboSerialize(cand)), $"docid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val total = if (req.exhaustive) filtered.count() else -1L
          val page = filtered.orderBy($"docid").limit(take)
            .select($"docid").as[Int].collect()
          SearchResult(page.toSeq.drop(req.offset), total)
        } finally filtered.unpersist(false)
    }
  }

  // -------------------------------------------------------------- helpers

  /** join numeric+string facet values for every sort-ish criterion.
    * Multi-valued fields aggregate PER DIRECTION — milli's facet sort is
    * keep-first over value groups ("once a document id is returned by the
    * iterator, it is never returned again", facet_sort_ascending.rs:14-31),
    * so ascending ranks a doc at its MINIMUM value and descending at its
    * MAXIMUM. The former un-aggregated numeric join could even emit the
    * same docid twice in one page; the aggregation also makes the join
    * side one row per doc. */
  private def attachSortColumns(
      df: DataFrame,
      criteria: Seq[Criterion],
      sorts: Seq[SortSpec]): DataFrame = {
    val fieldDirs: Seq[(String, Boolean)] = criteria.flatMap {
      case Criterion.Asc(f)  => Seq((f, true))
      case Criterion.Desc(f) => Seq((f, false))
      case Criterion.Sort    =>
        sorts.filter(_.geoPoint.isEmpty).map(s => (s.field, s.ascending))
      case _                 => Nil
    }.distinct
    val withFacets = fieldDirs.foldLeft(df) { case (acc, (f, asc)) =>
      val dir = if (asc) "asc" else "desc"
      val nAgg = if (asc) min($"value") else max($"value")
      val sAgg = if (asc) min($"norm") else max($"norm")
      val nums = index.facetNumbers.where($"field" === f)
        .groupBy($"docid").agg(nAgg.as(s"num_${dir}__$f"))
      val strs = index.facetStrings.where($"field" === f)
        .groupBy($"docid").agg(sAgg.as(s"str_${dir}__$f"))
      acc.join(nums, Seq("docid"), "left").join(strs, Seq("docid"), "left")
    }
    // geo sort: join the point coordinates once
    val needsGeo = criteria.contains(Criterion.Sort) && sorts.exists(_.geoPoint.isDefined)
    if (!needsGeo) withFacets
    else if (index.hasGeoCells)
      // one narrow table carries both coordinates — a single left join
      // instead of two facet-band scans + a docid join
      withFacets.join(index.geoCells
        .select($"docid", $"lat".as("geo__lat"), $"lng".as("geo__lng")),
        Seq("docid"), "left")
    else {
      val lat = index.facetNumbers.where($"field" === "_geo.lat")
        .select($"docid", $"value".as("geo__lat"))
      val lng = index.facetNumbers.where($"field" === "_geo.lng")
        .select($"docid", $"value".as("geo__lng"))
      withFacets.join(lat, Seq("docid"), "left").join(lng, Seq("docid"), "left")
    }
  }

  /** sort columns for one criterion (missing values last, milli
    * `asc_desc.rs` semantics: numbers first, then strings, then absent). */
  private def criterionColumns(c: Criterion, sorts: Seq[SortSpec]) = c match {
    case Criterion.Words     => Seq($"r_words".asc)
    case Criterion.Typo      => Seq($"r_typo".asc)
    case Criterion.Proximity => Seq($"r_proximity".asc)
    case Criterion.Attribute => Seq($"r_attribute".asc)
    case Criterion.Exactness => Seq($"r_exactness".asc)
    case Criterion.Asc(f)    =>
      Seq(col(s"num_asc__$f").asc_nulls_last, col(s"str_asc__$f").asc_nulls_last)
    case Criterion.Desc(f)   =>
      Seq(col(s"num_desc__$f").desc_nulls_last, col(s"str_desc__$f").desc_nulls_last)
    case Criterion.Sort      =>
      sorts.flatMap { s =>
        s.geoPoint match {
          case Some((qlat, qlng)) =>
            val dist = graft.functions.GraftFunctions.haversine(
              col("geo__lat"), col("geo__lng"), lit(qlat), lit(qlng))
            Seq(if (s.ascending) dist.asc_nulls_last else dist.desc_nulls_last)
          case None =>
            if (s.ascending)
              Seq(col(s"num_asc__${s.field}").asc_nulls_last,
                col(s"str_asc__${s.field}").asc_nulls_last)
            else
              Seq(col(s"num_desc__${s.field}").desc_nulls_last,
                col(s"str_desc__${s.field}").desc_nulls_last)
        }
      }
  }

  private def sortColumns(criteria: Seq[Criterion], sorts: Seq[SortSpec]) =
    criteria.flatMap {
      case c @ (Criterion.Asc(_) | Criterion.Desc(_) | Criterion.Sort) =>
        criterionColumns(c, sorts)
      case _ => Nil
    }

  /** distinct → top-k → offset/limit drain (`search/mod.rs:244-288`).
    * Distinct = keep the first doc per facet value in rank order —
    * `FacetDistinct` (search/distinct/facet_distinct.rs:32-190) as a
    * window `row_number() == 1`, fully distributed. */
  private def finish(
      ranked: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      distinctField: Option[String],
      req: SearchRequest,
      candidates: Long): SearchResult = {
    val take = req.offset + req.limit
    val (deduped, candidatesN, persisted) = distinctField match {
      case None => (ranked, candidates, None)
      case Some(f) =>
        val strs = index.facetStrings.where($"field" === f)
          .groupBy($"docid").agg(min($"norm").as("distinct__v"))
        val withV = ranked.join(strs, Seq("docid"), "left")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce($"distinct__v", concat(lit("\u0000nodist\u0000"), $"docid")))
          .orderBy(sortCols: _*)
        // count + top-k are two actions over the same windowed plan: persist
        // so the dedup window runs once
        val d = withV.withColumn("rn__", row_number().over(w)).where($"rn__" === 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // candidate count after distinct-dedup (facet_distinct.rs semantics:
        // excluded duplicates leave the candidate set)
        (d, d.count(), Some(d))
    }
    try {
      // TakeOrderedAndProject: orderBy + limit never materializes a full sort
      val rows = deduped.orderBy(sortCols: _*).select($"docid").limit(take).collect()
      SearchResult(
        rows.toSeq.drop(req.offset).map(_.getInt(0)),
        candidatesN)
    } finally persisted.foreach(_.unpersist(false))
  }
}
