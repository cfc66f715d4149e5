package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-gate query battery: every operator family of SURVEY.md §2 plus
  * the training-data pipeline operators, each as a self-contained
  * DataFrame pipeline over the driver's parquet tables with an exact
  * DuckDB-SQL oracle (see [[SparkEntry.oracleSql]]).
  *
  * Conventions shared with the oracles:
  *  - tokenization = `split(lower(text), '[^a-z0-9]+')`, empties dropped,
  *    token order = row_number over the raw split position (identical to
  *    DuckDB `regexp_split_to_array` + `generate_subscripts`);
  *  - floating-point outputs are fixed-point: `floor(x*1e6 + 0.5)` BIGINT;
  *  - every result is deterministically ordered.
  */
object Queries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The battery shares one materialized forward index per (session, dir) —
    * the analogue of building the index once and querying it many times.
    * Keyed on the session identity so a stopped session's cache entries are
    * never reused. */
  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]
  private def cached(spark: SparkSession, dir: String, tag: String)
                    (mk: => DataFrame): DataFrame =
    dfCache.getOrElseUpdate((System.identityHashCode(spark), dir, tag), {
      // cached plans otherwise pin the full spark.sql.shuffle.partitions
      // fan-out on every exchange they feed; letting AQE re-optimize them
      // keeps partition counts proportional to data size at ANY scale
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      val df = mk
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** (doc_id, toks: array<string>) — per-doc token array, empties dropped.
    * Position = array index + 1, so no per-doc window shuffle is ever
    * needed; every token-derived query explodes this cached table. */
  def tokArrays(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "tokarrays") {
      docs(spark, dir).select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "").as("toks"))
    }

  /** (doc_id, word, pos) — pos = 1-based index in the filtered token
    * sequence. The forward index (doc_word_positions) in simple-token mode. */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "word")))
      .select(col("doc_id"), col("word"), (col("p0") + 1).as("pos"))

  /** Fixed-point helper shared with the SQL oracles. */
  private def fp(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")

  // ===================================================== inverted index

  /** word → df + docid bounds: the word_docids posting table shape.
    * Words de-duplicate PER DOC in the array before the explode, so each
    * (doc, word) is emitted exactly once and the aggregation is a plain
    * map-side-combining count — countDistinct(doc_id) needed a second
    * (word, doc_id)-keyed exchange round (min/max docid are unchanged by
    * the per-doc dedup: the (doc, word) pair SET is identical). */
  def qWordDocids(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("df"),
        min("doc_id").as("min_docid"), max("doc_id").as("max_docid"))
      .orderBy("word")

  /** forward-index doc stats (doclen for BM25) — map-side off the cached
    * token arrays (was a groupBy shuffle of every token occurrence). */
  def qDocStats(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir).where(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .orderBy("doc_id")

  /** term dictionary with collection frequencies. A one-exchange rewrite
    * (per-doc (word, tf) pairs via a run-length scan of the sorted token
    * array, then a single word-keyed agg for df + cf) was tried this
    * round and REVERTED: measured ~2× slower at bench scale (0.40 s vs
    * 0.19–0.22 s steady) — the per-doc sort/scan CPU outweighs the saved
    * (word, doc_id) exchange round on 3k short docs. At corpus scale the
    * trade flips with token volume; noted for a future round. */
  def qTermStats(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir).groupBy("word")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
      .orderBy(desc("cf"), asc("word"))

  /** AND of two posting lists (bitmap intersection analogue). Membership
    * tests run map-side on the per-doc token array — one row per doc, so
    * the old explode + distinct + semi-join shuffles disappear; only the
    * oracle's output ordering exchanges anything. */
  def qSearchAnd(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(array_contains(col("toks"), "spark") &&
        array_contains(col("toks"), "merge"))
      .select("doc_id").orderBy("doc_id")

  /** OR (bitmap union). */
  def qSearchOr(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(array_contains(col("toks"), "spark") ||
        array_contains(col("toks"), "stream"))
      .select("doc_id").orderBy("doc_id")

  /** AND NOT (bitmap difference / soft-delete subtraction analogue). */
  def qSearchNot(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(array_contains(col("toks"), "spark") &&
        !array_contains(col("toks"), "merge"))
      .select("doc_id").orderBy("doc_id")

  /** phrase = adjacent positions (resolve_phrase, prox-1 pair): the
    * position join becomes an adjacent-pair scan of the token array. */
  def qSearchPhrase(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(when(size(col("toks")) >= 2,
        exists(transform(sequence(lit(0), size(col("toks")) - 2),
          i => col("toks")(i) === "data" && col("toks")(i + 1) === "spark"),
          b => b)).otherwise(lit(false)))
      .select("doc_id").orderBy("doc_id")

  /** prefix search (word_prefix_docids analogue). */
  def qSearchPrefix(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(exists(col("toks"), w => w.startsWith("st")))
      .select("doc_id").orderBy("doc_id")

  /** typo-tolerant search: dictionary words within Damerau-Levenshtein 1 of
    * the query word, same first letter (milli's 1-typo rule) → their docs.
    * Derivations are computed DICTIONARY-side (distinct words only — a few
    * thousand rows) and semi-joined back, not by scanning every token
    * occurrence with the distance UDF: at web scale the dictionary is ~10^6
    * rows while the token table is ~10^12. */
  def qSearchTypo(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(spark, dir)
    val qword = "spakr" // 1 transposition from "spark"
    val derive = udf((w: String) =>
      w != null && w.nonEmpty && w.charAt(0) == qword.charAt(0) &&
        graft.core.Typo.osaDistance(qword, w, 1) <= 1)
    val matches = t.select("word").distinct().where(derive(col("word")))
    t.join(broadcast(matches), Seq("word"), "left_semi")
      .select("doc_id").distinct().orderBy("doc_id")
  }

  /** BM25 top-k (k1=1.2, b=0.75) for query {spark, merge} — the flagship
    * scoring mode (north rule). Declarative form: tf/df/doclen joins +
    * one TakeOrdered; the block-max WAND kernel is the scale path, this is
    * its oracle-checkable equivalent. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val qterms = Seq("spark", "merge")
    // Everything derives map-side from the cached per-doc token arrays:
    // tf_t = in-array occurrence count, dl = size(toks), and the global
    // scalars (N, avgdl, df per term) come from ONE one-row aggregation
    // cross-joined in as a broadcast. The old shape shuffled every token
    // occurrence through a (doc, word) aggregation, re-computed that
    // subtree a second time for df, and broadcast an N-doc doclen
    // relation; this one's only exchanges are the one-row broadcast and
    // the top-k — at any corpus size the query is a single scan.
    // Numerically identical: per-term score expressions are unchanged and
    // the two-term sum is a commutative double add.
    val ta = tokArrays(spark, dir)
    val dlc = size(col("toks"))
    val tf = qterms.map(t =>
      size(filter(col("toks"), w => w === t)).as(s"tf_$t"))
    val statAggs =
      Seq(count(lit(1)).as("n__"), avg(when(dlc > 0, dlc)).as("avgdl__")) ++
        qterms.map(t => count(when(array_contains(col("toks"), t), 1))
          .as(s"df_$t"))
    val stats = ta.agg(statAggs.head, statAggs.tail: _*)
    val wide = ta.select(col("doc_id") +: dlc.as("dl") +: tf: _*)
      .where(qterms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
    val score = qterms.map { t =>
      val idf = log(lit(1.0) +
        (col("n__").cast("double") - col(s"df_$t") + lit(0.5)) /
          (col(s"df_$t") + lit(0.5)))
      when(col(s"tf_$t") > 0,
        idf * (col(s"tf_$t") * (lit(k1) + 1)) /
          (col(s"tf_$t") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / col("avgdl__"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    wide.select(col("doc_id"), fp(score).as("score_fp"))
      .orderBy(desc("score_fp"), asc("doc_id")).limit(20)
  }

  /** adjacent word-pair table (word_pair_proximity prox=1 analogue).
    * Pairs come straight out of the per-doc token array — map-side, no
    * window shuffle; the only shuffle is the pair-keyed aggregation. */
  def qWordPairs(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    // pairs de-duplicated PER DOC in the array (each (doc, pair) emitted
    // once), so the aggregation is a plain count with map-side partial
    // combine — countDistinct(doc_id) needed a second exchange
    val pairs = tokArrays(spark, dir).select(col("doc_id"),
      explode(when(size(toks) >= 2,
        array_distinct(transform(sequence(lit(0), size(toks) - 2),
          i => struct(toks(i).as("w1"), toks(i + 1).as("w2")))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
    pairs.select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("df"))
      // 20, not 50: the correctness gate runs at sf0.01 (500 docs), where
      // no pair reaches df 50 — a 0-row oracle match is vacuous
      .where(col("df") >= 20)
      .orderBy("w1", "w2")
  }

  /** 2-char prefix posting counts (word_prefix_docids shape). Prefixes
    * de-duplicate per doc in the array (same pattern as qWordDocids), so
    * the aggregation is a map-side-combining count, not countDistinct. */
  def qPrefixDocids(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .select(col("doc_id"), explode(array_distinct(
        transform(col("toks"), w => substring(w, 1, 2)))).as("prefix"))
      .groupBy("prefix").agg(count(lit(1)).as("df"))
      .orderBy("prefix")

  // ========================================================= facets/filter

  /** facet distribution (FacetDistribution analogue). */
  def qFacetDistribution(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy("lang", "source")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "source")

  /** numeric range + IN filter (Filter::evaluate analogue). */
  def qFilterRange(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .where(col("n_chars").between(200, 400) && col("lang").isin("en", "fr"))
      .select("doc_id").orderBy("doc_id")

  /** facet sort (asc_desc criterion analogue). */
  def qSortFacet(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("n_chars"))
      .orderBy(desc("n_chars"), asc("doc_id")).limit(100)

  /** distinct-on-facet: first doc per source value in docid order
    * (FacetDistinct analogue). */
  def qDistinctSource(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy("source").agg(min("doc_id").as("doc_id"))
      .orderBy("source")

  // ========================================================== relational

  /** TPC-H Q1-shape aggregation over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      // per-row fixed-point then exact integer sums: double-summation order
      // differs between engines, integer arithmetic doesn't
      .agg(sum(round(col("l_quantity") * 1e6).cast("long")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1e6).cast("long"))
          .cast("long").as("sum_revenue"),
        sum(round(col("l_discount") * 1e6).cast("long")).cast("long").as("sum_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** broadcast join chain: revenue per nation. */
  def qJoinNationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = tbl(spark, dir, "customer")
    val o = tbl(spark, dir, "orders")
    val n = tbl(spark, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(round(col("o_totalprice") * 1e6).cast("long")).cast("long").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** window fn: each customer's first order — expressed as min(struct)
    * so the aggregation partially combines map-side; the row_number
    * window shape shuffled every order row before discarding all but one
    * per customer (struct ordering = the window's (o_orderdate,
    * o_orderkey) lexicographic order, so the kept row is identical). */
  def qWindowFirstOrder(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("f"))
      .select(col("o_custkey"), col("f.o_orderkey").as("o_orderkey"))
      .orderBy("o_custkey")

  /** top-k (TakeOrderedAndProject). */
  def qTopkLineitem(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), fp(col("l_extendedprice")).as("price_fp"))
      .orderBy(desc("price_fp"), asc("l_orderkey"), asc("l_linenumber")).limit(20)

  // ============================================== dedup / similarity ops

  /** exact dedup: content-hash groups with >1 member. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    // hash the first 50 chars, not the full text: the sf0.01 gate corpus
    // has zero full-text duplicates, which made this oracle a vacuous
    // empty-vs-empty match (full-text exact dedup stays spec-tested on
    // planted clones in PipelineSpec) — the groupBy-dedup mechanics under
    // test are identical either way
    docs(spark, dir).select(col("doc_id"),
        md5(substring(col("text"), 1, 50)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"),
        min("doc_id").as("keep_doc"), max("doc_id").as("max_doc"))
      .where(col("cnt") > 1)
      .orderBy("h")

  /** stable 60-bit hash both systems compute identically:
    * first 15 hex chars of md5. */
  private def md5long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 3-token shingles per doc — array-derived (no window), de-duplicated
    * PER DOC with `array_distinct` before the explode (the rows are
    * per-(doc, shingle) distinct either way, but the old global
    * `.distinct()` was a full shuffle of every shingle occurrence), cached
    * (three dedup queries share it). */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingles") {
      val toks = col("toks")
      tokArrays(spark, dir).select(col("doc_id"),
        explode(when(size(toks) >= 3,
          array_distinct(transform(sequence(lit(0), size(toks) - 3),
            i => concat_ws(" ", toks(i), toks(i + 1), toks(i + 2)))))
          .otherwise(array().cast("array<string>"))).as("shingle"))
    }

  /** per-doc distinct-shingle counts, cached — shared by the LSH verify
    * and n-gram Jaccard queries (each previously re-aggregated it, twice
    * in the Jaccard case). */
  private def shingleSizes(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingle-sizes") {
      shingles(spark, dir).groupBy("doc_id").agg(count(lit(1)).as("n"))
    }

  /** unsorted MinHash signatures, persisted once per (session, dir) — the
    * oracle-only global sort of [[qDedupMinhash]] must never be what the
    * banding pipeline materializes (persist is an optimizer barrier, so a
    * cached sorted frame cannot have its sort elided under the joins). */
  private def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "minhash-sig") {
      val sh = shingles(spark, dir)
      val mh = (0 until 4).map(j =>
        min(md5long(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j"))
      sh.groupBy("doc_id").agg(mh.head, mh.tail: _*)
    }

  /** MinHash signatures (4 seeds) over 3-token shingles. */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashSignatures(spark, dir).orderBy("doc_id")

  /** LSH banding: candidate pairs sharing any minhash band, verified with
    * exact shingle-Jaccard ≥ 0.5. The minhash→band→bucket-join→verify
    * pipeline of a web-scale near-dup stage. */
  def qLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    // one map-side posexplode instead of a 4-way unionAll (4 passes over
    // the signature cache → 1)
    val bands = sig.select(col("doc_id"),
      posexplode(array(col("mh0"), col("mh1"), col("mh2"), col("mh3")))
        .as(Seq("band", "h")))
    // the candidate-pair table is the small decision table of the
    // pipeline: persist it once (keyed like the other shared frames) so
    // the verify join and the size joins don't re-run the band self-join
    val cand = cached(spark, dir, "lsh-cand") {
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    }
    // the shingle table is joined twice below; a manual candidate-id
    // pre-filter measured SLOWER here (the broadcast build + a second
    // evaluation of the semi filter outweigh the row savings at bench
    // scale) — at cluster scale Spark's runtime Bloom-filter injection
    // (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default in
    // 4.x) provides exactly that pre-filter when the candidate side is
    // selective, so the clean shape stays
    val sh = shingles(spark, dir)

    val inter = cand.join(sh.as("sa"), col("da") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("db") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("ninter"))
    val sizes = shingleSizes(spark, dir)
    inter.join(sizes.as("za"), col("da") === col("za.doc_id"))
      .join(sizes.as("zb"), col("db") === col("zb.doc_id"))
      .withColumn("jac", col("ninter").cast("double") /
        (col("za.n") + col("zb.n") - col("ninter")))
      .where(col("jac") >= 0.5)
      .select(col("da"), col("db"), fp(col("jac")).as("jac_fp"))
      .orderBy("da", "db")
  }

  /** 16-bit SimHash over distinct tokens. Entirely map-side off the cached
    * token arrays: the distinct token set, the 16 ±1 bit sums and the final
    * bit assembly are array expressions per document — the old shape
    * shuffled doc×word distinct pairs and then doc×word×16 exploded rows
    * through two aggregations (integer ±1 sums are order-independent, so
    * the per-doc result is bit-identical). */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir)
      .where(size(col("toks")) > 0) // token-less docs absent, like the oracle
      .select(col("doc_id"),
        expr(
          """aggregate(
            |  transform(array_distinct(toks),
            |    w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)),
            |  array_repeat(0L, 16),
            |  (acc, h) -> transform(acc,
            |    (a, bit) -> a + if((shiftright(h, bit) & 1) = 1, 1L, -1L)),
            |  acc -> aggregate(
            |    transform(acc, (s, bit) -> if(s > 0, shiftleft(1L, bit), 0L)),
            |    0L, (a, x) -> a + x))""".stripMargin).as("simhash"))
      .orderBy("doc_id")

  /** n-gram Jaccard between consecutive doc ids (cheap exact near-dup
    * check; the planted `dup` docs at sf0.1 surface here). */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val a = sh.as("sa")
    val b = sh.withColumn("doc_id", col("doc_id") - 1).as("sb")
    val inter = a.join(b,
        col("sa.doc_id") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("sa.doc_id").as("doc_id")).agg(count(lit(1)).as("ninter"))
    val sizes = shingleSizes(spark, dir)
    val sz2 = sizes.withColumn("doc_id", col("doc_id") - 1)
      .withColumnRenamed("n", "n2")
    sizes.join(sz2, "doc_id").join(inter, Seq("doc_id"), "left")
      .withColumn("ninter", coalesce(col("ninter"), lit(0L)))
      .withColumn("jac", col("ninter").cast("double") /
        (col("n") + col("n2") - col("ninter")))
      // top-20 by similarity, not a fixed threshold: adjacent-docid pairs
      // at sf0.01 never reach jac 0.3, which made the oracle a vacuous
      // empty match; (jac_fp desc, da) is a total order (da unique), so
      // the cutoff is deterministic in both engines
      .select(col("doc_id").as("da"), (col("doc_id") + 1).as("db"),
        fp(col("jac")).as("jac_fp"))
      .orderBy(col("jac_fp").desc, col("da"))
      .limit(20)
  }

  // ------------------------------------------------------- similarity/ANN

  /** brute-force cosine top-k against the vec_id=0 embedding. */
  def qAnnCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") === 0).select("v").first().getSeq[Double](0).toArray
    val bq = spark.sparkContext.broadcast(q)
    val dot = udf((v: Seq[Double]) => {
      val qq = bq.value
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < qq.length) { d += v(i) * qq(i); na += v(i) * v(i); nb += qq(i) * qq(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    })
    e.where(col("vec_id") =!= 0)
      .select(col("vec_id"), fp(dot(col("v"))).as("cos_fp"))
      .orderBy(desc("cos_fp"), asc("vec_id")).limit(20)
  }

  /** LSH bucket per vector: 8 sign bits against md5-derived hyperplanes —
    * the bucketed scale path for ANN (brute force within bucket). */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLshBuckets(spark, dir).orderBy("vec_id")

  /** unsorted (vec_id, bucket) — internal consumers join/persist this and
    * must not pay the oracle-only global sort. */
  private def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    // plane j component d = +1 if md5long("j_d") odd else -1 — deterministic
    // in both engines.
    val planes: Array[Array[Double]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(8, 64) { (j, d) =>
        val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        val v = java.lang.Long.parseLong(hex.take(15), 16)
        if ((v & 1L) == 1L) 1.0 else -1.0
      }
    }
    val bp = spark.sparkContext.broadcast(planes)
    val bucketOf = udf((v: Seq[Double]) => {
      val ps = bp.value
      var bucket = 0L
      var j = 0
      while (j < ps.length) {
        var s = 0.0; var d = 0; while (d < v.length) { s += v(d) * ps(j)(d); d += 1 }
        if (s > 0) bucket |= (1L << j)
        j += 1
      }
      bucket
    })
    tbl(spark, dir, "embeddings")
      .select(col("vec_id"),
        bucketOf(transform(col("embedding"), x => x.cast("double"))).as("bucket"))
  }

  /** embedding-cosine near-dup: LSH-bucketed candidate pairs (same 8-bit
    * hyperplane bucket — never all-pairs) verified with exact cosine ≥
    * 0.35. The embedding twin of the minhash→band→verify text pipeline. */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the cap's logging count + the size join + both self-join
    // sides otherwise recompute the hyperplane bucketing lineage. Uses the
    // UNSORTED bucket set — persisting qAnnLsh would materialize its
    // oracle-only global sort (persist is an optimizer barrier, so
    // EliminateSorts could no longer drop it under the joins). Routed
    // through the session-keyed dfCache so repeated calls reuse ONE pinned
    // copy instead of accumulating a new persist per call (ADVICE r3).
    val buckets = cached(spark, dir, "annlsh-buckets") {
      annLshBuckets(spark, dir) // (vec_id, bucket)
    }
    val e = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val cos = udf((a: Seq[Double], b: Seq[Double]) => {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    })
    // megabucket cap (same rationale as Dedup.lshCandidatePairs): buckets
    // over 4096 members are dropped from pair generation and logged
    val maxBucket = 4096
    val sizes = buckets.groupBy("bucket").agg(count(lit(1)).as("bsz__"))
    val oversized = sizes.where(col("bsz__") > maxBucket).count()
    if (oversized > 0)
      System.err.println(s"[graft] qDedupEmbedding: dropping $oversized " +
        s"bucket(s) over $maxBucket members (megabucket cap)")
    // size gate via a bucket-partitioned window instead of a join against
    // the aggregated sizes: the window's exchange establishes exactly the
    // bucket partitioning the self-join below needs, so the gate adds no
    // extra shuffle (the old sizes join re-shuffled both inputs)
    val wb = e.join(buckets, "vec_id")
      .withColumn("bsz__", count(lit(1)).over(Window.partitionBy("bucket")))
      .where(col("bsz__") <= maxBucket)
      .drop("bsz__")
    wb.as("a").join(wb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cos(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") >= 0.35)
      .select(col("va"), col("vb"), fp(col("cos")).as("cos_fp"))
      .orderBy("va", "vb")
  }

  // --------------------------------------------------------- text analysis

  private val StopEn = Seq("the", "a", "and", "of", "to", "in", "is")

  /** naive language id: stop-token evidence vs the labeled lang column —
    * the stop-hit count is a map-side array filter over the tokenized text
    * (was an exploded-token aggregation joined back to documents). */
  def qLangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"),
          w => w.isin(StopEn.map(lit): _*))).cast("long").as("en_hits"))
      .withColumn("pred", when(col("en_hits") >= 3, lit("en")).otherwise(lit("other")))
      .orderBy("doc_id")

  /** quality scoring: length / stopword ratio / mean token length —
    * map-side array expressions per doc (shuffle-free; ±1 integer sums and
    * a single double division reproduce the aggregated values exactly). */
  def qQuality(spark: SparkSession, dir: String): DataFrame = {
    val n = size(col("toks"))
    val lenSum = aggregate(transform(col("toks"), w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val stops = size(filter(col("toks"), w => w.isin(StopEn.map(lit): _*)))
    tokArrays(spark, dir).where(n > 0)
      .select(col("doc_id"),
        n.cast("long").as("n_tokens"),
        fp(lenSum.cast("double") / n).as("avg_len_fp"),
        fp(stops.cast("double") / n).as("stop_ratio_fp"))
      .orderBy("doc_id")
  }

  /** token counting: whitespace split vs alnum-run tokens. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= ""))
          .cast("long").as("re_tokens"))
      .orderBy("doc_id")

  /** order-sensitive document fingerprint: xor of position-salted token
    * hashes (rolling-hash analogue, exactly reproducible in SQL) — the
    * xor folds map-side over the token array (xor is order-independent,
    * so the per-doc value is identical to the old shuffled bit_xor). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    tokArrays(spark, dir).where(size(col("toks")) > 0)
      .select(col("doc_id"),
        aggregate(
          transform(col("toks"), (w, i) =>
            md5long(concat(w, lit("@"), (i + 1).cast("string")))),
          lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp"))
      .orderBy("doc_id")

  /** multimodal plumbing: opaque binary column + typed metadata. The
    * "decode" is a deterministic stub (hex head) — the schema/partition/
    * batch shape is the real part (no media libs in this container). */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .select(col("doc_id"),
        octet_length(col("blob")).cast("long").as("nbytes"),
        lower(hex(substring(col("blob"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")

  // ------------------------------------------------------------ streaming

  /** sessionization (30-min gap) as a batch job — the
    * mapGroupsWithState logic in oracle-checkable form. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.withColumn("prev", lag("ts", 1).over(w))
      .withColumn("newsess",
        when(col("prev").isNull ||
          unix_timestamp(col("ts").cast("timestamp")) -
            unix_timestamp(col("prev").cast("timestamp")) > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("newsess").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** incremental merge: two half-corpus indexes unioned and re-merged must
    * equal the full index (TypedChunk merge semantics). */
  def qIncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    // one pass instead of two half-corpus scans unioned: per-doc distinct
    // words come from the array (each (doc, word) emitted once, so the
    // per-half df is a plain map-side-combining count), the half id rides
    // along as a grouping key, and the halves merge exactly like the old
    // unionAll (sum over halves)
    tokArrays(spark, dir)
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("word"))
      .groupBy(col("word"), (col("doc_id") % 2).as("half__"))
      .agg(count(lit(1)).as("df"))
      .groupBy("word").agg(sum("df").cast("long").as("df"))
      .orderBy("word")
  }
}
