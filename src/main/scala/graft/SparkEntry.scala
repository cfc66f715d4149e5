package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY.md §2 operator families (inverted index, set
  * algebra, phrase/prefix/typo search, BM25 top-k, facets, filters, sort,
  * distinct, relational joins/windows/top-k) plus the training-data
  * pipeline operators (dedup family, ANN, text analysis, multimodal
  * plumbing, sessionization). Each has an exact DuckDB oracle in
  * [[SparkEntry.oracleSql]]; conventions documented on [[Queries]].
  */
object SparkEntry {

  /** Flagship query on sf=0.001: BM25 top-k over the documents corpus. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qBm25(spark, "/root/testdata/sf0.001")

  private val prebuilt = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Battery setup: build the engine-gate index (the shared fixture behind
    * the five q_engine_* queries) BEFORE the timed query loop, exactly as
    * the round-5 verdict prescribes ("prebuild in the battery setup, keep
    * the idxCache") — q_engine_bm25 is alphabetically first of the five and
    * silently carried the whole one-time `IndexBuilder.build` (~20 s of the
    * r5 driver battery), distorting every battery comparison. The build is
    * NOT cached across runs: it recomputes from `documents.parquet` on
    * every bench invocation, in the same JVM/session, via the same
    * `EngineQueries.index` idxCache the queries share within a run; only
    * the ATTRIBUTION moves (setup, not the first query). Its duration is
    * reported explicitly (stderr + bench_setup.json) since the frozen
    * Bench JSON cannot carry a new field. Gated on the bench's own session
    * (appName `graft-bench*`) so Verify/correctness runs are untouched. */
  private def prebuildForBench(): Unit =
    try SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach { s =>
        if (s.sparkContext.appName.startsWith("graft-bench")) {
          val sfDir =
            sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
          if (new java.io.File(s"$sfDir/documents.parquet").exists() &&
              prebuilt.compareAndSet(false, true)) {
            val t0 = System.nanoTime()
            EngineQueries.index(s, sfDir)
            val sec = (System.nanoTime() - t0) / 1e9
            System.err.println(
              f"[bench-setup] engine_gate_build_sec=$sec%.3f sf=$sfDir")
            try java.nio.file.Files.writeString(
              java.nio.file.Paths.get("bench_setup.json"),
              "{\"engine_gate_build_sec\":" + f"$sec%.3f" +
                ",\"sf\":\"" + sfDir + "\"}\n")
            catch { case _: Throwable => () }
          }
        }
      }
    catch { case e: Throwable =>
      System.err.println(s"[bench-setup] prebuild skipped: ${e.getMessage}")
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    prebuildForBench()
    queryMap
  }

  /** The raw name → fn map with NO setup side effects (tools that only
    * enumerate or explain plans use this; the bench path goes through
    * [[queries]] so battery setup runs the engine-gate prebuild). */
  private[graft] val queryMap: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_word_docids" -> (Queries.qWordDocids _),
    "q_doc_stats" -> (Queries.qDocStats _),
    "q_term_stats" -> (Queries.qTermStats _),
    "q_search_and" -> (Queries.qSearchAnd _),
    "q_search_or" -> (Queries.qSearchOr _),
    "q_search_not" -> (Queries.qSearchNot _),
    "q_search_phrase" -> (Queries.qSearchPhrase _),
    "q_search_prefix" -> (Queries.qSearchPrefix _),
    "q_search_typo" -> (Queries.qSearchTypo _),
    "q_bm25" -> (Queries.qBm25 _),
    "q_word_pairs" -> (Queries.qWordPairs _),
    "q_prefix_docids" -> (Queries.qPrefixDocids _),
    "q_facet_distribution" -> (Queries.qFacetDistribution _),
    "q_filter_range" -> (Queries.qFilterRange _),
    "q_sort_facet" -> (Queries.qSortFacet _),
    "q_distinct_source" -> (Queries.qDistinctSource _),
    "q1_agg" -> (Queries.q1Agg _),
    "q_join_nation_revenue" -> (Queries.qJoinNationRevenue _),
    "q_window_first_order" -> (Queries.qWindowFirstOrder _),
    "q_topk_lineitem" -> (Queries.qTopkLineitem _),
    "q_dedup_exact" -> (Queries.qDedupExact _),
    "q_dedup_minhash" -> (Queries.qDedupMinhash _),
    "q_lsh_pairs" -> (Queries.qLshPairs _),
    "q_dedup_simhash" -> (Queries.qDedupSimhash _),
    "q_ngram_jaccard" -> (Queries.qNgramJaccard _),
    "q_ann_cosine" -> (Queries.qAnnCosine _),
    "q_ann_lsh" -> (Queries.qAnnLsh _),
    "q_lang_id" -> (Queries.qLangId _),
    "q_quality" -> (Queries.qQuality _),
    "q_token_count" -> (Queries.qTokenCount _),
    "q_fingerprint" -> (Queries.qFingerprint _),
    "q_multimodal_meta" -> (Queries.qMultimodalMeta _),
    "q_multimodal_decode" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Multimodal.decodeQuery(
        s, s.read.parquet(s"$dir/documents.parquet"), "doc_id")),
    "q_multimodal_audio" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Multimodal.decodeAudioQuery(
        s, s.read.parquet(s"$dir/documents.parquet"), "doc_id")),
    "q_dedup_embedding" -> (Queries.qDedupEmbedding _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_incremental_merge" -> (Queries.qIncrementalMerge _),
    // production-engine gates: IndexBuilder → Search / Bm25 over a real
    // index built from documents.parquet (EngineQueries)
    "q_engine_search_sort" -> (EngineQueries.qEngineSearchSort _),
    "q_engine_candidates" -> (EngineQueries.qEngineCandidates _),
    "q_engine_prefix" -> (EngineQueries.qEnginePrefix _),
    "q_engine_bm25" -> (EngineQueries.qEngineBm25 _),
    "q_engine_geo" -> (EngineQueries.qEngineGeo _)
  )

  /** Shared tokenizer CTE (identical semantics to [[Queries.tokens]]). */
  private val TOK =
    """WITH raw AS (
      |  SELECT doc_id,
      |         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w,
      |         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS rawpos
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, w AS word,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
      |  FROM raw WHERE w <> '')""".stripMargin

  private val SHINGLES =
    TOK + """,
      |sh0 AS (
      |  SELECT doc_id, word,
      |         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
      |         lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
      |  FROM tok),
      |sh AS (
      |  SELECT DISTINCT doc_id, word || ' ' || w2 || ' ' || w3 AS shingle
      |  FROM sh0 WHERE w3 IS NOT NULL)""".stripMargin

  private def fp(x: String) = s"CAST(FLOOR(($x) * 1e6 + 0.5) AS BIGINT)"
  private def md5long(x: String) = s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    "q_word_docids" ->
      s"""$TOK SELECT word, count(DISTINCT doc_id) AS df, min(doc_id) AS min_docid,
         | max(doc_id) AS max_docid FROM tok GROUP BY word ORDER BY word""".stripMargin,

    "q_doc_stats" ->
      s"""$TOK SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
         | FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_term_stats" ->
      s"""$TOK SELECT word, count(DISTINCT doc_id) AS df, count(*) AS cf
         | FROM tok GROUP BY word ORDER BY cf DESC, word""".stripMargin,

    "q_search_and" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tok WHERE word = 'spark'
         | AND doc_id IN (SELECT doc_id FROM tok WHERE word = 'merge')
         | ORDER BY doc_id""".stripMargin,

    "q_search_or" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tok WHERE word IN ('spark', 'stream')
         | ORDER BY doc_id""".stripMargin,

    "q_search_not" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tok WHERE word = 'spark'
         | AND doc_id NOT IN (SELECT doc_id FROM tok WHERE word = 'merge')
         | ORDER BY doc_id""".stripMargin,

    "q_search_phrase" ->
      s"""$TOK SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
         | ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         | WHERE a.word = 'data' AND b.word = 'spark' ORDER BY a.doc_id""".stripMargin,

    "q_search_prefix" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tok WHERE word LIKE 'st%'
         | ORDER BY doc_id""".stripMargin,

    "q_search_typo" ->
      s"""$TOK SELECT DISTINCT doc_id FROM tok
         | WHERE substr(word, 1, 1) = 's' AND damerau_levenshtein('spakr', word) <= 1
         | ORDER BY doc_id""".stripMargin,

    "q_bm25" ->
      s"""$TOK,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
         |                 (SELECT avg(dl) FROM dl) AS avgdl),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
         |       WHERE word IN ('spark', 'merge') GROUP BY doc_id, word),
         |dft AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |scored AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
         |             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score
         |  FROM tf JOIN dft USING (word) JOIN dl USING (doc_id), stats
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, ${fp("score")} AS score_fp FROM scored
         |ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin,

    "q_word_pairs" ->
      s"""$TOK, pairs AS (
         |  SELECT doc_id, word AS w1,
         |         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         |  FROM tok)
         |SELECT w1, w2, count(DISTINCT doc_id) AS df FROM pairs
         |WHERE w2 IS NOT NULL GROUP BY w1, w2 HAVING count(DISTINCT doc_id) >= 20
         |ORDER BY w1, w2""".stripMargin,

    "q_prefix_docids" ->
      s"""$TOK SELECT substr(word, 1, 2) AS prefix, count(DISTINCT doc_id) AS df
         | FROM tok GROUP BY 1 ORDER BY prefix""".stripMargin,

    "q_facet_distribution" ->
      """SELECT lang, source, count(*) AS cnt FROM documents
        | GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_filter_range" ->
      """SELECT doc_id FROM documents
        | WHERE n_chars BETWEEN 200 AND 400 AND lang IN ('en', 'fr')
        | ORDER BY doc_id""".stripMargin,

    "q_sort_facet" ->
      """SELECT doc_id, n_chars FROM documents
        | ORDER BY n_chars DESC, doc_id LIMIT 100""".stripMargin,

    "q_distinct_source" ->
      """SELECT source, min(doc_id) AS doc_id FROM documents
        | GROUP BY source ORDER BY source""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS BIGINT) AS sum_qty,
         | CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)) AS BIGINT) AS sum_revenue,
         | CAST(SUM(CAST(ROUND(l_discount * 1e6) AS BIGINT)) AS BIGINT) AS sum_disc,
         | count(*) AS cnt
         | FROM lineitem GROUP BY l_returnflag, l_linestatus
         | ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_nation_revenue" ->
      s"""SELECT n_name,
         | CAST(SUM(CAST(ROUND(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS revenue,
         | count(*) AS n_orders
         | FROM orders JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window_first_order" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_topk_lineitem" ->
      s"""SELECT l_orderkey, l_linenumber, ${fp("l_extendedprice")} AS price_fp
         | FROM lineitem ORDER BY price_fp DESC, l_orderkey, l_linenumber
         | LIMIT 20""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(substr(text, 1, 50)) AS h, count(*) AS cnt,
        | min(doc_id) AS keep_doc, max(doc_id) AS max_doc FROM documents
        | GROUP BY 1 HAVING count(*) > 1 ORDER BY h""".stripMargin,

    "q_dedup_minhash" ->
      s"""$SHINGLES
         |SELECT doc_id,
         | min(${md5long("'0:' || shingle")}) AS mh0,
         | min(${md5long("'1:' || shingle")}) AS mh1,
         | min(${md5long("'2:' || shingle")}) AS mh2,
         | min(${md5long("'3:' || shingle")}) AS mh3
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_lsh_pairs" ->
      s"""$SHINGLES,
         |sig AS (SELECT doc_id,
         |  min(${md5long("'0:' || shingle")}) AS mh0,
         |  min(${md5long("'1:' || shingle")}) AS mh1,
         |  min(${md5long("'2:' || shingle")}) AS mh2,
         |  min(${md5long("'3:' || shingle")}) AS mh3
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, mh0 AS h FROM sig UNION ALL
         |  SELECT doc_id, 1, mh1 FROM sig UNION ALL
         |  SELECT doc_id, 2, mh2 FROM sig UNION ALL
         |  SELECT doc_id, 3, mh3 FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
         |inter AS (SELECT da, db, count(*) AS ninter
         |  FROM cand JOIN sh sa ON sa.doc_id = da
         |  JOIN sh sb ON sb.doc_id = db AND sb.shingle = sa.shingle
         |  GROUP BY da, db),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT da, db, ${fp("ninter * 1.0 / (za.n + zb.n - ninter)")} AS jac_fp
         |FROM inter JOIN sizes za ON za.doc_id = da JOIN sizes zb ON zb.doc_id = db
         |WHERE ninter * 1.0 / (za.n + zb.n - ninter) >= 0.5
         |ORDER BY da, db""".stripMargin,

    "q_dedup_simhash" ->
      s"""$TOK,
         |tw AS (SELECT DISTINCT doc_id, word FROM tok),
         |th AS (SELECT doc_id, ${md5long("word")} AS h FROM tw),
         |bits AS (
         |  SELECT doc_id, bit,
         |         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th, (SELECT unnest(range(16)) AS bit)
         |  GROUP BY doc_id, bit)
         |SELECT doc_id,
         |       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      s"""$SHINGLES,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT sa.doc_id, count(*) AS ninter
         |  FROM sh sa JOIN sh sb
         |  ON sb.doc_id = sa.doc_id + 1 AND sb.shingle = sa.shingle
         |  GROUP BY sa.doc_id)
         |SELECT za.doc_id AS da, za.doc_id + 1 AS db,
         |       ${fp("coalesce(ninter, 0) * 1.0 / (za.n + zb.n - coalesce(ninter, 0))")} AS jac_fp
         |FROM sizes za JOIN sizes zb ON zb.doc_id = za.doc_id + 1
         |LEFT JOIN inter ON inter.doc_id = za.doc_id
         |ORDER BY jac_fp DESC, da LIMIT 20""".stripMargin,

    "q_ann_cosine" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) * 1e6 + 0.5) AS BIGINT) AS cos_fp
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_fp DESC, vec_id LIMIT 20""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH planes AS (
         |  SELECT j, d,
         |         CASE WHEN ${md5long("CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} & 1 = 1
         |              THEN 1.0 ELSE -1.0 END AS c
         |  FROM (SELECT unnest(range(8)) AS j), (SELECT unnest(range(64)) AS d)),
         |comps AS (
         |  SELECT e.vec_id, p.j,
         |         sum(CAST(e.embedding[p.d + 1] AS DOUBLE) * p.c) AS dot
         |  FROM embeddings e, planes p GROUP BY e.vec_id, p.j)
         |SELECT vec_id,
         |       CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
         |FROM comps GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_lang_id" ->
      s"""$TOK,
         |en AS (SELECT doc_id, count(*) AS en_hits FROM tok
         |  WHERE word IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, coalesce(en.en_hits, 0) AS en_hits,
         |       CASE WHEN coalesce(en.en_hits, 0) >= 3 THEN 'en' ELSE 'other' END AS pred
         |FROM documents d LEFT JOIN en ON en.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_quality" ->
      s"""$TOK
         |SELECT doc_id, count(*) AS n_tokens,
         | ${fp("avg(length(word))")} AS avg_len_fp,
         | ${fp("sum(CASE WHEN word IN ('the','a','and','of','to','in','is') THEN 1.0 ELSE 0.0 END) / count(*)")} AS stop_ratio_fp
         |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), w -> w <> '')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      s"""$TOK
         |SELECT doc_id, bit_xor(${md5long("word || '@' || CAST(pos AS VARCHAR)")}) AS fp
         |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
        | lower(hex(encode(substr(text, 1, 8)))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    // real javax.imageio decode must recover the dimensions and solid color
    // planted in each synthetic PNG (pure doc_id arithmetic for the oracle)
    "q_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(16 + doc_id % 8 AS BIGINT) AS width,
        | CAST(12 + doc_id % 5 AS BIGINT) AS height,
        | CAST(doc_id % 256 AS BIGINT) AS mean_r,
        | CAST((doc_id * 7) % 256 AS BIGINT) AS mean_g,
        | CAST((doc_id * 13) % 256 AS BIGINT) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,

    // real javax.sound.sampled decode must recover the planted WAV format
    // and constant amplitude
    "q_multimodal_audio" ->
      """SELECT doc_id,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(200 + (doc_id % 5) * 50 AS BIGINT) AS frames,
        | CAST(doc_id % 1000 AS BIGINT) AS mean_amp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_embedding" ->
      s"""WITH planes AS (
         |  SELECT j, d,
         |         CASE WHEN ${md5long("CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} & 1 = 1
         |              THEN 1.0 ELSE -1.0 END AS c
         |  FROM (SELECT unnest(range(8)) AS j), (SELECT unnest(range(64)) AS d)),
         |comps AS (
         |  SELECT e.vec_id, p.j,
         |         sum(CAST(e.embedding[p.d + 1] AS DOUBLE) * p.c) AS dot
         |  FROM embeddings e, planes p GROUP BY e.vec_id, p.j),
         |buckets AS (
         |  SELECT vec_id,
         |         CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM comps GROUP BY vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |                                CAST(eb.embedding AS DOUBLE[])) AS cos
         |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id)
         |SELECT va, vb, ${fp("cos")} AS cos_fp FROM pairs
         |WHERE cos >= 0.35 ORDER BY va, vb""".stripMargin,

    "q_sessionize" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev IS NULL
        |                     OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_incremental_merge" ->
      s"""$TOK,
         |h1 AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok WHERE doc_id % 2 = 0 GROUP BY word),
         |h2 AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok WHERE doc_id % 2 = 1 GROUP BY word),
         |u AS (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
         |SELECT word, CAST(sum(df) AS BIGINT) AS df FROM u GROUP BY word ORDER BY word""".stripMargin,

    "q_engine_search_sort" ->
      s"""$TOK
         |SELECT CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rank,
         |       CAST(doc_id AS BIGINT) AS doc_id
         |FROM documents
         |WHERE n_chars >= 200 AND lang = 'en'
         |  AND doc_id IN (SELECT doc_id FROM tok WHERE word = 'data')
         |ORDER BY rank LIMIT 50""".stripMargin,

    "q_engine_candidates" ->
      s"""$TOK,
         |m AS (SELECT DISTINCT doc_id FROM tok WHERE word = 'data'
         |      INTERSECT
         |      SELECT DISTINCT doc_id FROM tok WHERE word = 'spark')
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       (SELECT CAST(count(*) AS BIGINT) FROM m) AS candidates
         |FROM m ORDER BY doc_id""".stripMargin,

    "q_engine_prefix" ->
      s"""$TOK,
         |m AS (SELECT DISTINCT doc_id FROM tok WHERE word LIKE 'dat%')
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       (SELECT CAST(count(*) AS BIGINT) FROM m) AS candidates
         |FROM m ORDER BY doc_id""".stripMargin,

    "q_engine_bm25" ->
      s"""$TOK,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
         |                 (SELECT avg(dl) FROM dl) AS avgdl),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
         |       WHERE word IN ('data', 'spark') GROUP BY doc_id, word),
         |dft AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |scored AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
         |             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score
         |  FROM tf JOIN dft USING (word) JOIN dl USING (doc_id), stats
         |  GROUP BY tf.doc_id)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, ${fp("score")} AS score_fp FROM scored
         |ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin,

    // same synthesized coordinates as EngineQueries.index, same haversine
    // formula as functions.GeoMath (reference milli/src/lib.rs:198-205);
    // radius picked with ≥60 km margin to the nearest doc at sf0.01 so
    // DuckDB/JVM trig ulp differences cannot flip membership
    "q_engine_geo" ->
      """WITH g AS (SELECT doc_id,
        |  ((doc_id * 7919) % 12000) / 100.0 - 60.0 AS lat,
        |  ((doc_id * 104729) % 34000) / 100.0 - 170.0 AS lng
        |  FROM documents),
        |d AS (SELECT doc_id,
        |  2.0 * 6371000.0 * atan2(
        |    sqrt(pow(sin(radians(10.0 - lat) / 2), 2) +
        |         cos(radians(lat)) * cos(radians(10.0)) *
        |         pow(sin(radians(20.0 - lng) / 2), 2)),
        |    sqrt(1.0 - (pow(sin(radians(10.0 - lat) / 2), 2) +
        |                cos(radians(lat)) * cos(radians(10.0)) *
        |                pow(sin(radians(20.0 - lng) / 2), 2)))) AS dist
        |  FROM g)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM d
        |WHERE dist <= 3000000 ORDER BY doc_id""".stripMargin
  )
}
