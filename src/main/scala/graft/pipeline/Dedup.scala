package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-scale deduplication operators over a (docid, text) corpus.
  *
  * All hashes derive from md5 prefixes (stable across engines/runs — the
  * same convention the DuckDB-checked [[graft.Queries]] oracles use), all
  * shuffles are keyed by hash/bucket so hot shingles spread, and every
  * stage is a plain DataFrame lineage (codegen'd, AQE-planned).
  */
object Dedup {

  /** last persisted LSH bucket set per session — bounded-persist bookkeeping
    * for [[lshCandidatePairs]] (one pinned copy per session, not per call). */
  private val lastLshBuckets =
    scala.collection.concurrent.TrieMap.empty[Int, DataFrame]

  /** 60-bit stable hash: first 15 hex chars of md5. */
  def md5long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact duplicates by content hash: (hash, cnt, keep_doc = min docid,
    * members). O(n) with one shuffle on the hash. `members` is a BOUNDED
    * sample (first `maxMembers` in docid order) — a degenerate corpus where
    * one hash covers 10^8 docs must not materialize them in one row; `cnt`
    * carries the true group size and `exactDropIds` streams the full set. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String,
      maxMembers: Int = 100): DataFrame = {
    val hashed = docs.select(col(idCol).as("docid"), md5(col(textCol)).as("h"))
    val stats = hashed.groupBy("h")
      .agg(count(lit(1)).as("cnt"), min("docid").as("keep_doc"))
      .where(col("cnt") > 1)
    // rank-limit filter → WindowGroupLimit: the per-hash sample is bounded
    // MAP-SIDE, so no aggregation buffer ever holds a whole megagroup
    val w = Window.partitionBy("h").orderBy("docid")
    val sample = hashed.withColumn("rn__", row_number().over(w))
      .where(col("rn__") <= maxMembers)
      .groupBy("h").agg(sort_array(collect_list("docid")).as("members"))
    stats.join(sample, Seq("h"))
  }

  /** The ids to DROP under keep-first exact dedup (left-anti these away). */
  def exactDropIds(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("h").orderBy("docid")
    docs.select(col(idCol).as("docid"), md5(col(textCol)).as("h"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") > 1)
      .select("docid")
  }

  /** k-token shingles (lowercased alnum tokens), distinct per doc —
    * de-duplicated IN the per-doc array before the explode, so the rows
    * are distinct by construction and the old global `.distinct()`
    * exchange over every shingle occurrence disappears (a doc's shingles
    * live on one row; dedup needs no shuffle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol).as("docid"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => w =!= "").as("toks"))
    toks.select(col("docid"),
        explode(expr(s"array_distinct(filter(transform(sequence(0, size(toks) - $k), " +
          s"i -> array_join(slice(toks, i + 1, $k), ' ')), s -> s != ''))")).as("shingle"))
  }

  /** MinHash signatures: `numHashes` seeded min-hashes over shingles.
    * One wide row per doc: (docid, sig array<long>). */
  def minhash(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val mins = (0 until numHashes).map(j =>
      min(md5long(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j"))
    sh.groupBy("docid").agg(mins.head, mins.tail: _*)
      .select(col("docid"),
        array((0 until numHashes).map(j => col(s"mh$j")): _*).as("sig"))
  }

  /** LSH banding: signature split into `bands` bands of `rows` hashes; docs
    * sharing a band-bucket become candidate pairs (da < db). The band
    * bucket join is an equality shuffle — skew-safe under AQE.
    *
    * Megabucket cap: a bucket of B members yields B² pairs, so one
    * boilerplate-identical bucket (10^6+ members in a web corpus) turns the
    * self-join quadratic. Buckets over `maxBucket` members are DROPPED from
    * pair generation (their members still pair through their other
    * `bands − 1` buckets, so recall loss is bounded to docs near-identical
    * only in one band) and the drop is logged — no silent truncation. */
  def lshCandidatePairs(sig: DataFrame, bands: Int, rows: Int,
      maxBucket: Int = 4096): DataFrame = {
    // persisted: the size count (logging action), the size join and BOTH
    // sides of the self-join otherwise each recompute the full
    // shingle→minhash→posexplode lineage (measured +43% on the sf0.1
    // battery). At most ONE bucket set stays pinned per session: a new call
    // releases the previous call's copy (ADVICE r3 — the un-released persist
    // otherwise accumulates a copy per invocation).
    val buckets = sig.select(col("docid"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"hash(slice(sig, b * $rows + 1, $rows)))")).as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.lastLshBuckets.put(System.identityHashCode(sig.sparkSession), buckets)
      .foreach(prev => if (prev ne buckets) prev.unpersist(false))
    val sizes = buckets.groupBy("band", "bucket").agg(count(lit(1)).as("bsz__"))
    val oversized = sizes.where(col("bsz__") > maxBucket).count()
    if (oversized > 0)
      System.err.println(s"[graft] lshCandidatePairs: dropping $oversized " +
        s"bucket(s) over $maxBucket members from pair generation " +
        "(megabucket cap; members still pair via their other bands)")
    val kept = buckets
      .join(sizes.where(col("bsz__") <= maxBucket).select("band", "bucket"),
        Seq("band", "bucket"))
    kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.docid") < col("b.docid"))
      .select(col("a.docid").as("da"), col("b.docid").as("db"))
      .distinct()
  }

  /** Exact shingle-Jaccard verification of candidate pairs. */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("docid").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("sa"), col("da") === col("sa.docid"))
      .join(sh.as("sb"),
        col("db") === col("sb.docid") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("ninter"))
    inter.join(sizes.as("za"), col("da") === col("za.docid"))
      .join(sizes.as("zb"), col("db") === col("zb.docid"))
      .withColumn("jaccard",
        col("ninter").cast("double") / (col("za.n") + col("zb.n") - col("ninter")))
      .where(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")
  }

  /** Full near-dup pipeline: shingle → minhash → LSH bands → verified pairs. */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleK).cache()
    val pairs = lshCandidatePairs(minhash(sh, numHashes), bands, numHashes / bands)
    verifyJaccard(pairs, sh, threshold)
  }

  /** 64-bit SimHash over distinct tokens (hamming-near docs are near-dups).
    * Bits 0-59 come from the word's md5-long; bits 60-63 from a second
    * salted hash — a true 64-bit signature. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // entirely map-side (same shape as the 16-bit battery twin): distinct
    // tokens, the 64 ±1 bit sums and the final bit assembly are array
    // expressions per document — the old pipeline shuffled doc×word
    // distinct pairs and then doc×word×64 exploded rows through two
    // aggregations; ±1 integer sums are order-independent, so the
    // signature is bit-identical
    docs.select(col(idCol).as("docid"),
      expr(
        """aggregate(
          |  transform(
          |    array_distinct(filter(split(lower(%s), '[^a-z0-9]+'), w -> w != '')),
          |    w -> struct(
          |      cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint) as h,
          |      cast(conv(substring(md5(concat('fold:', w)), 1, 15), 16, 10) as bigint) as h2)),
          |  array_repeat(0L, 64),
          |  (acc, x) -> transform(acc, (a, bit) -> a +
          |    if(((case when bit < 60 then shiftright(x.h, bit)
          |         else shiftright(x.h2, bit - 60) end) & 1) = 1, 1L, -1L)),
          |  acc -> aggregate(
          |    transform(acc, (s, bit) -> if(s > 0, shiftleft(1L, bit), 0L)),
          |    0L, (a, x) -> a + x))""".stripMargin.format(textCol)).as("simhash"))

  /** Hamming distance between simhashes (for pairing by bit-band blocks). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
