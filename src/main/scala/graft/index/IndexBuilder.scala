package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Proximity, Tokenizer}
import graft.functions.{GraftFunctions => F}

/** One extracted token occurrence: the row shape of the forward-index
  * shuffle (reference key `(docid, word) → positions`,
  * `/root/reference/milli/src/index.rs:108-109`). `position` is absolute:
  * `(fieldId << 16) | wordIndex`. */
final case class TokenRow(docid: Int, fid: Int, word: String, position: Int)

/** Distributed index build — the Spark re-expression of
  * `IndexDocuments::execute`
  * (`/root/reference/milli/src/update/index_documents/mod.rs:204-429`).
  *
  * The reference fans 4MiB document chunks over a rayon pool, re-sorts each
  * extractor's output with grenad external sorters, and funnels everything
  * into a single LMDB writer. Here each extractor is one DataFrame lineage
  * off a shared tokenized Dataset; the grenad sort-merge IS the Spark
  * shuffle (`repartition` + hash aggregation with partial/map-side combine),
  * and the single-writer disappears into independent parquet table commits.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - the tokenized Dataset is the only wide fan-out; everything downstream
  *    is `groupBy` with `TypedImperativeAggregate` bitmaps, so hot terms
  *    (stop-word df ≈ ndocs) arrive at reducers as ≤ #map-partitions
  *    pre-merged roaring partials, not raw postings;
  *  - all posting tables are written range-partitioned + sorted by their
  *    lookup key so parquet min/max footer pruning serves point lookups;
  *  - docids must be assigned deterministically *before* this job
  *    (independent of partition count) — see [[IndexBuilder.assignDocids]];
  *  - each table is an independent, atomic parquet commit recorded in
  *    `_graft_manifest.json` → a re-run resumes by skipping completed
  *    tables (the per-partition checkpoint unit of the north rule).
  */
class IndexBuilder(spark: SparkSession, settings: IndexSettings) extends Serializable {
  import spark.implicits._
  import IndexSettings.T

  registerOnce()
  private def registerOnce(): Unit = graft.functions.GraftFunctions.registerAll(spark)

  private val fieldIds: Map[String, Int] =
    settings.searchableFields.zipWithIndex.toMap
  private val exactFids: Set[Int] =
    settings.exactAttributes.flatMap(fieldIds.get)

  /** Deterministic dense docid assignment: dense rank of the primary key.
    * Independent of input partitioning/parallelism (north-rule determinism:
    * the same corpus at local[8] and local[32] yields identical docids).
    * Equivalent role: `AvailableDocumentsIds`
    * (`/root/reference/milli/src/update/available_documents_ids.rs`). */
  def assignDocids(docs: DataFrame, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    // row_number over a global order: acceptable as a one-time id-assignment
    // stage; at cluster scale swap for sort + zipWithIndex-style two-pass
    // (count per range partition, then offset) — same deterministic result.
    docs.withColumn("docid", (row_number().over(w) - 1).cast("int"))
  }

  /** Tokenize every searchable field of every document.
    * One `flatMap` = the reference's `extract_docid_word_positions`
    * (`extract/extract_docid_word_positions.rs:22-92`). */
  def tokenize(docs: DataFrame): Dataset[TokenRow] = {
    val fields = settings.searchableFields
    val fidOf = fieldIds
    val stop = settings.stopWords
    val cols = col("docid") +: fields.map(f => col(f).cast("string"))
    docs.select(cols: _*).flatMap { row =>
      val docid = row.getInt(0)
      fields.iterator.zipWithIndex.flatMap { case (f, i) =>
        val text = if (row.isNullAt(i + 1)) null else row.getString(i + 1)
        if (text == null) Iterator.empty
        else {
          val fid = fidOf(f)
          Tokenizer.tokenize(text).iterator
            .filterNot(t => stop.contains(t.word))
            .map(t => TokenRow(docid, fid, t.word,
              Tokenizer.absoluteFromRelative(fid, t.position)))
        }
      }
    }
  }

  /** Facet value rows derived from document columns: every value is stored
    * both as f64 (when parseable) and as a normalized string, exactly like
    * `extract_fid_docid_facet_values`
    * (`/root/reference/milli/src/update/index_documents/extract/extract_fid_docid_facet_values.rs:122-157`).
    */
  def extractFacets(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val facetFields =
      (settings.filterableFields ++ settings.sortableFields).toSeq.sorted
        .filter(docs.columns.contains)
    val numbers = facetFields.map { f =>
      // try_cast: non-numeric values simply have no number form
      // (ANSI cast would throw), matching the reference's "store as f64
      // only when parseable" rule.
      docs.select(lit(f).as("field"), col("docid"),
          expr(s"try_cast(`$f` as double)").as("value"))
        .where(col("value").isNotNull)
    }.reduceOption(_ unionAll _).getOrElse(emptyNumbers)
    val strings = facetFields.map { f =>
      docs.select(lit(f).as("field"), col("docid"),
          trim(lower(col(f).cast("string"))).as("norm"),
          col(f).cast("string").as("orig"))
        .where(col("orig").isNotNull)
    }.reduceOption(_ unionAll _).getOrElse(emptyStrings)
    val exists = facetFields.map { f =>
      docs.select(lit(f).as("field"), col("docid"))
        .where(col(f).isNotNull)
    }.reduceOption(_ unionAll _).getOrElse(emptyExists)
    (numbers, strings, exists)
  }

  private def emptyNumbers: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "field string, docid int, value double"))
  private def emptyStrings: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "field string, docid int, norm string, orig string"))
  private def emptyExists: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("field string, docid int"))

  /** Build every index table under `dir`. `docs` must already carry an
    * `docid` int column (see [[assignDocids]]). Completed tables recorded
    * in the manifest are skipped when `resume` is true.
    *
    * Facet inputs can be overridden (the milli-fixture corpus needs
    * JSON-aware extraction); by default they derive from the doc columns.
    */
  def build(
      docs: DataFrame,
      dir: String,
      resume: Boolean = true,
      facetOverride: Option[(DataFrame, DataFrame, DataFrame)] = None): Manifest = {
    val manifest = Manifest.load(dir)
    val t0 = System.nanoTime()

    def stage(name: String)(df: => DataFrame): Unit =
      if (!(resume && manifest.isDone(name, dir))) {
        val s0 = System.nanoTime()
        val out = df
        out.write.mode("overwrite").parquet(s"$dir/$name")
        val rows = spark.read.parquet(s"$dir/$name").count()
        manifest.record(name, rows, (System.nanoTime() - s0) / 1e9, dir)
      }

    stage(T.Documents) {
      docs.repartitionByRange(col("docid")).sortWithinPartitions("docid")
    }

    val tokens = tokenize(spark.read.parquet(s"$dir/${T.Documents}"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    stage(T.DocWordPositions) {
      tokens.groupBy($"docid", $"word")
        .agg(sort_array(collect_list($"position")).as("positions"))
        .repartitionByRange(col("docid"))
        .sortWithinPartitions("docid", "word")
    }

    stage(T.WordDocids) {
      // words occurring in exact_attributes fields live ONLY in
      // exact_word_docids (extract_word_docids.rs:25-88) — typo-tolerant
      // derivations never match them
      val ef = exactFids
      tokens.filter(t => !ef.contains(t.fid))
        .groupBy($"word")
        .agg(F.bitmap_or_agg($"docid").as("docids"))
        .withColumn("df", F.bitmap_cardinality($"docids"))
        .repartitionByRange(col("word"))
        .sortWithinPartitions("word")
    }

    stage(T.ExactWordDocids) {
      val ef = exactFids
      tokens.filter(t => ef.contains(t.fid))
        .groupBy($"word").agg(F.bitmap_or_agg($"docid").as("docids"))
        .repartitionByRange(col("word")).sortWithinPartitions("word")
    }

    stage(T.WordPositionDocids) {
      tokens.groupBy($"word", $"position")
        .agg(F.bitmap_or_agg($"docid").as("docids"))
        .repartitionByRange(col("word"), col("position"))
        .sortWithinPartitions("word", "position")
    }

    stage(T.FidWordCountDocids) {
      // word count = last relative position + 1, kept only when ≤ 10
      // (extract_fid_word_count_docids.rs:56-96)
      tokens.groupBy($"docid", $"fid")
        .agg((max($"position".bitwiseAND(lit(0xffff))) + 1).as("word_count"))
        .where($"word_count" <= 10)
        .groupBy($"fid", $"word_count")
        .agg(F.bitmap_or_agg($"docid").as("docids"))
    }

    stage(T.DocFidWordCounts) {
      // forward variant of #11, joined per-candidate by the exactness
      // criterion's ranking job (docid-sorted → pruned point reads)
      tokens.groupBy($"docid", $"fid")
        .agg((max($"position".bitwiseAND(lit(0xffff))) + 1).as("word_count"))
        .where($"word_count" <= 10)
        .repartitionByRange($"docid").sortWithinPartitions("docid", "fid")
    }

    stage(T.WordPairProximityDocids) {
      
      
      tokens.groupByKey(_.docid)
        .flatMapGroups { (docid, rows) =>
          IndexBuilder.pairProximities(rows).iterator.map {
            case ((w1, w2), prox) => (prox, w1, w2, docid)
          }
        }
        .toDF("prox", "w1", "w2", "docid")
        .groupBy($"prox", $"w1", $"w2")
        .agg(F.bitmap_or_agg($"docid").as("docids"))
        .repartitionByRange($"w1", $"w2", $"prox")
        .sortWithinPartitions("w1", "w2", "prox")
    }

    stage(T.TermDict) {
      // full vocabulary; exact_only marks words occurring solely in
      // exact_attributes fields (not typo-derivable)
      val ef = exactFids
      val isExact = if (ef.isEmpty) lit(false)
        else col("fid").isin(ef.toSeq.map(Integer.valueOf): _*)
      tokens.toDF().select($"word", $"docid", (!isExact).as("tolerant_occ"))
        .groupBy($"word")
        .agg(countDistinct($"docid").as("df"),
          (sum(when(col("tolerant_occ"), 1).otherwise(0)) === 0).as("exact_only"))
        .repartitionByRange(col("word")).sortWithinPartitions("word")
    }

    stage(T.PrefixDict) {
      // prefixes of length 1..=4 shared by ≥ threshold words
      // (words_prefixes_fst.rs:43-96)
      val dict = spark.read.parquet(s"$dir/${T.TermDict}")
      (1 to settings.maxPrefixLength).map { n =>
        dict.where(length($"word") > n)
          .select(substring($"word", 1, n).as("prefix"))
          .groupBy($"prefix").agg(count(lit(1)).as("n_words"))
          .where($"n_words" >= settings.prefixThreshold)
      }.reduce(_ unionAll _)
    }

    stage(T.WordPrefixDocids) {
      // equality join on generated prefixes (no startsWith range join —
      // shuffles hash-partition on prefix, skew-safe under AQE)
      val wd = spark.read.parquet(s"$dir/${T.WordDocids}")
      val pd = spark.read.parquet(s"$dir/${T.PrefixDict}")
      val exploded = wd.select($"word", $"docids",
          explode(sequence(lit(1), least(length($"word"), lit(settings.maxPrefixLength)))).as("n"))
        .select($"word".substr(lit(1), $"n").as("prefix"), $"docids")
      exploded.join(broadcast(pd.select($"prefix")), Seq("prefix"))
        .groupBy($"prefix").agg(F.bitmap_union_agg($"docids").as("docids"))
    }

    stage(T.WordPrefixPositionDocids) {
      val wp = spark.read.parquet(s"$dir/${T.WordPositionDocids}")
      val pd = spark.read.parquet(s"$dir/${T.PrefixDict}")
      val exploded = wp.select($"word", $"position", $"docids",
          explode(sequence(lit(1), least(length($"word"), lit(settings.maxPrefixLength)))).as("n"))
        .select($"word".substr(lit(1), $"n").as("prefix"), $"position", $"docids")
      exploded.join(broadcast(pd.select($"prefix")), Seq("prefix"))
        .groupBy($"prefix", $"position").agg(F.bitmap_union_agg($"docids").as("docids"))
    }

    val (fNum, fStr, fEx) = facetOverride.getOrElse(
      extractFacets(spark.read.parquet(s"$dir/${T.Documents}")))

    stage(T.DocFacetNumbers) {
      fNum.repartitionByRange($"field", $"value").sortWithinPartitions("field", "value")
    }
    stage(T.DocFacetStrings) {
      fStr.repartitionByRange($"field", $"norm").sortWithinPartitions("field", "norm")
    }
    stage(T.FacetExistsDocids) {
      fEx.groupBy($"field").agg(F.bitmap_or_agg($"docid").as("docids"))
    }

    stage(T.DocStats) {
      tokens.groupBy($"docid").agg(count(lit(1)).as("doclen"))
        .repartitionByRange($"docid").sortWithinPartitions("docid")
    }

    stage(T.PostingBlocks) {
      IndexBuilder.buildPostingBlocks(spark, tokens.toDF())
    }

    tokens.unpersist()
    manifest.finish((System.nanoTime() - t0) / 1e9, settings, dir)
    manifest
  }
}

object IndexBuilder extends Serializable {

  /** Per-document plane sweep producing min proximity (1..7) per ordered
    * word pair — a direct re-expression of
    * `document_word_positions_into_sorter`
    * (`extract_word_pair_proximity_docids.rs:85-152`): a min-heap of
    * per-word position iterators, window of 7 entries, head paired with the
    * tail, plus same-word consecutive-occurrence pairs.
    */
  def pairProximities(rows: Iterator[TokenRow]): Map[(String, String), Int] = {
    // per-word sorted position streams
    val byWord = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
    rows.foreach(r => byWord.getOrElseUpdate(r.word, mutable.ArrayBuffer.empty) += r.position)
    final case class Peeked(word: String, var position: Int, it: Iterator[Int])
    implicit val ord: Ordering[Peeked] = Ordering.by[Peeked, Int](_.position).reverse
    val heap = mutable.PriorityQueue.empty[Peeked]
    byWord.foreach { case (w, ps) =>
      val sorted = ps.sorted
      val it = sorted.iterator
      if (it.hasNext) heap.enqueue(Peeked(w, it.next(), it))
    }
    val out = mutable.HashMap.empty[(String, String), Int]
    @inline def put(k: (String, String), prox: Int): Unit =
      out.get(k) match {
        case Some(p) if p <= prox => ()
        case _                    => out(k) = prox
      }
    val window = mutable.ArrayBuffer.empty[Peeked]
    while (heap.nonEmpty) {
      window.clear()
      while (heap.nonEmpty && window.length < 7) window += heap.dequeue()
      val head = window.head
      var i = 1
      while (i < window.length) {
        val other = window(i)
        val prox = Proximity.positionsProximity(head.position, other.position)
        if (prox > 0 && prox < Proximity.MaxDistance) put((head.word, other.word), prox)
        i += 1
      }
      // push the tail back
      i = 1
      while (i < window.length) { heap.enqueue(window(i)); i += 1 }
      // advance the head within its own word stream
      if (head.it.hasNext) {
        val next = head.it.next()
        val prox = Proximity.positionsProximity(head.position, next)
        if (prox > 0 && prox < Proximity.MaxDistance) put((head.word, head.word), prox)
        head.position = next
        heap.enqueue(head)
      }
    }
    out.toMap
  }

  /** FOR-compressed posting blocks with block-max metadata (north rule):
    * tf per (word, docid), shuffled once on word, blocks built inside a
    * `mapPartitions` over word-sorted runs. */
  def buildPostingBlocks(spark: SparkSession, tokens: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tf = tokens.groupBy($"word", $"docid").agg(count(lit(1)).cast("int").as("tf"))
    val sorted = tf.repartition(col("word")).sortWithinPartitions("word", "docid")
    sorted.select($"word", $"docid", $"tf")
      .as[(String, Int, Int)]
      .mapPartitions { it =>
        new Iterator[(String, Int, Array[Byte], Int, Int, Int)] {
          private val src = it.buffered
          private val pending =
            mutable.Queue.empty[(String, Int, Array[Byte], Int, Int, Int)]
          private def refill(): Unit = {
            if (pending.isEmpty && src.hasNext) {
              val word = src.head._1
              val postings = mutable.ArrayBuffer.empty[(Int, Int)]
              while (src.hasNext && src.head._1 == word)
                postings += { val r = src.next(); (r._2, r._3) }
              graft.core.PostingBlocks.encode(postings.toArray).zipWithIndex.foreach {
                case (b, i) => pending.enqueue((word, i, b.bytes, b.maxDocid, b.maxTf, b.count))
              }
            }
          }
          override def hasNext: Boolean = { refill(); pending.nonEmpty }
          override def next(): (String, Int, Array[Byte], Int, Int, Int) = {
            refill(); pending.dequeue()
          }
        }
      }
      .toDF("word", "block_id", "bytes", "max_docid", "max_tf", "count")
      .sortWithinPartitions("word", "block_id")
  }
}
