package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap

import graft.core.Bitmaps
import graft.functions.{GraftFunctions => F}
import graft.index.IndexSettings.T

/** Index maintenance: deletes + incremental document batches.
  *
  *  - soft delete = a tombstone bitmap table subtracted at query time,
  *    exactly milli's soft-deleted documents ids
  *    (`/root/reference/milli/src/update/delete_documents.rs:22-120`,
  *    consumed at `search/mod.rs:252`);
  *  - hard delete = rewrite every posting table subtracting the bitmap and
  *    dropping empty rows (the purge loop of delete_documents.rs:121-1167);
  *  - addDocuments = index the new batch into a DELTA directory with the
  *    same pipeline, then merge table-by-table with `bitmap_union_agg` —
  *    the distributed TypedChunk merge
  *    (`/root/reference/milli/src/update/index_documents/typed_chunk.rs:45-216`).
  *    Replace semantics: docids of replaced external ids are tombstoned
  *    first (`transform.rs:141-294`).
  */
class Updates(spark: SparkSession, settings: IndexSettings) {
  import spark.implicits._

  graft.functions.GraftFunctions.registerAll(spark)

  private def deletedPath(dir: String) = s"$dir/${T.DeletedDocids}"

  def deletedBitmap(dir: String): RoaringBitmap = {
    val p = new java.io.File(deletedPath(dir))
    if (!p.exists()) new RoaringBitmap()
    else spark.read.parquet(deletedPath(dir)).select($"docids").as[Array[Byte]]
      .collect().headOption.map(Bitmaps.cboDeserialize).getOrElse(new RoaringBitmap())
  }

  /** Tombstone the given docids (idempotent, unioned with prior deletes). */
  def softDelete(dir: String, docids: Seq[Int]): RoaringBitmap = {
    val merged = Bitmaps.or(deletedBitmap(dir), Bitmaps.fromInts(docids))
    val bytes = Bitmaps.cboSerialize(merged)
    // write via temp + move for atomicity of the tiny tombstone table
    Seq(bytes).toDF("docids").coalesce(1)
      .write.mode("overwrite").parquet(deletedPath(dir))
    Manifest.recordUpdate(dir, "soft_delete", s"n=${docids.length}")
    merged
  }

  /** Purge soft-deleted docids from every posting table (bitmap tables get
    * `bitmap_and_not`; forward tables get an anti-filter), then clear the
    * tombstone. Each table rewrite is an independent atomic commit. */
  def hardDelete(dir: String): Unit = {
    val deleted = deletedBitmap(dir)
    if (deleted.isEmpty) return
    // foldable-literal operands: the tombstone set is deserialized once per
    // task by the bitmap expressions, never per row
    val delLit = lit(Bitmaps.cboSerialize(deleted))

    def rewriteBitmapTable(name: String): Unit = {
      val path = s"$dir/$name"
      if (!new java.io.File(path).exists()) return
      val df = spark.read.parquet(path)
      val out0 = df.withColumn("docids", F.bitmap_and_not($"docids", delLit))
        .where(F.bitmap_cardinality($"docids") > 0)
      // word_docids carries a materialized df column — recount it or BM25
      // idf / the gate estimates read pre-delete cardinalities
      val out = if (df.columns.contains("df"))
        out0.withColumn("df", F.bitmap_cardinality($"docids"))
      else out0
      writeOver(out, path)
    }
    def rewriteDocidTable(name: String): Unit = {
      val path = s"$dir/$name"
      if (!new java.io.File(path).exists()) return
      writeOver(spark.read.parquet(path)
        .where(!F.bitmap_contains(delLit, $"docid")), path)
    }

    Seq(T.WordDocids, T.ExactWordDocids, T.WordPrefixDocids,
      T.ExactWordPrefixDocids, T.WordPositionDocids,
      T.WordPrefixPositionDocids, T.FidWordCountDocids, T.WordPairProximityDocids,
      T.WordPrefixPairProximityDocids, T.PrefixWordPairProximityDocids,
      T.FacetExistsDocids, T.FacetNumberLevels, T.FacetStringLevels)
      .foreach(rewriteBitmapTable)
    Seq(T.Documents, T.DocWordPositions, T.DocFidWordCounts, T.DocFacetNumbers,
      T.DocFacetStrings, T.DocStats, T.GeoCells).foreach(rewriteDocidTable)
    // posting blocks: decode, filter, re-encode per word
    val pb = s"$dir/${T.PostingBlocks}"
    if (new java.io.File(pb).exists()) {
      val tf = spark.read.parquet(pb).select($"word", $"bytes")
        .as[(String, Array[Byte])]
        .flatMap { case (w, bytes) =>
          graft.core.PostingBlocks.decode(bytes).iterator.map(p => (w, p._1, p._2)) }
        .toDF("word", "docid", "tf")
        .where(!F.bitmap_contains(delLit, $"docid"))
      writeOver(IndexBuilder.buildPostingBlocksFromTf(spark, tf), pb)
    }
    // term_dict df/ttf/exact_only recounted from the PURGED forward index
    // (delete_documents.rs purges word-level metadata the same way): a
    // stale df skews BM25 idf and the serving-gate estimates. prefix_dict
    // n_words follows from the recounted dictionary.
    val dwpPath = s"$dir/${T.DocWordPositions}"
    if (new java.io.File(dwpPath).exists() &&
        new java.io.File(s"$dir/${T.TermDict}").exists()) {
      val exactFids = settings.exactAttributes.flatMap(
        settings.searchableFields.zipWithIndex.toMap.get).toSet
      writeOver(IndexBuilder.termDictFromDwp(
        spark, spark.read.parquet(dwpPath), exactFids), s"$dir/${T.TermDict}")
      if (new java.io.File(s"$dir/${T.PrefixDict}").exists())
        writeOver(new IndexBuilder(spark, settings).buildPrefixDict(dir),
          s"$dir/${T.PrefixDict}")
    }
    // clear tombstone
    Seq(Bitmaps.cboSerialize(new RoaringBitmap())).toDF("docids").coalesce(1)
      .write.mode("overwrite").parquet(deletedPath(dir))
    Manifest.recordUpdate(dir, "hard_delete", s"n=${deleted.getLongCardinality}")
  }

  /** Truncate the whole index (ClearDocuments, update/clear_documents.rs). */
  def clear(dir: String): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) {
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rec)
        f.delete()
      }
      d.listFiles().foreach(rec)
    }
  }

  /** Incremental batch: index `newDocs` (docid already assigned, disjoint
    * from or replacing existing ids) into a delta dir, then merge every
    * posting table. `replace`: existing docs with the same primary key are
    * tombstoned first. Returns the merged index dir (in place).
    *
    * After the commit, tables whose parquet file count crossed
    * `autoCompactFiles` are compacted in the same call (the Iceberg
    * auto-`rewrite_data_files` role) so `inc-` appends and touched-file
    * merge fragments can't grow file counts without bound across many
    * small batches. 0 disables (explicit `compact` / CLI only); the
    * default follows SPARK_GRAFT_AUTO_COMPACT (64 files). Amortized: a
    * batch only pays for tables it itself fragmented past the threshold,
    * and a compacted table restarts the count near 1. */
  def addDocuments(dir: String, newDocs: DataFrame, replace: Boolean = true,
      autoCompactFiles: Int = Updates.DefaultAutoCompactFiles): Unit = {
    val pk = settings.primaryKey
    // replaced ids: same primary key in the existing documents table
    if (replace && new java.io.File(s"$dir/${T.Documents}").exists() &&
        newDocs.columns.contains(pk)) {
      val existing = spark.read.parquet(s"$dir/${T.Documents}")
      if (existing.columns.contains(pk)) {
        val replaced = existing.join(newDocs.select(col(pk)), Seq(pk), "left_semi")
          .select($"docid").as[Int].collect()
        if (replaced.nonEmpty) softDelete(dir, replaced.toSeq)
      }
    }
    val delta = java.nio.file.Files.createTempDirectory("graft-delta").toString
    try addDocumentsDelta(dir, newDocs, delta, replace, autoCompactFiles)
    finally {
      // the delta index is per-batch scratch (appendTable MOVES its doc-
      // keyed files into the live dir; everything else merges by value) —
      // leaving it leaked one full delta index per incremental batch
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
        f.delete(); ()
      }
      rec(new java.io.File(delta))
      spark.catalog.refreshByPath(delta) // drop cached plans over dead files
    }
  }

  private def addDocumentsDelta(dir: String, newDocs: DataFrame,
      delta: String, replace: Boolean, autoCompactFiles: Int): Unit = {
    new IndexBuilder(spark, settings).build(newDocs, delta, resume = false)

    // word-keyed bitmap tables merge O(touched files), not O(table):
    // untouched parquet files (key ranges disjoint from the batch
    // vocabulary) carry over byte-for-byte, only overlapping files
    // re-aggregate with the delta — the Spark-file-level analogue of
    // milli writing only the touched LMDB keys (typed_chunk.rs merge).
    // `sortCols` restores each table's physical key order so footer
    // pruning keeps working on the merged output.
    def mergeBitmapTable(name: String, keys: Seq[String],
        touchKey: Option[String] = None, sortCols: Seq[String] = Nil): Unit = {
      val oldPath = s"$dir/$name"; val newPath = s"$delta/$name"
      if (!new java.io.File(newPath).exists()) return
      if (!new java.io.File(oldPath).exists()) {
        writeOver(spark.read.parquet(newPath), oldPath); return
      }
      def agg(a: DataFrame, b: DataFrame): DataFrame = {
        val u = a.select((keys :+ "docids").map(col): _*)
          .unionByName(b.select((keys :+ "docids").map(col): _*))
          .groupBy(keys.map(col): _*)
          .agg(F.bitmap_union_agg($"docids").as("docids"))
        val u2 = if (name == T.WordDocids)
          u.withColumn("df", F.bitmap_cardinality($"docids"))
        else u
        val sc = if (sortCols.nonEmpty) sortCols else keys
        u2.repartitionByRange(sc.map(col): _*)
          .sortWithinPartitions(sc.head, sc.tail: _*)
      }
      touchKey match {
        case Some(k) =>
          mergeTouchedFiles(oldPath, spark.read.parquet(newPath), k)(agg)
        case None =>
          writeOver(agg(spark.read.parquet(oldPath), spark.read.parquet(newPath)), oldPath)
      }
    }
    // doc-keyed tables only ever GAIN rows: move the delta's parquet files
    // into the live dir (O(batch), zero Spark jobs) instead of rewriting
    // the whole table per batch — at web scale the union-rewrite was
    // O(index) freight per update. Schema drift (documents may carry new
    // columns per batch) falls back to the reconciling union rewrite.
    def appendTable(name: String): Unit = {
      val oldPath = s"$dir/$name"; val newPath = s"$delta/$name"
      if (!new java.io.File(newPath).exists()) return
      if (!new java.io.File(oldPath).exists())
        writeOver(spark.read.parquet(newPath), oldPath)
      else if (!appendFiles(oldPath, newPath))
        writeOver(spark.read.parquet(oldPath)
          .unionByName(spark.read.parquet(newPath), allowMissingColumns = true), oldPath)
    }

    mergeBitmapTable(T.WordDocids, Seq("word"), touchKey = Some("word"))
    mergeBitmapTable(T.ExactWordDocids, Seq("word"), touchKey = Some("word"))
    mergeBitmapTable(T.WordPositionDocids, Seq("word", "position"),
      touchKey = Some("word"))
    // small-key tables (≤ ~10 fids × 10 counts / a handful of fields):
    // full re-aggregation is already O(small)
    mergeBitmapTable(T.FidWordCountDocids, Seq("fid", "word_count"))
    mergeBitmapTable(T.WordPairProximityDocids, Seq("prox", "w1", "w2"),
      touchKey = Some("w1"), sortCols = Seq("w1", "w2", "prox"))
    mergeBitmapTable(T.FacetExistsDocids, Seq("field"))
    Seq(T.Documents, T.DocWordPositions, T.DocFidWordCounts,
      T.DocFacetNumbers, T.DocFacetStrings, T.DocStats, T.GeoCells)
      .foreach(appendTable)
    // term_dict: recompute df by summing per-shard dfs (words disjoint by
    // doc); ttf sums the same way. `coalesce(ttf, df)` tolerates an index
    // written before the ttf column existed (≥1 occurrence per posting row
    // is the conservative floor).
    val tdOld = s"$dir/${T.TermDict}"; val tdNew = s"$delta/${T.TermDict}"
    if (new java.io.File(tdOld).exists() && new java.io.File(tdNew).exists()) {
      // touched-file merge: every existing row for a batch word lives in a
      // file whose [min,max] word interval contains it, so summing over
      // (touched ∪ delta) is exact; files for out-of-batch words carry over
      mergeTouchedFiles(tdOld, spark.read.parquet(tdNew), "word") { (a, b) =>
        a.unionByName(b, allowMissingColumns = true)
          .withColumn("ttf", coalesce(col("ttf"), $"df".cast("long")))
          .groupBy($"word")
          .agg(sum($"df").as("df"), min(when($"exact_only", 1).otherwise(0)).as("eo"),
            sum($"ttf").as("ttf"))
          .withColumn("exact_only", $"eo" === 1).drop("eo")
          .repartitionByRange(col("word")).sortWithinPartitions("word")
      }
    } else appendTable(T.TermDict)
    // posting blocks: decode + re-encode ONLY the files containing batch
    // words; the rest of the compressed index is never read (the bytes
    // column of untouched files stays on disk — at web scale the old
    // full-decode was an O(index) rewrite per batch)
    val pbOld = s"$dir/${T.PostingBlocks}"; val pbNew = s"$delta/${T.PostingBlocks}"
    if (new java.io.File(pbNew).exists()) {
      if (!new java.io.File(pbOld).exists())
        writeOver(spark.read.parquet(pbNew), pbOld)
      else {
        def toTf(df: DataFrame): DataFrame =
          df.select($"word", $"bytes").as[(String, Array[Byte])]
            .flatMap { case (w, bytes) =>
              graft.core.PostingBlocks.decode(bytes).iterator.map(p => (w, p._1, p._2)) }
            .toDF("word", "docid", "tf")
        mergeTouchedFiles(pbOld, spark.read.parquet(pbNew), "word") { (a, b) =>
          IndexBuilder.buildPostingBlocksFromTf(spark, toTf(a).unionByName(toTf(b)))
        }
      }
    }
    // derived prefix tables + facet levels refresh from the MERGED base
    // tables so incremental indexes never serve stale derived data — but
    // via the PREFIX DIFF (words_prefixes_fst.rs:43-96): only prefixes
    // under the batch's vocabulary (plus dict additions/removals) rebuild;
    // unaffected rows carry over, so a small batch into a huge index pays
    // for its own words, not the whole dictionary.
    new IndexBuilder(spark, settings)
      .refreshDerivedTablesIncremental(dir, delta, writeOver)
    Manifest.recordUpdate(dir, "add_documents", s"replace=$replace")
    if (autoCompactFiles > 0) compact(dir, maxFiles = autoCompactFiles)
  }

  /** table → canonical (leading-key-first) sort columns, as written by the
    * scratch build. Incremental appends and touched-file merges accumulate
    * files whose key ranges overlap; compaction restores one range-sorted
    * file set per table. */
  private val canonicalSort: Seq[(String, Seq[String])] = Seq(
    T.Documents -> Seq("docid"),
    T.DocWordPositions -> Seq("word", "docid"),
    T.DocFidWordCounts -> Seq("docid"),
    T.DocFacetNumbers -> Seq("field", "value"),
    T.DocFacetStrings -> Seq("field", "norm"),
    T.DocStats -> Seq("docid"),
    T.GeoCells -> Seq("cell"),
    T.WordDocids -> Seq("word"),
    T.ExactWordDocids -> Seq("word"),
    T.WordPositionDocids -> Seq("word", "position"),
    T.WordPairProximityDocids -> Seq("w1", "w2", "prox"),
    T.TermDict -> Seq("word"),
    T.PrefixDict -> Seq("prefix"),
    T.WordPrefixDocids -> Seq("prefix"),
    T.ExactWordPrefixDocids -> Seq("prefix"),
    T.WordPrefixPositionDocids -> Seq("prefix", "position"),
    T.WordPrefixPairProximityDocids -> Seq("prefix", "w1", "prox"),
    T.PrefixWordPairProximityDocids -> Seq("prefix", "w2", "prox"),
    T.FacetNumberLevels -> Seq("field", "level", "bound"),
    T.FacetStringLevels -> Seq("field", "level", "bound"))

  /** Compact tables whose parquet file count exceeds `maxFiles` back to
    * their canonical range-sorted layout (and merge posting-block
    * fragments back to full 128-entry blocks). The maintenance pass that
    * bounds file-count growth from `inc-` appends and touched-file merges
    * — the Iceberg `rewrite_data_files` role. Content-neutral; returns
    * (table, file count before) for each compacted table. */
  def compact(dir: String, maxFiles: Int = 32): Seq[(String, Int)] = {
    def fileCount(path: String): Int =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val done = Seq.newBuilder[(String, Int)]
    canonicalSort.foreach { case (name, sortCols) =>
      val path = s"$dir/$name"
      if (new java.io.File(path).exists()) {
        val n = fileCount(path)
        if (n > maxFiles) {
          writeOver(spark.read.parquet(path)
            .repartitionByRange(sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.head, sortCols.tail: _*), path)
          done += (name -> n)
        }
      }
    }
    val pb = s"$dir/${T.PostingBlocks}"
    if (new java.io.File(pb).exists()) {
      val n = fileCount(pb)
      if (n > maxFiles) {
        val tf = spark.read.parquet(pb).select($"word", $"bytes")
          .as[(String, Array[Byte])]
          .flatMap { case (w, bytes) =>
            graft.core.PostingBlocks.decode(bytes).iterator.map(p => (w, p._1, p._2)) }
          .toDF("word", "docid", "tf")
        writeOver(IndexBuilder.buildPostingBlocksFromTf(spark, tf), pb)
        done += (T.PostingBlocks -> n)
      }
    }
    val res = done.result()
    if (res.nonEmpty)
      Manifest.recordUpdate(dir, "compact", res.map(t => s"${t._1}:${t._2}").mkString(","))
    res
  }

  // file-granular maintenance (atomic swap, footer-stats touched-file
  // merge, zero-job append) lives in [[TableIO]], shared with the derived
  // prefix-table refresh
  private def writeOver(df: DataFrame, path: String): Unit =
    TableIO.writeOver(spark)(df, path)
  private def mergeTouchedFiles(
      oldPath: String, deltaDf: DataFrame, keyCol: String)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit =
    TableIO.mergeTouchedFiles(spark, oldPath, deltaDf, keyCol)(merge)
  private def appendFiles(oldPath: String, newPath: String): Boolean =
    TableIO.appendFiles(spark, oldPath, newPath)
}

object Updates {
  /** File-count threshold above which [[Updates.addDocuments]] compacts a
    * table in the same batch; SPARK_GRAFT_AUTO_COMPACT overrides, 0 turns
    * the automatic pass off. */
  val DefaultAutoCompactFiles: Int =
    sys.env.get("SPARK_GRAFT_AUTO_COMPACT").map(_.toInt).getOrElse(64)
}
