package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.search.{GraftIndex, Search, SearchRequest}
import graft.webgen.WebPages

/** Delete / incremental-add semantics: soft-deleted docs disappear from
  * results; hard delete purges tables; an incremental batch-merged index
  * answers like a from-scratch index over the union corpus. */
class UpdatesSpec extends AnyFunSuite with Matchers {

  private def freshDir() = graft.TestSpark.tempDir("graft-upd")

  test("soft delete removes docs from search; hard delete purges tables") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"))
    val dir = freshDir()
    val docs = WebPages.generate(spark, 300)
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    val updates = new Updates(spark, settings)

    val index0 = GraftIndex(spark, dir, settings)
    val before = new Search(index0)
      .execute(SearchRequest(query = Some("w3 "), limit = 300))
    before.documentsIds should not be empty

    val victim = before.documentsIds.head
    updates.softDelete(dir, Seq(victim))
    val afterSoft = new Search(GraftIndex(spark, dir, settings))
      .execute(SearchRequest(query = Some("w3 "), limit = 300))
    afterSoft.documentsIds should not contain victim
    afterSoft.documentsIds.size shouldBe before.documentsIds.size - 1

    updates.hardDelete(dir)
    updates.deletedBitmap(dir).isEmpty shouldBe true
    val wd = spark.read.parquet(s"$dir/${IndexSettings.T.DocWordPositions}")
      .where($"docid" === victim).count()
    wd shouldBe 0
    val afterHard = new Search(GraftIndex(spark, dir, settings))
      .execute(SearchRequest(query = Some("w3 "), limit = 300))
    afterHard.documentsIds shouldBe afterSoft.documentsIds

    // word-level metadata is RECOUNTED, not left stale: term_dict df/ttf
    // match a from-scratch dictionary over the remaining docs, and the
    // word_docids df column matches its own bitmap cardinality
    val scratchDir = freshDir()
    new IndexBuilder(spark, settings)
      .build(docs.where($"docid" =!= victim), scratchDir, resume = false)
    def dict(d: String): Map[String, (Long, Long)] =
      spark.read.parquet(s"$d/${IndexSettings.T.TermDict}")
        .select($"word", $"df".cast("long"), $"ttf".cast("long"))
        .as[(String, Long, Long)].collect()
        .map { case (w, df, ttf) => w -> (df, ttf) }.toMap
    val recounted = dict(dir); val scratch = dict(scratchDir)
    val diffs = (recounted.keySet ++ scratch.keySet).toSeq
      .filter(k => recounted.get(k) != scratch.get(k)).sorted
    withClue(s"${diffs.size} differing words, first 10: " +
        diffs.take(10).map(k =>
          s"$k recounted=${recounted.get(k)} scratch=${scratch.get(k)}").mkString("; ")) {
      diffs shouldBe empty
    }
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$dir/${IndexSettings.T.WordDocids}")
      .where($"df" =!= org.apache.spark.sql.functions.expr(
        "bitmap_cardinality(docids)"))
      .count() shouldBe 0
  }

  test("incremental add-documents merge equals from-scratch build") {
    val spark = TestSpark.spark
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val all = WebPages.generate(spark, 400).cache()
    val first = all.where(org.apache.spark.sql.functions.col("docid") < 200)
    val second = all.where(org.apache.spark.sql.functions.col("docid") >= 200)

    val incDir = freshDir()
    new IndexBuilder(spark, settings).build(first, incDir, resume = false)
    new Updates(spark, settings).addDocuments(incDir, second)

    val fullDir = freshDir()
    new IndexBuilder(spark, settings).build(all, fullDir, resume = false)

    val qInc = new Search(GraftIndex(spark, incDir, settings))
      .execute(SearchRequest(query = Some("w2 w7"), limit = 50))
    val qFull = new Search(GraftIndex(spark, fullDir, settings))
      .execute(SearchRequest(query = Some("w2 w7"), limit = 50))
    qInc.documentsIds shouldBe qFull.documentsIds
    qInc.candidates shouldBe qFull.candidates

    // BM25 agrees too (term_dict dfs + posting blocks merged correctly)
    val bmInc = new graft.search.Bm25(GraftIndex(spark, incDir, settings))
      .topK(Seq("w2", "w7"), 10)
    val bmFull = new graft.search.Bm25(GraftIndex(spark, fullDir, settings))
      .topK(Seq("w2", "w7"), 10)
    bmInc.map(_._1).toSeq shouldBe bmFull.map(_._1).toSeq
    bmInc.zip(bmFull).foreach { case ((_, a), (_, b)) => a shouldBe b +- 1e-9 }

    // EVERY table is identical — including the derived prefix tables and
    // facet level trees refreshed after the merge (stale derived data is
    // the incremental-index time bomb)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws}
    val tables = new java.io.File(fullDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq
    def canon(dir: String, t: String): Seq[String] = {
      val df = spark.read.parquet(s"$dir/$t")
      // posting_blocks: physical block fragmentation depends on the salted
      // (word, docid) range boundaries — partitioning-dependent by design
      // (hot-word skew split) — so compare the DECODED logical postings
      if (t == IndexSettings.T.PostingBlocks)
        return df.select($"word", $"bytes").as[(String, Array[Byte])]
          .flatMap { case (w, b) =>
            graft.core.PostingBlocks.decode(b).iterator.map(p => s"$w|${p._1}|${p._2}") }
          .collect().sorted.toSeq
      val cols = df.schema.fields.sortBy(_.name).map { f =>
        val c = col(f.name)
        f.name match {
          case "docids" => graft.functions.GraftFunctions.bitmap_to_array(c).cast("string")
          case _ if f.dataType == org.apache.spark.sql.types.BinaryType =>
            org.apache.spark.sql.functions.hex(c)
          case _ => c.cast("string")
        }
      }
      df.select(concat_ws("|", cols.toSeq: _*)).as[String].collect().sorted.toSeq
    }
    tables.foreach { t =>
      withClue(s"table $t: ") { canon(incDir, t) shouldBe canon(fullDir, t) }
    }
  }

  test("incremental merge is O(touched): out-of-range files carry over " +
      "by name; doc tables append files instead of rewriting") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = freshDir()
    // pin partitions so word_docids spans several word-ranged files
    val oldParts = spark.conf.get("spark.sql.shuffle.partitions")
    val oldCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      new IndexBuilder(spark, settings)
        .build(WebPages.generate(spark, 500), dir, resume = false)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", oldParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldCoalesce)
    }
    def parts(t: String): Set[String] =
      new java.io.File(s"$dir/$t").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getName).toSet
    val wdBefore = parts(IndexSettings.T.WordDocids)
    val docsBefore = parts(IndexSettings.T.Documents)
    wdBefore.size should be > 2
    // batch whose vocabulary sorts AFTER the whole corpus ('zz…'): only
    // the last word-range file may be touched
    val batch = WebPages.generate(spark, 510)
      .where($"docid" >= 500)
      .withColumn("text", org.apache.spark.sql.functions.lit("zzunique zzword"))
    new Updates(spark, settings).addDocuments(dir, batch)
    val wdAfter = parts(IndexSettings.T.WordDocids)
    val docsAfter = parts(IndexSettings.T.Documents)
    // word_docids: all but at most one original file survive UNTOUCHED
    (wdBefore -- wdAfter).size should be <= 1
    // documents: strictly appended — every original file still present,
    // new rows arrived as inc- files
    (docsBefore -- docsAfter) shouldBe empty
    (docsAfter -- docsBefore).foreach(_ should startWith("inc-"))
    (docsAfter -- docsBefore) should not be empty
    // and the merged index answers over both corpora
    val idx = GraftIndex(spark, dir, settings)
    val res = new Search(idx).execute(
      SearchRequest(query = Some("zzunique "), limit = 20))
    res.candidates shouldBe 10
    val old = new Search(idx).execute(
      SearchRequest(query = Some("w3 "), limit = 20))
    old.candidates should be > 0L
  }

  test("facet level refresh is O(touched fields): untouched fields' files " +
      "carry over by name; reader parity holds after the merge") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val settings = IndexSettings(searchableFields = Seq("text"),
      filterableFields = Set("price", "score"), primaryKey = "url")
    val dir = freshDir()
    def docs(from: Int, n: Int, withScore: Boolean) =
      spark.range(from, from + n).select(
        $"id".cast("int").as("docid"),
        concat(lit("https://x/p"), $"id").as("url"),
        concat(lit("w"), $"id" % 37).as("text"),
        ($"id" * 1.0).as("price"),
        (if (withScore) ($"id" * 2.0).cast("double")
         else lit(null).cast("double")).as("score"))
    def parts(t: String): Set[String] =
      new java.io.File(s"$dir/$t").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val oldParts = spark.conf.get("spark.sql.shuffle.partitions")
    val oldCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // level-table partitioning is data-derived (one file for a tree this
      // small); shrink the per-file row target so the carry-over fixture
      // still gets the multi-file layout it exercises
      spark.conf.set("spark.graft.facetLevels.rowsPerFile", "64")
      new IndexBuilder(spark, settings)
        .build(docs(0, 200, withScore = true), dir, resume = false)
      val before = parts(IndexSettings.T.FacetNumberLevels)
      before.size should be > 2
      // the batch facets only `price` (score all-null): level files whose
      // field interval is entirely `score` must carry over BY NAME
      new Updates(spark, settings).addDocuments(dir, docs(1000, 20, withScore = false))
      val after = parts(IndexSettings.T.FacetNumberLevels)
      (before intersect after).size should be > 0
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", oldParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldCoalesce)
      spark.conf.unset("spark.graft.facetLevels.rowsPerFile")
    }
    val idx = GraftIndex(spark, dir, settings)
    def brute(field: String, lo: Double, hi: Double): Set[Int] =
      spark.read.parquet(s"$dir/${IndexSettings.T.DocFacetNumbers}")
        .where($"field" === field && $"value" >= lo && $"value" <= hi)
        .select($"docid").as[Int].collect().toSet
    def via(field: String, lo: Double, hi: Double): Set[Int] =
      graft.search.FacetLevels.rangeDocids(idx, numeric = true, field,
        Some(lo), Some(hi), loIncl = true, hiIncl = true)
        .map(_.docids.toArray.toSet)
        .getOrElse(fail(s"no level tree for $field"))
    via("score", 100.0, 250.0) shouldBe brute("score", 100.0, 250.0)
    via("price", 150.0, 5000.0) shouldBe brute("price", 150.0, 5000.0)
  }

  test("compact restores canonical layout without changing content") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = freshDir()
    val all = WebPages.generate(spark, 360).cache()
    new IndexBuilder(spark, settings)
      .build(all.where($"docid" < 300), dir, resume = false)
    val updates = new Updates(spark, settings)
    updates.addDocuments(dir, all.where($"docid" >= 300 && $"docid" < 330))
    updates.addDocuments(dir, all.where($"docid" >= 330))

    def snapshot(t: String): Seq[String] = {
      val df = spark.read.parquet(s"$dir/$t")
      if (t == IndexSettings.T.PostingBlocks)
        df.select($"word", $"bytes").as[(String, Array[Byte])]
          .flatMap { case (w, b) =>
            graft.core.PostingBlocks.decode(b).iterator.map(p => s"$w|${p._1}|${p._2}") }
          .collect().sorted.toSeq
      else {
        graft.functions.GraftFunctions.registerAll(spark)
        val cols = df.schema.fields.sortBy(_.name).map { f =>
          if (f.name == "docids")
            org.apache.spark.sql.functions.expr("cast(bitmap_to_array(docids) as string)")
          else col(f.name).cast("string")
        }
        df.select(org.apache.spark.sql.functions.concat_ws("|", cols.toSeq: _*))
          .as[String].collect().sorted.toSeq
      }
    }
    val watched = Seq(IndexSettings.T.Documents, IndexSettings.T.WordDocids,
      IndexSettings.T.TermDict, IndexSettings.T.PostingBlocks,
      IndexSettings.T.DocWordPositions)
    val before = watched.map(t => t -> snapshot(t)).toMap
    def files(t: String): Int =
      new java.io.File(s"$dir/$t").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val docFilesBefore = files(IndexSettings.T.Documents)
    docFilesBefore should be > 2 // two appended batches left inc- files

    val compacted = updates.compact(dir, maxFiles = 0)
    compacted.map(_._1) should contain(IndexSettings.T.Documents)
    watched.foreach { t =>
      withClue(s"table $t after compact: ") { snapshot(t) shouldBe before(t) }
    }
    files(IndexSettings.T.Documents) should be <= docFilesBefore
    // and the index still answers
    val res = new Search(GraftIndex(spark, dir, settings))
      .execute(SearchRequest(query = Some("w3 "), limit = 20))
    res.candidates should be > 0L
  }

  test("addDocuments auto-compacts tables past the file threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = freshDir()
    val all = WebPages.generate(spark, 340).cache()
    new IndexBuilder(spark, settings)
      .build(all.where($"docid" < 300), dir, resume = false)
    val updates = new Updates(spark, settings)
    def files(t: String): Int =
      new java.io.File(s"$dir/$t").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    // grow the documents table past a tiny threshold with appended batches
    updates.addDocuments(dir, all.where($"docid" >= 300 && $"docid" < 310),
      autoCompactFiles = 0)
    updates.addDocuments(dir, all.where($"docid" >= 310 && $"docid" < 320),
      autoCompactFiles = 0)
    val fragmented = files(IndexSettings.T.Documents)
    fragmented should be > 2
    // next batch with a threshold below the current count triggers compact
    updates.addDocuments(dir, all.where($"docid" >= 320),
      autoCompactFiles = 2)
    files(IndexSettings.T.Documents) should be <= 2
    val manifest = scala.io.Source.fromFile(s"$dir/_graft_manifest.jsonl")
    val lines = try manifest.getLines().toSeq finally manifest.close()
    lines.exists(l => l.contains("__update__") && l.contains("compact")) shouldBe true
    // the compacted index still answers with all docs present
    val res = new Search(GraftIndex(spark, dir, settings))
      .execute(SearchRequest(query = Some("w3 "), limit = 400))
    res.candidates should be > 0L
  }

  test("lifecycle soak: interleaved adds, deletes, and compaction equal a " +
      "from-scratch build over the surviving corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = freshDir()
    val all = WebPages.generate(spark, 300).cache()
    val updates = new Updates(spark, settings)
    new IndexBuilder(spark, settings)
      .build(all.where($"docid" < 180), dir, resume = false)
    updates.addDocuments(dir, all.where($"docid" >= 180 && $"docid" < 240))
    // delete a scattering of docs from both tranches, purge, keep adding
    val victims = (0 until 240).filter(_ % 17 == 3)
    updates.softDelete(dir, victims)
    updates.hardDelete(dir)
    updates.addDocuments(dir, all.where($"docid" >= 240))
    updates.compact(dir, maxFiles = 0)

    val scratchDir = freshDir()
    new IndexBuilder(spark, settings).build(
      all.where(!$"docid".isin(victims: _*)), scratchDir, resume = false)

    // word-level metadata and decoded postings must be content-identical
    graft.functions.GraftFunctions.registerAll(spark)
    def content(d: String, t: String): Seq[String] = {
      val df = spark.read.parquet(s"$d/$t")
      if (t == IndexSettings.T.PostingBlocks)
        df.select($"word", $"bytes").as[(String, Array[Byte])]
          .flatMap { case (w, b) =>
            graft.core.PostingBlocks.decode(b).iterator.map(p => s"$w|${p._1}|${p._2}") }
          .collect().sorted.toSeq
      else {
        val cols = df.schema.fields.sortBy(_.name).map { f =>
          if (f.name == "docids")
            org.apache.spark.sql.functions.expr("cast(bitmap_to_array(docids) as string)")
          else org.apache.spark.sql.functions.col(f.name).cast("string")
        }
        df.select(org.apache.spark.sql.functions.concat_ws("|", cols.toSeq: _*))
          .as[String].collect().sorted.toSeq
      }
    }
    Seq(IndexSettings.T.TermDict, IndexSettings.T.WordDocids,
        IndexSettings.T.PostingBlocks, IndexSettings.T.DocStats).foreach { t =>
      withClue(s"table $t lifecycle vs scratch: ") {
        content(dir, t) shouldBe content(scratchDir, t)
      }
    }
    // and ranked search agrees query-for-query
    val lifeIdx = GraftIndex(spark, dir, settings)
    val scratchIdx = GraftIndex(spark, scratchDir, settings)
    Seq("w3 ", "the w10 ", "w1 w2 ", "w100 ").foreach { q =>
      val a = new Search(lifeIdx).execute(SearchRequest(query = Some(q), limit = 50))
      val b = new Search(scratchIdx).execute(SearchRequest(query = Some(q), limit = 50))
      withClue(s"query '$q': ") {
        a.candidates shouldBe b.candidates
        a.documentsIds shouldBe b.documentsIds
      }
    }
  }

  test("docid assignment is identical across partition counts (two-pass, no global window)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"))
    val builder = new IndexBuilder(spark, settings)
    val docs = WebPages.generate(spark, 1000).drop("docid")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def assign(inputParts: Int, shuffleParts: Int): Map[String, Int] = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
      try builder.assignDocids(docs.repartition(inputParts), "url")
        .select($"url", $"docid").as[(String, Int)].collect().toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = assign(3, 5)
    val b = assign(17, 32)
    a shouldBe b
    // dense 0..n-1 and rank-ordered by the key
    a.values.toSeq.sorted shouldBe (0 until 1000)
    a.toSeq.sortBy(_._2).map(_._1) shouldBe a.keys.toSeq.sorted
  }

  test("replace semantics tombstone old versions of re-added primary keys") {
    val spark = TestSpark.spark
    import spark.implicits._
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = freshDir()
    val docs = WebPages.generate(spark, 100)
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    // re-add docid 5's url with new docid 100 and distinctive text
    val newDoc = docs.where($"docid" === 5)
      .withColumn("docid", org.apache.spark.sql.functions.lit(100))
      .withColumn("text", org.apache.spark.sql.functions.lit("zzzunique phrase here"))
    val updates = new Updates(spark, settings)
    updates.addDocuments(dir, newDoc, replace = true)
    updates.deletedBitmap(dir).contains(5) shouldBe true
    val r = new Search(GraftIndex(spark, dir, settings))
      .execute(SearchRequest(query = Some("zzzunique "), limit = 10))
    r.documentsIds shouldBe Seq(100)
  }
}
