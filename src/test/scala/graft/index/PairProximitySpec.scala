package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The flat-walk pair-proximity sweep must be observationally identical to
  * the line-faithful heap port of the reference's
  * `document_word_positions_into_sorter`
  * (`extract_word_pair_proximity_docids.rs:85-152`) — the fixture suites
  * pin the heap port against milli; this pins the fast path against the
  * heap port on adversarial random documents. */
class PairProximitySpec extends AnyFunSuite with Matchers {

  private def randomDoc(rng: scala.util.Random): Seq[DwpRow] = {
    val nFields = 1 + rng.nextInt(3)
    val vocab = 1 + rng.nextInt(30)
    // tokens per field: dense runs so windows overflow the 7-entry cap
    val occ = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    (0 until nFields).foreach { fid =>
      val len = rng.nextInt(60)
      var idx = 0
      (0 until len).foreach { _ =>
        // occasional gaps so some pairs fall beyond MaxDistance
        idx += 1 + (if (rng.nextInt(10) == 0) rng.nextInt(20) else 0)
        val w = s"w${rng.nextInt(vocab)}"
        occ.getOrElseUpdate(w, scala.collection.mutable.ArrayBuffer.empty) +=
          ((fid << 16) | idx)
      }
    }
    occ.toSeq.sortBy(_._1).map { case (w, ps) => DwpRow(0, w, ps.sorted.toArray) }
  }

  test("flat-walk sweep ≡ heap port on 500 random documents") {
    val rng = new scala.util.Random(20260817L)
    (0 until 500).foreach { i =>
      val doc = randomDoc(rng)
      val fast = IndexBuilder.pairProximities(doc)
      val heap = IndexBuilder.pairProximitiesHeap(doc)
      withClue(s"doc #$i (${doc.size} words): ") { fast shouldBe heap }
    }
  }

  test("hand cases: cap overflow, same-word runs, cross-attribute") {
    def doc(rows: (String, Seq[Int])*): Seq[DwpRow] =
      rows.map { case (w, ps) => DwpRow(0, w, ps.toArray) }
    // 8 distinct words all within distance 7 of the head: only the first
    // 6 others may pair with it
    val crowded = doc(
      "a" -> Seq(1), "b" -> Seq(2), "c" -> Seq(3), "d" -> Seq(4),
      "e" -> Seq(5), "f" -> Seq(6), "g" -> Seq(7), "h" -> Seq(8))
    IndexBuilder.pairProximities(crowded) shouldBe
      IndexBuilder.pairProximitiesHeap(crowded)
    IndexBuilder.pairProximities(crowded) should not contain key(("a", "h"))
    // same word twice with 6 distinct words in between: self pair must
    // still be emitted even though the walk's other-cap fills first
    val selfBeyondCap = doc(
      "x" -> Seq(1, 8), "b" -> Seq(2), "c" -> Seq(3), "d" -> Seq(4),
      "e" -> Seq(5), "f" -> Seq(6), "g" -> Seq(7))
    val fast = IndexBuilder.pairProximities(selfBeyondCap)
    fast shouldBe IndexBuilder.pairProximitiesHeap(selfBeyondCap)
    fast(("x", "x")) shouldBe 7
    // cross-attribute: maximally distant, never a pair
    val cross = doc("a" -> Seq(1), "b" -> Seq((1 << 16) | 2))
    IndexBuilder.pairProximities(cross) shouldBe empty
    IndexBuilder.pairProximitiesHeap(cross) shouldBe empty
  }

  test("distributed stage parity: local-combine partials + run merge ≡ groupBy bitmap agg") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val F = graft.functions.GraftFunctions
    val rng = new scala.util.Random(7L)
    val rows = (0 until 400).flatMap { docid =>
      randomDoc(rng).map(r => r.copy(docid = docid))
    }
    // doc-contiguous, several partitions, plus a tiny flush cap so the
    // multi-flush (duplicate partial keys per partition) path is exercised
    val dwp = spark.createDataset(rows).repartitionByRange(4, $"docid")
      .sortWithinPartitions("docid").as[DwpRow]
    val reference = dwp.mapPartitions { it =>
      IndexBuilder.groupConsecutive(it).flatMap { case (docid, drows) =>
        IndexBuilder.pairProximities(drows).iterator.map {
          case ((w1, w2), prox) => (prox, w1, w2, docid)
        }
      }
    }.toDF("prox", "w1", "w2", "docid")
      .groupBy($"prox", $"w1", $"w2")
      .agg(F.bitmap_or_agg($"docid").as("docids"))
    val fast = dwp.mapPartitions(it => IndexBuilder.pairProximityPartials(it, flushKeys = 64))
      .toDF("w1", "w2", "prox", "partial")
      .repartitionByRange(4, $"w1", $"w2", $"prox")
      .sortWithinPartitions("w1", "w2", "prox")
      .mapPartitions(it => IndexBuilder.mergePairPartialRuns(it))
      .toDF("prox", "w1", "w2", "docids")
    def decode(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        ((r.getInt(0), r.getString(1), r.getString(2)),
          graft.core.Bitmaps.cboDeserialize(r.getAs[Array[Byte]](3)).toArray.toSeq)
      }.toMap
    val a = decode(reference)
    val b = decode(fast)
    b.size shouldBe a.size
    b shouldBe a
    // and the serialized bytes must be codec-identical per key
    val bytesA = reference.collect().map(r =>
      ((r.getInt(0), r.getString(1), r.getString(2)), r.getAs[Array[Byte]](3).toSeq)).toMap
    val bytesB = fast.collect().map(r =>
      ((r.getInt(0), r.getString(1), r.getString(2)), r.getAs[Array[Byte]](3).toSeq)).toMap
    bytesB shouldBe bytesA
  }

  test("word-position stage parity: partials + run merge ≡ explode + groupBy bitmap agg") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val F = graft.functions.GraftFunctions
    val rng = new scala.util.Random(11L)
    val rows = (0 until 400).flatMap { docid =>
      randomDoc(rng).map(r => r.copy(docid = docid))
    }
    val dwp = spark.createDataset(rows).repartitionByRange(4, $"docid")
      .sortWithinPartitions("docid").as[DwpRow]
    val reference = dwp.toDF().select($"word", explode($"positions").as("position"), $"docid")
      .groupBy($"word", $"position")
      .agg(F.bitmap_or_agg($"docid").as("docids"))
    val fast = dwp.mapPartitions(it => IndexBuilder.wordPositionPartials(it, flushKeys = 64))
      .toDF("word", "position", "partial")
      .repartitionByRange(4, $"word", $"position")
      .sortWithinPartitions("word", "position")
      .mapPartitions(it => IndexBuilder.mergeWordPositionRuns(it))
      .toDF("word", "position", "docids")
    def decode(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        ((r.getString(0), r.getInt(1)), r.getAs[Array[Byte]](2).toSeq)
      }.toMap
    val a = decode(reference)
    val b = decode(fast)
    b.size shouldBe a.size
    b shouldBe a
  }

  test("single-pass prefix-pair build ≡ per-side builders, byte-identical") {
    val spark = graft.TestSpark.spark
    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = graft.TestSpark.tempDir("graft-ppboth")
    val docs = graft.webgen.WebPages.generate(spark, 300)
    val builder = new IndexBuilder(spark, settings)
    builder.build(docs, dir, resume = false)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Seq[Byte])] =
      df.collect().map { r =>
        (r.getInt(0), r.getString(1), r.getString(2),
          r.getAs[Array[Byte]](3).toSeq)
      }.toSeq.sortBy(t => (t._2, t._3, t._1))
    val (bothW, bothP) = builder.buildPrefixPairTablesBoth(dir)
    withClue("word_prefix_pair (#8): ") {
      canon(bothW) shouldBe canon(builder.buildWordPrefixPairProximity(dir))
    }
    withClue("prefix_word_pair (#9): ") {
      canon(bothP) shouldBe canon(builder.buildPrefixWordPairProximity(dir))
    }
    // and the committed tables (written through the shared __ppBoth stage)
    // match the per-side builders too
    val T = IndexSettings.T
    withClue("committed #8: ") {
      canon(spark.read.parquet(s"$dir/${T.WordPrefixPairProximityDocids}")
        .select("prox", "w1", "prefix", "docids")) shouldBe
        canon(builder.buildWordPrefixPairProximity(dir))
    }
    withClue("committed #9: ") {
      canon(spark.read.parquet(s"$dir/${T.PrefixWordPairProximityDocids}")
        .select("prox", "prefix", "w2", "docids")) shouldBe
        canon(builder.buildPrefixWordPairProximity(dir))
    }
  }
}
