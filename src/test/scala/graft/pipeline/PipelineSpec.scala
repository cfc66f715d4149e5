package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class PipelineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.1"

  private def docs = spark.read.parquet(s"$sf01/documents.parquet")

  test("exact dedup finds the planted duplicate groups at sf0.1") {
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text")
    dups.count() shouldBe 8 // 8 planted full-text dup groups at sf0.1
    // (q_dedup_exact's oracle now keys on a 50-char fingerprint — this
    // assertion is the full-text exact-dedup check)
    val dropIds = Dedup.exactDropIds(docs, "doc_id", "text")
    dropIds.count() shouldBe
      dups.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("cnt") - 1)).first().getLong(0)
  }

  test("minhash LSH near-dup pipeline recovers exact duplicates") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.9).collect()
    pairs should not be empty
    // every exact-duplicate pair must be found (jaccard 1.0 ⇒ identical sigs)
    val exact = Dedup.exactDuplicates(docs, "doc_id", "text")
      .select("members").collect()
      .flatMap(r => r.getSeq[Long](0).combinations(2).map(p => (p(0), p(1))))
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.foreach { p => found should contain(p) }
  }

  test("simhash: identical docs get identical hashes, hamming works") {
    import org.apache.spark.sql.functions._
    val sh = Dedup.simhash64(docs, "doc_id", "text")
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text")
      .select(explode(col("members")).as("docid"), col("h"))
    val joined = sh.join(dups, "docid")
      .groupBy("h").agg(countDistinct("simhash").as("n"))
    joined.where(col("n") > 1).count() shouldBe 0
  }

  test("ANN: LSH bucket probe reaches brute-force top-1") {
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val sim = new Similarity(spark, numPlanes = 12, dims = 64)
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") === 7)
      .selectExpr("transform(embedding, x -> cast(x as double)) as v")
      .first().getSeq[Double](0).toArray
    val rest = emb.where(org.apache.spark.sql.functions.col("vec_id") =!= 7)
    val exact = sim.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0))
    val bucketized = sim.bucketize(rest, "vec_id", "embedding").cache()
    val approx = sim.annTopK(bucketized, "vec_id", "embedding", q, 10, maxHamming = 4)
      .collect().map(_.getLong(0))
    // recall of the top-1 under a generous ring; full recall not guaranteed
    approx should contain(exact.head)
    // degenerate ring = exact
    val full = sim.annTopK(bucketized, "vec_id", "embedding", q, 10, maxHamming = 12)
      .collect().map(_.getLong(0))
    full.toSeq shouldBe exact.toSeq
  }

  test("IVF: nprobe=all is exact; small nprobe finds most of top-k") {
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val sim = new Similarity(spark, numPlanes = 12, dims = 64)
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") === 3)
      .selectExpr("transform(embedding, x -> cast(x as double)) as v")
      .first().getSeq[Double](0).toArray
    val rest = emb.where(org.apache.spark.sql.functions.col("vec_id") =!= 3)
    val centroids = sim.trainIvf(rest, "vec_id", "embedding", nLists = 8, iterations = 2)
    centroids.length shouldBe 8
    val assigned = sim.ivfAssign(rest, "vec_id", "embedding", centroids).cache()
    val exact = sim.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = sim.ivfTopK(assigned, "vec_id", "embedding", centroids, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    full shouldBe exact
    val probed = sim.ivfTopK(assigned, "vec_id", "embedding", centroids, q, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    probed should contain(exact.head)
  }

  test("language id predicts en for stop-wordy docs, unknown otherwise") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog is in the house of it"),
      (2L, "zxq vbn mlk pqr")).toDF("doc_id", "text")
    val out = TextStats.languageId(d, "doc_id", "text")
      .select("docid", "pred").as[(Long, String)].collect().toMap
    out(1L) shouldBe "en"
    out(2L) shouldBe "unknown"
  }

  test("quality score components") {
    import spark.implicits._
    val d = Seq((1L, ("the quick fox " * 20).trim)).toDF("doc_id", "text")
    val r = TextStats.qualityScore(d, "doc_id", "text").first()
    r.getAs[Number]("n_tokens").intValue shouldBe 60
    r.getAs[Double]("score") should be > 0.5
  }

  test("LSH megabucket cap: a planted giant bucket is dropped, pairs stay bounded") {
    import spark.implicits._
    // 3000 byte-identical docs → every band bucket is one 3000-member
    // megabucket → uncapped pair count would be ~4.5M; the cap drops it
    val clones = (0L until 3000L).map(i => (i, "lorem ipsum dolor sit amet " * 5))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(clones, "doc_id", "text")
    val sig = Dedup.minhash(sh, numHashes = 16)
    val capped = Dedup.lshCandidatePairs(sig, bands = 4, rows = 4, maxBucket = 100)
    capped.count() shouldBe 0L // all buckets over the cap → dropped + logged
    // sane corpora (buckets under the cap) are unaffected by the default cap
    val normal = Dedup.lshCandidatePairs(
      Dedup.minhash(Dedup.shingles(docs, "doc_id", "text"), 16), 4, 4)
    val uncapped = Dedup.lshCandidatePairs(
      Dedup.minhash(Dedup.shingles(docs, "doc_id", "text"), 16), 4, 4,
      maxBucket = Int.MaxValue)
    normal.count() shouldBe uncapped.count()
  }

  test("multimodal: per-partition decode plumbing is deterministic") {
    val items = Multimodal.syntheticItems(spark, docs.limit(50), "doc_id", "text")
    val f1 = Multimodal.extractFeatures(spark, items).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(spark, items.repartition(7)).collect().sortBy(_.id)
    f1.map(_.sha).toSeq shouldBe f2.map(_.sha).toSeq
    f1.map(_.features.toSeq).toSeq shouldBe f2.map(_.features.toSeq).toSeq
    val frames = Multimodal.sampleFrames(spark, items)
    frames.count() should be > 0L
  }
}
