package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import graft.webgen.WebPages

/** Block-max pruned BM25 must be rank- AND score-identical to full scoring,
  * and stable across parallelism (north rule). */
class Bm25Spec extends AnyFunSuite with Matchers {

  private lazy val index: GraftIndex = {
    val spark = TestSpark.spark
    val dir = graft.TestSpark.tempDir("graft-bm25")
    val settings = IndexSettings(searchableFields = Seq("text"))
    val docs = WebPages.generate(spark, 3000)
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    GraftIndex(spark, dir, settings)
  }

  test("web corpus generation is deterministic and round-trips html→text") {
    val p1 = WebPages.gen(123L, Array.fill(50000)(1.0).scanLeft(0.0)(_ + _).tail.map(_ / 50000))
    val p2 = WebPages.gen(123L, Array.fill(50000)(1.0).scanLeft(0.0)(_ + _).tail.map(_ / 50000))
    p1.text shouldBe p2.text
    p1.url shouldBe p2.url
    WebPages.extractText(new String(p1.html, "UTF-8")) shouldBe p1.text
  }

  test("pruned top-k identical to full scoring (rank + score)") {
    // force the distributed path so block-max pruning is what's tested
    val bm25 = new Bm25(index, smallQueryMaxPostings = 0)
    for (terms <- Seq(Seq("w0"), Seq("w3", "w17"), Seq("the", "w100"), Seq("w5", "w50", "w500"))) {
      val full = bm25.topK(terms, 10, prune = false)
      val pruned = bm25.topK(terms, 10, prune = true)
      pruned.map(_._1).toSeq shouldBe full.map(_._1).toSeq
      pruned.zip(full).foreach { case ((_, a), (_, b)) => a shouldBe b +- 1e-12 }
    }
  }

  test("small-query driver path identical to the distributed path") {
    val fast = new Bm25(index) // default: small queries score driver-side
    val dist = new Bm25(index, smallQueryMaxPostings = 0)
    for (terms <- Seq(Seq("w0"), Seq("w3", "w17"), Seq("the", "w100"), Seq("w5", "w50", "w500"))) {
      val a = fast.topK(terms, 10)
      val b = dist.topK(terms, 10, prune = false)
      a.map(_._1).toSeq shouldBe b.map(_._1).toSeq
      a.zip(b).foreach { case ((_, x), (_, y)) => x shouldBe y +- 1e-9 }
    }
  }

  test("unknown terms yield empty results") {
    new Bm25(index).topK(Seq("zzzznotaword"), 5) shouldBe empty
  }

  test("surviving block ids are pushed into the posting scan (IO half of WAND)") {
    val spark = TestSpark.spark
    val plans = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      // 3 stop words ⇒ > 64 block metas ⇒ the 3-pass pruned path runs;
      // force the distributed branch so score() is what executes
      val bm25 = new Bm25(index, smallQueryMaxPostings = 0)
      val pruned = bm25.topK(Seq("the", "of", "and"), 10, prune = true)
      val full = bm25.topK(Seq("the", "of", "and"), 10, prune = false)
      pruned.map(_._1).toSeq shouldBe full.map(_._1).toSeq
      val deadline = System.nanoTime() + 20000000000L
      var last = -1
      var stable = 0
      while (System.nanoTime() < deadline && stable < 3) {
        Thread.sleep(200)
        val n = plans.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      import scala.jdk.CollectionConverters._
      // at least one scoring scan (θ̂ / phase A / phase B) must carry the
      // block_id predicate into PushedFilters — pruned blocks' bytes then
      // never leave the parquet reader (row-group/page pruning)
      val pushed = plans.asScala.filter(p =>
        p.contains("PushedFilters") && p.contains("block_id") &&
          (p.contains("In(block_id") || p.contains("EqualTo(block_id")))
      pushed should not be empty
    } finally spark.listenerManager.unregister(l)
  }

  test("bounded phase A: all-common-terms query rescoring via distributed semi-join") {
    // maxCandidateCollect = 1 forces the semi-join branch (candidates > cap)
    // on a weak-θ̂ all-common-terms query; result must stay exact
    val capped = new Bm25(index, smallQueryMaxPostings = 0, maxCandidateCollect = 1)
    val full = new Bm25(index, smallQueryMaxPostings = 0)
    for (terms <- Seq(Seq("the", "w0", "w1"), Seq("the", "w100"))) {
      val a = capped.topK(terms, 10, prune = true)
      val b = full.topK(terms, 10, prune = false)
      a.map(_._1).toSeq shouldBe b.map(_._1).toSeq
      a.zip(b).foreach { case ((_, x), (_, y)) => x shouldBe y +- 1e-9 }
    }
  }

  test("prune=false forces full scoring even under the small-query threshold") {
    // the fast path is gated on prune: an oracle caller using prune=false
    // must reach the distributed full-scoring computation
    val bm25 = new Bm25(index) // default small-query threshold active
    val viaOracle = bm25.topK(Seq("w3", "w17"), 10, prune = false)
    val viaFast = bm25.topK(Seq("w3", "w17"), 10)
    viaFast.map(_._1).toSeq shouldBe viaOracle.map(_._1).toSeq
  }

  test("sparse docids: driver fast path scores correctly (no dense-id assumption)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = graft.TestSpark.tempDir("graft-bm25-sparse")
    val settings = IndexSettings(searchableFields = Seq("text"))
    // caller-assigned sparse docids (EngineQueries-style): id gaps of 17
    val docs = WebPages.generate(spark, 400)
      .withColumn("docid", org.apache.spark.sql.functions.col("docid") * 17 + 5)
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    val idx = GraftIndex(spark, dir, settings)
    val fast = new Bm25(idx)
    val dist = new Bm25(idx, smallQueryMaxPostings = 0)
    for (terms <- Seq(Seq("w0"), Seq("the", "w10"))) {
      val a = fast.topK(terms, 10)
      val b = dist.topK(terms, 10, prune = false)
      a.map(_._1).toSeq shouldBe b.map(_._1).toSeq
      a.zip(b).foreach { case ((_, x), (_, y)) => x shouldBe y +- 1e-9 }
    }
  }
}
