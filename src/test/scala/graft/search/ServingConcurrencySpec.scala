package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import graft.webgen.WebPages

/** Concurrent serving clients over ONE warmed index handle must see exactly
  * the single-threaded results — the driver-side LRU caches (postings,
  * forward rows, candidate bitmaps, pair frequencies) are synchronized
  * fetch-through and their bitmaps/arrays are shared read-only. Pins the
  * multi-client bench mode (`bm25_qps_mt8` / `milli_rank_qps_mt8`). */
class ServingConcurrencySpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val stg = IndexSettings(searchableFields = Seq("text"))
  private lazy val index: GraftIndex = {
    val d = graft.TestSpark.tempDir("graft-mtserve")
    new IndexBuilder(spark, stg).build(WebPages.generate(spark, 1500), d, resume = false)
    GraftIndex(spark, d, stg)
  }

  test("concurrent bm25 + ranked search agree with single-threaded results") {
    val bm25 = new Bm25(index)
    val search = new Search(index)
    val bmQueries = Seq(Seq("w10"), Seq("w3", "w17"), Seq("the", "w100"), Seq("w200"))
    val rankQueries = Seq("w3 w17 ", "w200 ", "the w100 ")

    // single-threaded expectations (also warms every cache path once)
    val bmExpected = bmQueries.map(q => q -> bm25.topK(q, 20).toSeq).toMap
    val rankExpected = rankQueries.map { q =>
      val r = search.execute(SearchRequest(query = Some(q), limit = 20))
      q -> ((r.documentsIds, r.candidates))
    }.toMap

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tasks = (0 until 8).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            (0 until 10).foreach { i =>
              val bq = bmQueries((t + i) % bmQueries.length)
              if (bm25.topK(bq, 20).toSeq != bmExpected(bq))
                failures.add(s"bm25 mismatch on $bq")
              val rq = rankQueries((t + i) % rankQueries.length)
              val r = search.execute(SearchRequest(query = Some(rq), limit = 20))
              if ((r.documentsIds, r.candidates) != rankExpected(rq))
                failures.add(s"rank mismatch on $rq")
            }
          } catch { case e: Throwable => failures.add(s"thread $t threw: $e") }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    withClue(failures.toString) { failures.isEmpty shouldBe true }
  }

  // the background-fill defer waits for this counter to reach zero: a
  // leaked increment would silently delay EVERY future fill by the full
  // defer bound, so the balance must hold across success AND failure paths
  test("activeQueries rebalances to zero across execute, incl. failures") {
    val search = new Search(index)
    index.activeQueries.get() shouldBe 0
    search.execute(SearchRequest(query = Some("w10 "), limit = 5))
    index.activeQueries.get() shouldBe 0
    // sort without the Sort criterion throws inside executeImpl
    intercept[IllegalArgumentException] {
      search.execute(SearchRequest(query = Some("w10 "), limit = 5,
        sortCriteria = Seq(SortSpec("lang", ascending = true)),
        criteriaOverride = Some(Seq(Criterion.Words))))
    }
    index.activeQueries.get() shouldBe 0
  }
}
