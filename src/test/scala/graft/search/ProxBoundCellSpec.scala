package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import graft.webgen.WebPages

/** ≥3-word queries drain through LOWER-BOUND proximity cells (permutation-
  * convolution over pair bitmaps — a sound lower bound of the plane-sweep
  * value) with page verification against the next cell's bound. Rank
  * results must be IDENTICAL to the distributed oracle on corpora large
  * enough that the cells actually engage, and the drain must rank far
  * fewer docs than the whole leading bucket. */
class ProxBoundCellSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val stg = IndexSettings(searchableFields = Seq("text"))
  private lazy val index: GraftIndex = {
    val dir = graft.TestSpark.tempDir("graft-proxbound")
    new IndexBuilder(spark, stg).build(WebPages.generate(spark, 3000), dir,
      resume = false)
    GraftIndex(spark, dir, stg)
  }

  private val queries = Seq(
    "the w3 w10 ",   // three common words — big intersection bucket
    "the w5 w17 ",
    "w3 w10 w17 ",
    "the w3 w10",    // trailing prefix variant
    "the w100 w2500 ")

  private def withLowGate[A](f: => A): A = {
    val prev = RankCells.BoundCellMinBucket
    RankCells.BoundCellMinBucket = 1L // engage on this small corpus
    try f finally RankCells.BoundCellMinBucket = prev
  }

  test("3-word drains engage bound cells and match the distributed oracle") {
    withLowGate {
      val local = new Search(index)
      val distributed = new Search(index, maxLocalPostings = 0)
      val before = RankCells.boundDrains.get()
      queries.foreach { q =>
        val req = SearchRequest(query = Some(q), limit = 20, exhaustive = true)
        val l = local.execute(req)
        val d = distributed.execute(req)
        withClue(s"query '$q': ") {
          l.documentsIds shouldBe d.documentsIds
          l.candidates shouldBe d.candidates
        }
      }
      withClue("bound cells never engaged (corpus too small?): ")(
        RankCells.boundDrains.get() should be > before)
    }
  }

  test("pagination stays identical through the verification loop") {
    withLowGate {
      val local = new Search(index)
      val distributed = new Search(index, maxLocalPostings = 0)
      Seq(0, 10, 40).foreach { off =>
        val req = SearchRequest(query = Some("the w3 w10 "), limit = 15,
          offset = off, exhaustive = true)
        withClue(s"offset $off: ")(
          local.execute(req).documentsIds shouldBe
            distributed.execute(req).documentsIds)
      }
    }
  }

  test("default gate: small buckets keep the per-doc path (no bound cells)") {
    val before = RankCells.boundDrains.get()
    val local = new Search(GraftIndex(TestSpark.spark, index.dir, stg))
    local.execute(SearchRequest(query = Some("the w100 w2500 "), limit = 20,
      exhaustive = true))
    RankCells.boundDrains.get() shouldBe before
  }
}
