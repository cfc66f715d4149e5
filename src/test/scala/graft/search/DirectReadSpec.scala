package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import QueryTree.MatchingStrategy

/** The driver-side parquet point reader (DirectParquet) must be a PURE
  * optimization: rank results identical to the Spark-scan path on every
  * fixture query shape, and it must actually engage (reads counter moves)
  * rather than silently falling back. */
class DirectReadSpec extends AnyFunSuite with Matchers {

  private lazy val index = Fixture.buildIndex(TestSpark.spark)

  test("direct point reads engage and fall back zero times on fixture queries") {
    assume(DirectParquet.enabled)
    val before = DirectParquet.reads.get()
    val fbBefore = DirectParquet.fallbacks.get()
    val search = new Search(index)
    Seq(Fixture.TestQuery, "hello ", "worl", "\"hello world\"", "brwon ")
      .foreach { q =>
        search.execute(SearchRequest(query = Some(q), limit = 17,
          strategy = MatchingStrategy.Last, exhaustive = true))
      }
    withClue("direct reads never engaged: ")(
      DirectParquet.reads.get() should be > before)
    withClue("direct reads fell back: ")(
      DirectParquet.fallbacks.get() shouldBe fbBefore)
  }

  test("rank results identical with direct reads vs a fresh Spark-only handle") {
    assume(DirectParquet.enabled)
    // fresh handles so both sides fetch cold through their own route:
    // `direct` uses the point reader, `sparkOnly` has it disabled via a
    // poisoned footer dir (nonexistent table names can't be faked, so we
    // compare against the DISTRIBUTED path instead — maxLocalPostings = 0
    // routes every fetch through Spark scans end to end)
    val direct = new Search(GraftIndex(TestSpark.spark, index.dir, index.settings))
    val sparkOnly = new Search(
      GraftIndex(TestSpark.spark, index.dir, index.settings), maxLocalPostings = 0)
    Seq(Fixture.TestQuery, "hello ", "worl", "brwon ", "the quick ")
      .foreach { q =>
        val req = SearchRequest(query = Some(q), limit = 17,
          strategy = MatchingStrategy.Last, exhaustive = true)
        val a = direct.execute(req)
        val b = sparkOnly.execute(req)
        withClue(s"query '$q': ") {
          a.documentsIds shouldBe b.documentsIds
          a.candidates shouldBe b.candidates
        }
      }
  }
}
