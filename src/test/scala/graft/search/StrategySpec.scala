package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import QueryTree.MatchingStrategy._

/** Matching strategies beyond Last/All (query_tree.rs:487-530): sanity over
  * the fixture corpus — the word kept/removed differs per strategy. */
class StrategySpec extends AnyFunSuite with Matchers {
  private lazy val index = Fixture.buildIndex(TestSpark.spark)
  private lazy val search = new Search(index)

  private def run(s: QueryTree.MatchingStrategy) =
    search.execute(SearchRequest(
      query = Some(Fixture.TestQuery), limit = 17, strategy = s,
      exhaustive = true,
      criteriaOverride = Some(Seq(Criterion.Words))))

  test("Last keeps a 'hello'-only branch (removes from the end)") {
    val r = run(Last)
    // every doc matching any of hello/hello+world/all → all 17 docs
    r.candidates shouldBe 17
  }

  test("First removes from the front (america-only last branch)") {
    val r = run(First)
    // branch ladder: [h w a], [w a], [a] — docs matching america-variants
    r.documentsIds should not be empty
    val last = Fixture.expectedOrder(Seq(Criterion.Words), true, false, Nil)
    // word_rank==0 docs (all words) must still rank first
    r.documentsIds.take(last.size).map(i => Fixture.docs(i).id) should
      contain allElementsOf last.map(_.id)
  }

  test("Any returns union of any-word matches, all-words docs first") {
    val r = run(Any)
    r.candidates shouldBe 17
    val allWordDocs = Fixture.docs.filter(_.wordRank == 0).map(_.id).toSet
    r.documentsIds.take(allWordDocs.size).map(i => Fixture.docs(i).id).toSet shouldBe allWordDocs
  }

  test("Size removes the shortest word first") {
    val r = run(Size)
    r.documentsIds should not be empty
  }

  test("offset pagination slices the drained stream") {
    val all = search.execute(SearchRequest(
      query = Some(Fixture.TestQuery), limit = 17, exhaustive = false))
    val page2 = search.execute(SearchRequest(
      query = Some(Fixture.TestQuery), offset = 5, limit = 5, exhaustive = false))
    page2.documentsIds shouldBe all.documentsIds.slice(5, 10)
  }
}
