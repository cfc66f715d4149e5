package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import Criterion._
import QueryTree.MatchingStrategy

/** Port of `criteria_mixup` (query_criteria.rs:200-470): all 120
  * permutations of [Attribute, Desc(asc_desc_rank), Exactness, Proximity,
  * Typo] after Words must each match the oracle ordering. */
class CriteriaMixupSpec extends AnyFunSuite with Matchers {

  test("criteria_mixup: 120 permutations rank-identical to the oracle") {
    val index = Fixture.buildIndex(TestSpark.spark)
    val search = new Search(index)
    val tail = Seq[Criterion](Attribute, Desc("asc_desc_rank"), Exactness, Proximity, Typo)
    val perms = tail.permutations.toSeq
    perms.size shouldBe 120
    var checked = 0
    perms.foreach { p =>
      val criteria = Words +: p
      val got = search.execute(SearchRequest(
        query = Some(Fixture.TestQuery),
        limit = 17,
        strategy = MatchingStrategy.Last,
        authorizeTypos = true,
        exhaustive = false,
        criteriaOverride = Some(criteria)))
        .documentsIds.map(i => Fixture.docs(i).id)
      val want = Fixture.expectedOrder(criteria, true, true, Nil).map(_.id)
      withClue(s"criteria=$criteria: ") { got shouldBe want }
      checked += 1
    }
    checked shouldBe 120
  }
}
