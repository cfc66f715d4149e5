package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import Criterion._
import QueryTree.MatchingStrategy

/** Rank-identity against milli's own fixtures — the Scala port of
  * `/root/reference/milli/tests/search/query_criteria.rs`.
  * Engine output (external ids in rank order) must equal the executable
  * oracle `expected_order` for every criterion combination.
  */
class QueryCriteriaSpec extends AnyFunSuite with Matchers {

  private lazy val index = Fixture.buildIndex(TestSpark.spark)
  private lazy val search = new Search(index)
  // the fixture index is tiny, so `search` exercises the small-query driver
  // path; `searchDist` forces the distributed rank job (the 100 TB path) —
  // both must be rank-identical to the oracle
  private lazy val searchDist = new Search(index, maxLocalPostings = 0)

  private def runCase(
      s: Search,
      optionalWordsLast: Boolean,
      authorizeTypos: Boolean,
      criteria: Seq[Criterion],
      sortBy: Seq[SortSpec]): Unit = {
    val result = s.execute(SearchRequest(
      query = Some(Fixture.TestQuery),
      limit = 17,
      strategy = if (optionalWordsLast) MatchingStrategy.Last else MatchingStrategy.All,
      authorizeTypos = authorizeTypos,
      sortCriteria = sortBy,
      criteriaOverride = Some(criteria)))
    val got = result.documentsIds.map(i => Fixture.docs(i).id)
    val want = Fixture.expectedOrder(criteria, authorizeTypos, optionalWordsLast, sortBy)
      .map(_.id)
    got shouldBe want
  }

  private def check(
      name: String,
      optionalWordsLast: Boolean,
      authorizeTypos: Boolean,
      criteria: Seq[Criterion],
      sortBy: Seq[SortSpec]): Unit = test(name) {
    runCase(search, optionalWordsLast, authorizeTypos, criteria, sortBy)
  }

  private def checkDist(
      name: String,
      optionalWordsLast: Boolean,
      authorizeTypos: Boolean,
      criteria: Seq[Criterion],
      sortBy: Seq[SortSpec]): Unit = test(s"$name (distributed path)") {
    runCase(searchDist, optionalWordsLast, authorizeTypos, criteria, sortBy)
  }

  val LAST = true; val ALL = false
  val TYPOS = true; val NO_TYPOS = false

  check("none_allow_typo", ALL, TYPOS, Nil, Nil)
  check("none_disallow_typo", ALL, NO_TYPOS, Nil, Nil)
  check("words_allow_typo", LAST, TYPOS, Seq(Words), Nil)
  check("attribute_allow_typo", ALL, TYPOS, Seq(Attribute), Nil)
  check("attribute_disallow_typo", ALL, NO_TYPOS, Seq(Attribute), Nil)
  check("typo", ALL, TYPOS, Seq(Typo), Nil)
  check("exactness_allow_typo", ALL, TYPOS, Seq(Exactness), Nil)
  check("exactness_disallow_typo", ALL, NO_TYPOS, Seq(Exactness), Nil)
  check("proximity_allow_typo", ALL, TYPOS, Seq(Proximity), Nil)
  check("proximity_disallow_typo", ALL, NO_TYPOS, Seq(Proximity), Nil)
  check("asc_allow_typo", ALL, TYPOS, Seq(Asc("asc_desc_rank")), Nil)
  check("asc_disallow_typo", ALL, NO_TYPOS, Seq(Asc("asc_desc_rank")), Nil)
  check("desc_allow_typo", ALL, TYPOS, Seq(Desc("asc_desc_rank")), Nil)
  check("desc_disallow_typo", ALL, NO_TYPOS, Seq(Desc("asc_desc_rank")), Nil)
  check("asc_unexisting_field_allow_typo", ALL, TYPOS, Seq(Asc("unexisting_field")), Nil)
  check("asc_unexisting_field_disallow_typo", ALL, NO_TYPOS, Seq(Asc("unexisting_field")), Nil)
  check("desc_unexisting_field_allow_typo", ALL, TYPOS, Seq(Desc("unexisting_field")), Nil)
  check("desc_unexisting_field_disallow_typo", ALL, NO_TYPOS, Seq(Desc("unexisting_field")), Nil)
  check("empty_sort_by_allow_typo", ALL, TYPOS, Seq(Sort), Nil)
  check("empty_sort_by_disallow_typo", ALL, NO_TYPOS, Seq(Sort), Nil)
  check("sort_by_asc_allow_typo", ALL, TYPOS, Seq(Sort), Seq(SortSpec("tag", true)))
  check("sort_by_asc_disallow_typo", ALL, NO_TYPOS, Seq(Sort), Seq(SortSpec("tag", true)))
  check("sort_by_desc_allow_typo", ALL, TYPOS, Seq(Sort), Seq(SortSpec("tag", false)))
  check("sort_by_desc_disallow_typo", ALL, NO_TYPOS, Seq(Sort), Seq(SortSpec("tag", false)))
  check("default_criteria_order", LAST, TYPOS,
    Seq(Words, Typo, Proximity, Attribute, Exactness), Nil)

  // distributed-path regression (representative rank-criteria subset)
  checkDist("none_allow_typo", ALL, TYPOS, Nil, Nil)
  checkDist("words_allow_typo", LAST, TYPOS, Seq(Words), Nil)
  checkDist("typo", ALL, TYPOS, Seq(Typo), Nil)
  checkDist("proximity_allow_typo", ALL, TYPOS, Seq(Proximity), Nil)
  checkDist("attribute_allow_typo", ALL, TYPOS, Seq(Attribute), Nil)
  checkDist("exactness_allow_typo", ALL, TYPOS, Seq(Exactness), Nil)
  checkDist("default_criteria_order", LAST, TYPOS,
    Seq(Words, Typo, Proximity, Attribute, Exactness), Nil)
}
