package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import Criterion._
import QueryTree.MatchingStrategy

/** Port of `/root/reference/milli/tests/search/distinct.rs`: distinct on a
  * facet field keeps the first doc per value in rank order; the candidate
  * count equals the deduped candidate count. */
class DistinctSpec extends AnyFunSuite with Matchers {

  private lazy val index = Fixture.buildIndex(TestSpark.spark)
  private lazy val search = new Search(index)
  private val default = Seq(Words, Typo, Proximity, Attribute, Exactness)

  private def distinctValue(d: Fixture.TestDoc, field: String): String = field match {
    case "tag"           => d.tag
    case "asc_desc_rank" => d.ascDescRank.toString
  }

  private def check(name: String, field: String, limit: Int,
      criteria: Seq[Criterion], nRes: Long): Unit = test(name) {
    val result = search.execute(SearchRequest(
      query = Some(Fixture.TestQuery),
      limit = limit,
      strategy = MatchingStrategy.Last,
      authorizeTypos = true,
      criteriaOverride = Some(criteria),
      distinctOverride = Some(Some(field))))
    result.candidates shouldBe nRes
    val seen = scala.collection.mutable.HashSet.empty[String]
    val want = Fixture.expectedOrder(criteria, true, true, Nil)
      .filter(d => seen.add(distinctValue(d, field)))
      .take(limit).map(_.id)
    result.documentsIds.map(i => Fixture.docs(i).id) shouldBe want
  }

  check("exhaustive_distinct_string_default_criteria", "tag", 1, default, 3)
  check("exhaustive_distinct_number_default_criteria", "asc_desc_rank", 1, default, 7)
  check("exhaustive_distinct_number_weird_order_criteria", "asc_desc_rank", 0,
    Seq(Desc("attribute_rank"), Desc("exactness_rank"), Exactness, Typo), 7)
  check("distinct_string_default_criteria", "tag", 17, default, 3)
  check("distinct_number_default_criteria", "asc_desc_rank", 17, default, 7)
  check("distinct_string_criterion_words", "tag", 17, Seq(Words), 3)
  check("distinct_number_criterion_words", "asc_desc_rank", 17, Seq(Words), 7)
  check("distinct_string_criterion_words_typo", "tag", 17, Seq(Words, Typo), 3)
  check("distinct_number_criterion_words_typo", "asc_desc_rank", 17, Seq(Words, Typo), 7)
  check("distinct_string_criterion_words_proximity", "tag", 17, Seq(Words, Proximity), 3)
  check("distinct_number_criterion_words_proximity", "asc_desc_rank", 17,
    Seq(Words, Proximity), 7)
  check("distinct_string_criterion_attribute", "tag", 17, Seq(Attribute), 3)
  check("distinct_number_criterion_attribute", "asc_desc_rank", 17, Seq(Attribute), 7)
  check("distinct_string_criterion_exactness", "tag", 17, Seq(Exactness), 3)
  check("distinct_number_criterion_exactness", "asc_desc_rank", 17, Seq(Exactness), 7)
}

/** Port of `/root/reference/milli/tests/search/sort.rs`. */
class SortErrorSpec extends AnyFunSuite with Matchers {
  test("sort_ranking_rule_missing") {
    val index = Fixture.buildIndex(TestSpark.spark)
    val search = new Search(index)
    an[IllegalArgumentException] should be thrownBy {
      search.execute(SearchRequest(
        query = Some(Fixture.TestQuery),
        limit = 17,
        sortCriteria = Seq(SortSpec("tag", true)),
        criteriaOverride = Some(Seq(Words, Typo, Proximity, Attribute, Exactness))))
    }
  }
}

/** Port of `/root/reference/milli/tests/search/phrase_search.rs`: stop-word
  * holes in phrases; all-stop-word phrases behave as placeholder search. */
class PhraseSearchSpec extends AnyFunSuite with Matchers {

  private lazy val index =
    Fixture.buildIndex(TestSpark.spark, stopWords = Set("a", "an", "the", "of"))

  private def run(criteria: Seq[Criterion]): Unit = {
    val search = new Search(index)
    val r1 = search.execute(SearchRequest(
      query = Some("\"the use of force\""),
      limit = 10,
      strategy = MatchingStrategy.All,
      authorizeTypos = false,
      criteriaOverride = Some(criteria)))
    r1.documentsIds.size shouldBe 1

    val r2 = search.execute(SearchRequest(
      query = Some("\"the\""),
      limit = 10,
      strategy = MatchingStrategy.All,
      authorizeTypos = false,
      criteriaOverride = Some(criteria)))
    r2.documentsIds.size shouldBe 10
  }

  test("phrase_search_with_stop_words_no_criteria") { run(Nil) }
  test("phrase_search_with_stop_words_all_criteria") {
    run(Seq(Criterion.Proximity, Criterion.Attribute, Criterion.Exactness))
  }
}
