package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import QueryTree.MatchingStrategy

/** Port of `/root/reference/milli/tests/search/filters.rs`: the engine with
  * a filter must return exactly the oracle-filtered docs in rank order.
  * Filter arrays (AND of groups, OR within group) are composed into the
  * filter DSL string. */
class FiltersSpec extends AnyFunSuite with Matchers {

  private lazy val index = Fixture.buildIndex(TestSpark.spark)
  private lazy val search = new Search(index)
  private val criteria = Seq(Criterion.Words, Criterion.Typo, Criterion.Proximity,
    Criterion.Attribute, Criterion.Exactness)

  private def check(name: String, groups: Seq[Seq[String]]): Unit = test(name) {
    val filterStr = groups.map(g => "(" + g.mkString(" OR ") + ")").mkString(" AND ")
    val result = search.execute(SearchRequest(
      query = Some(Fixture.TestQuery),
      filter = Some(filterStr),
      limit = 17,
      strategy = MatchingStrategy.Last,
      authorizeTypos = true,
      criteriaOverride = Some(criteria)))
    val got = result.documentsIds.map(i => Fixture.docs(i).id)
    val filteredIds = Fixture.expectedFilteredIds(groups)
    val want = Fixture.expectedOrder(criteria, true, true, Nil)
      .map(_.id).filter(filteredIds.contains)
    got shouldBe want
  }

  check("eq_simple_string_filter", Seq(Seq("tag=red")))
  check("eq_simple_number_filter", Seq(Seq("asc_desc_rank=1")))
  check("eq_string_and_filter_return_empty", Seq(Seq("tag=red"), Seq("tag=green")))
  check("eq_mix_and_filter", Seq(Seq("tag=red"), Seq("asc_desc_rank=1")))
  check("eq_string_or_filter", Seq(Seq("tag=red", "tag=green")))
  check("eq_mix_or_filter", Seq(Seq("tag=red", "asc_desc_rank=1")))
  check("eq_number_or_filter", Seq(Seq("asc_desc_rank=3", "asc_desc_rank=1")))
  check("neq_simple_string_filter", Seq(Seq("tag!=red")))
  check("neq_simple_number_filter", Seq(Seq("asc_desc_rank!=1")))
  check("neq_simple_string_in_number_column_filter", Seq(Seq("asc_desc_rank!=red")))
  check("geo_radius",
    Seq(Seq("_geoRadius(50.630010347667806, 3.086251829166809, 100000)")))
  check("not_geo_radius",
    Seq(Seq("NOT _geoRadius(50.630010347667806, 3.086251829166809, 1000000)")))
  check("eq_complex_filter", Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank=3")))
  check("eq_complex_filter_2",
    Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank=3", "asc_desc_rank=1")))
  check("greater_simple_number_filter", Seq(Seq("asc_desc_rank>1")))
  check("greater_mix_and_filter", Seq(Seq("tag=red"), Seq("asc_desc_rank>1")))
  check("greater_mix_or_filter", Seq(Seq("tag=red", "asc_desc_rank>1")))
  check("greater_number_or_filter", Seq(Seq("asc_desc_rank>3", "asc_desc_rank>1")))
  check("greater_complex_filter",
    Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank>3")))
  check("greater_complex_filter_2",
    Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank>3", "asc_desc_rank>1")))
  check("lower_simple_number_filter", Seq(Seq("asc_desc_rank<1")))
  check("lower_mix_and_filter", Seq(Seq("tag=red"), Seq("asc_desc_rank<1")))
  check("lower_mix_or_filter", Seq(Seq("tag=red", "asc_desc_rank<1")))
  check("lower_number_or_filter", Seq(Seq("asc_desc_rank<3", "asc_desc_rank<1")))
  check("lower_complex_filter",
    Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank<3")))
  check("lower_complex_filter_2",
    Seq(Seq("tag=red", "tag=green"), Seq("asc_desc_rank<3", "asc_desc_rank<1")))
  check("exists_filter_1", Seq(Seq("opt1 EXISTS")))
  check("exists_filter_1_not", Seq(Seq("opt1 NOT EXISTS")))
  check("exists_filter_1_not_alt", Seq(Seq("NOT opt1 EXISTS")))
  check("exists_filter_1_double_not", Seq(Seq("NOT opt1 NOT EXISTS")))
  check("in_filter", Seq(Seq("tag_in IN[1, 2, 3, four, five]")))
  check("not_in_filter", Seq(Seq("tag_in NOT IN[1, 2, 3, four, five]")))
  check("not_not_in_filter", Seq(Seq("NOT tag_in NOT IN[1, 2, 3, four, five]")))
}
