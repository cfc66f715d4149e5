package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import QueryTree.MatchingStrategy

/** The round-4 local sort path (driver-pinned facet/geo value maps) must be
  * order-identical to the distributed facet-join path on every sort shape:
  * query-time Sort entries (field asc/desc, geo point), Asc/Desc criteria,
  * mixed engine+sort criteria orders, filters and pagination. */
class LocalSortSpec extends AnyFunSuite with Matchers {

  private lazy val index = Fixture.buildIndex(TestSpark.spark)
  private lazy val local = new Search(index)
  private lazy val distributed = new Search(index, maxLocalPostings = 0)

  private val engineCriteria = Seq(Criterion.Words, Criterion.Typo,
    Criterion.Proximity, Criterion.Attribute, Criterion.Exactness)

  private def check(name: String, req: SearchRequest): Unit = test(name) {
    val l = local.execute(req)
    val d = distributed.execute(req)
    l.documentsIds shouldBe d.documentsIds
    l.candidates shouldBe d.candidates
  }

  check("sort tag asc, sort-only criteria",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("tag", ascending = true)),
      criteriaOverride = Some(Seq(Criterion.Sort))))

  check("sort tag desc within full cascade",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("tag", ascending = false)),
      criteriaOverride = Some(
        Seq(Criterion.Words, Criterion.Sort) ++ engineCriteria.drop(1))))

  check("numeric sort asc_desc_rank desc, sort first",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("asc_desc_rank", ascending = false)),
      criteriaOverride = Some(Criterion.Sort +: engineCriteria)))

  check("asc criterion (settings-style)",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      criteriaOverride = Some(Seq(Criterion.Words,
        Criterion.Asc("asc_desc_rank"), Criterion.Exactness))))

  check("desc criterion with filter and offset",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 5, offset = 3,
      strategy = MatchingStrategy.Last,
      filter = Some("asc_desc_rank > 0"),
      criteriaOverride = Some(Seq(Criterion.Desc("asc_desc_rank"),
        Criterion.Words))))

  check("geo point sort",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("_geo", ascending = true,
        geoPoint = Some((50.630010347667806, 3.086251829166809)))),
      criteriaOverride = Some(Seq(Criterion.Sort))))

  check("geo point sort desc within cascade",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("_geo", ascending = false,
        geoPoint = Some((35.85, 23.33)))),
      criteriaOverride = Some(
        Seq(Criterion.Words, Criterion.Typo, Criterion.Sort))))

  check("two sort entries (geo then field)",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(
        SortSpec("_geo", ascending = true,
          geoPoint = Some((50.630010347667806, 3.086251829166809))),
        SortSpec("tag", ascending = true)),
      criteriaOverride = Some(Seq(Criterion.Sort, Criterion.Words))))

  check("distinct on tag (full cascade)",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      distinctOverride = Some(Some("tag")),
      criteriaOverride = Some(engineCriteria)))

  check("distinct with sort and offset",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 5, offset = 2,
      strategy = MatchingStrategy.Last,
      distinctOverride = Some(Some("tag")),
      sortCriteria = Seq(SortSpec("asc_desc_rank", ascending = true)),
      criteriaOverride = Some(Criterion.Sort +: engineCriteria)))

  check("distinct with filter",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      filter = Some("asc_desc_rank > 0"),
      distinctOverride = Some(Some("tag")),
      criteriaOverride = Some(engineCriteria)))

  check("distinct on the no-rank bitmap path (criteria empty)",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 17,
      strategy = MatchingStrategy.Last,
      distinctOverride = Some(Some("tag")),
      criteriaOverride = Some(Nil)))

  check("distinct + cached filter bitmap on the no-rank path",
    SearchRequest(query = Some(Fixture.TestQuery), limit = 9,
      strategy = MatchingStrategy.Last,
      filter = Some("asc_desc_rank > 0"),
      distinctOverride = Some(Some("tag")),
      criteriaOverride = Some(Nil)))

  test("local path actually engages for pinnable sorts") {
    // the pinned maps must exist for the fixture corpus — otherwise the
    // parity above silently tested distributed ≡ distributed
    index.sortValuesLocal("tag").isDefined shouldBe true
    index.sortValuesLocal("asc_desc_rank").isDefined shouldBe true
    index.geoLocal.isDefined shouldBe true
  }
}
