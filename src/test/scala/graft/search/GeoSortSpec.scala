package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import QueryTree.MatchingStrategy

/** Geo criterion analogue: Sort by haversine distance to a point must
  * reproduce the fixture's geo_rank order (geo_rank = distance from the
  * reference point used by the geo tests). */
class GeoSortSpec extends AnyFunSuite with Matchers {
  test("sort by _geoPoint distance matches geo_rank order") {
    val index = Fixture.buildIndex(TestSpark.spark)
    val search = new Search(index)
    val r = search.execute(SearchRequest(
      query = Some(Fixture.TestQuery),
      limit = 17,
      strategy = MatchingStrategy.Last,
      sortCriteria = Seq(SortSpec("_geo", ascending = true,
        geoPoint = Some((50.630010347667806, 3.086251829166809)))),
      criteriaOverride = Some(Seq(Criterion.Sort))))
    val got = r.documentsIds.map(i => Fixture.docs(i).id)
    val want = Fixture.docs.sortBy(d => (d.geoRank, d.docid)).map(_.id)
    got shouldBe want
  }
}
