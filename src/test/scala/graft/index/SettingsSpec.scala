package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.search.{GraftIndex, Search, SearchRequest}
import graft.webgen.WebPages

/** Settings persistence round-trip + diff-based update planner/executor. */
class SettingsSpec extends AnyFunSuite with Matchers {

  test("settings.json round-trips through the builder") {
    val spark = TestSpark.spark
    val dir = graft.TestSpark.tempDir("graft-settings")
    val s = IndexSettings(
      searchableFields = Seq("text"),
      filterableFields = Set("lang"),
      synonyms = Map("a" -> Seq("b c")),
      stopWords = Set("the"),
      distinctField = Some("lang"),
      primaryKey = "url")
    new IndexBuilder(spark, s).build(WebPages.generate(spark, 50), dir, resume = false)
    SettingsIO.load(dir) shouldBe Some(s)
    GraftIndex.open(spark, dir).settings shouldBe s
  }

  test("settings diff plans the minimal rebuild") {
    val u = new SettingsUpdater(TestSpark.spark)
    val base = IndexSettings(searchableFields = Seq("text"))
    u.plan(base, base) shouldBe u.Plan(false, false)
    u.plan(base, base.copy(synonyms = Map("x" -> Seq("y")))) shouldBe
      u.Plan(false, false) // query-time only
    u.plan(base, base.copy(filterableFields = Set("lang"))) shouldBe
      u.Plan(false, true) // facets only
    u.plan(base, base.copy(stopWords = Set("the"))) shouldBe
      u.Plan(true, false) // reindex
    u.plan(base, base.copy(exactAttributes = Set("text"))) shouldBe
      u.Plan(true, false)
  }

  test("facets-only update adds filterability without touching postings") {
    val spark = TestSpark.spark
    val dir = graft.TestSpark.tempDir("graft-settings2")
    val base = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    new IndexBuilder(spark, base).build(WebPages.generate(spark, 100), dir, resume = false)
    val wordDocidsBefore = spark.read.parquet(s"$dir/${IndexSettings.T.WordDocids}").count()

    val withFacets = base.copy(filterableFields = Set("lang"))
    val plan = new SettingsUpdater(spark).update(dir, withFacets)
    plan shouldBe new SettingsUpdater(spark).Plan(false, true)

    val index = GraftIndex.open(spark, dir)
    index.settings.filterableFields shouldBe Set("lang")
    // the facet filter now works
    val r = new Search(index).execute(SearchRequest(
      query = Some("w1 "), filter = Some("lang = en"), limit = 200))
    r.documentsIds should not be empty
    // postings untouched
    spark.read.parquet(s"$dir/${IndexSettings.T.WordDocids}").count() shouldBe
      wordDocidsBefore
  }

  test("stop-word change triggers full reindex and drops the word") {
    val spark = TestSpark.spark
    val dir = graft.TestSpark.tempDir("graft-settings3")
    val base = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    new IndexBuilder(spark, base).build(WebPages.generate(spark, 100), dir, resume = false)
    import spark.implicits._
    spark.read.parquet(s"$dir/${IndexSettings.T.WordDocids}")
      .where($"word" === "the").count() shouldBe 1

    new SettingsUpdater(spark).update(dir, base.copy(stopWords = Set("the")))
    spark.read.parquet(s"$dir/${IndexSettings.T.WordDocids}")
      .where($"word" === "the").count() shouldBe 0
  }
}
