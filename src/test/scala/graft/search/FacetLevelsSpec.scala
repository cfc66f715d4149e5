package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}

/** The facet level-tree reader must (a) return exactly the value-scan
  * result for every range shape, (b) actually take whole pre-unioned
  * groups from levels > 0 on wide ranges (the point of maintaining the
  * tree), and (c) agree on both serving shapes — pinned upper levels and
  * the per-level ranged-fetch fallback for fields too big to pin. */
class FacetLevelsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val stg = IndexSettings(searchableFields = Seq("text"),
    filterableFields = Set("n", "s"))

  // 700 docs, n = 0..699 (distinct doubles → 4 levels), s = zero-padded
  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.TestSpark.tempDir("graft-facetlevels")
    val docs = (0 until 700).map { i =>
      (i, s"doc about w$i things", i.toDouble, f"s$i%04d")
    }.toDF("docid", "text", "n", "s")
    new IndexBuilder(spark, stg).build(docs, d, resume = false)
    d
  }
  private lazy val index = GraftIndex(spark, dir, stg)

  private def viaFilter(f: String): Set[Int] = {
    import spark.implicits._
    FilterEvaluator.candidates(index, FilterParser.parse(f))
      .select($"docid").as[Int].collect().toSet
  }

  test("numeric ranges match brute force on every shape") {
    def expectN(p: Int => Boolean): Set[Int] = (0 until 700).filter(p).toSet
    viaFilter("n 100 TO 499") shouldBe expectN(i => i >= 100 && i <= 499)
    viaFilter("n > 650") shouldBe expectN(_ > 650)
    viaFilter("n >= 650") shouldBe expectN(_ >= 650)
    viaFilter("n < 23") shouldBe expectN(_ < 23)
    viaFilter("n <= 23") shouldBe expectN(_ <= 23)
    viaFilter("n 0 TO 699") shouldBe expectN(_ => true)
    viaFilter("n 699 TO 699") shouldBe Set(699)
    viaFilter("n 700 TO 800") shouldBe Set.empty
    viaFilter("n 13 TO 13") shouldBe Set(13)
  }

  test("string ranges match brute force") {
    def expectS(p: String => Boolean): Set[Int] =
      (0 until 700).filter(i => p(f"s$i%04d")).toSet
    viaFilter("s > s0100") shouldBe expectS(_ > "s0100")
    viaFilter("s <= s0042") shouldBe expectS(_ <= "s0042")
  }

  test("wide ranges take pre-unioned groups from levels above 0") {
    val r = FacetLevels.rangeDocids(index, numeric = true, "n",
      Some(50.0), Some(600.0), loIncl = true, hiIncl = true).get
    r.interiorLevelMax should be >= 1
    r.docids.getLongCardinality shouldBe 551L
  }

  test("per-level ranged-fetch path (field too big to pin) agrees") {
    val saved = FacetLevels.MaxPinnedRows
    try {
      FacetLevels.MaxPinnedRows = 0
      // a fresh handle key → re-probes with the new cap
      val idx2 = GraftIndex(spark, dir, stg)
      val r = FacetLevels.rangeDocids(idx2, numeric = true, "n",
        Some(100.0), Some(499.0), loIncl = true, hiIncl = true).get
      r.interiorLevelMax should be >= 1
      import spark.implicits._
      val viaIdx2 = FilterEvaluator.candidates(idx2,
          FilterParser.parse("n 100 TO 499"))
        .select($"docid").as[Int].collect().toSet
      viaIdx2 shouldBe (100 to 499).toSet
    } finally FacetLevels.MaxPinnedRows = saved
  }

  test("fields without a level tree fall back to the value scan") {
    // lang-like low-cardinality field: build a tiny index with 8 values
    import spark.implicits._
    val d = graft.TestSpark.tempDir("graft-fl-small")
    val stg2 = IndexSettings(searchableFields = Seq("text"),
      filterableFields = Set("k"))
    val docs = (0 until 40).map(i => (i, s"w$i", (i % 8).toDouble))
      .toDF("docid", "text", "k")
    new IndexBuilder(spark, stg2).build(docs, d, resume = false)
    val small = GraftIndex(spark, d, stg2)
    FacetLevels.rangeDocids(small, numeric = true, "k",
      Some(2.0), Some(5.0), loIncl = true, hiIncl = true) shouldBe None
    FilterEvaluator.candidates(small, FilterParser.parse("k 2 TO 5"))
      .select($"docid").as[Int].collect().toSet shouldBe
      (0 until 40).filter(i => (i % 8) >= 2 && (i % 8) <= 5).toSet
  }
}
