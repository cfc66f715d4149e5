package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import QueryTree.MatchingStrategy

/** Port of `/root/reference/milli/tests/search/typo_tolerance.rs`:
  * min-word-length typo settings, exact_words, exact_attributes. */
class TypoToleranceSpec extends AnyFunSuite with Matchers {

  private def searchWith(index: GraftIndex, q: String): Int =
    new Search(index).execute(SearchRequest(
      query = Some(q), limit = 10,
      strategy = MatchingStrategy.Last,
      authorizeTypos = true,
      criteriaOverride = Some(Seq(Criterion.Typo)))).documentsIds.size

  test("typo_tolerance_one_typo") {
    val spark = TestSpark.spark
    val index = Fixture.buildIndex(spark)
    searchWith(index, "zeal") shouldBe 1
    searchWith(index, "zean") shouldBe 0
    // min_word_len_one_typo = 4 → "zean" now tolerant
    val tweaked = GraftIndex(spark, index.dir, index.settings.copy(minWordLenOneTypo = 4))
    searchWith(tweaked, "zean") shouldBe 1
  }

  test("typo_tolerance_two_typo") {
    val spark = TestSpark.spark
    val index = Fixture.buildIndex(spark)
    searchWith(index, "zealand") shouldBe 1
    searchWith(index, "zealemd") shouldBe 0
    val tweaked = GraftIndex(spark, index.dir, index.settings.copy(minWordLenTwoTypos = 7))
    searchWith(tweaked, "zealemd") shouldBe 1
  }

  test("typo_disabled_on_word (exact_words)") {
    val spark = TestSpark.spark
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val dir = graft.TestSpark.tempDir("graft-exactwords")
    val settings = IndexSettings(searchableFields = Seq("data"), primaryKey = "id")
    val docs = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(0, "zealand"), org.apache.spark.sql.Row(1, "zearand")).asJava,
      StructType(Seq(StructField("docid", IntegerType), StructField("data", StringType))))
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    val index = GraftIndex(spark, dir, settings)
    searchWith(index, "zealand") shouldBe 2
    val exact = GraftIndex(spark, dir, settings.copy(exactWords = Set("zealand")))
    searchWith(exact, "zealand") shouldBe 1
  }

  test("disable_typo_on_attribute (exact_attributes)") {
    val spark = TestSpark.spark
    val index = Fixture.buildIndex(spark)
    searchWith(index, "antebelum") shouldBe 1
    // exact_attributes = {description} requires a REINDEX (the exact/word
    // docids split happens at extraction time)
    val exactIdx = Fixture.buildIndex(spark, exactAttributes = Set("description"))
    searchWith(exactIdx, "antebelum") shouldBe 0
  }
}
