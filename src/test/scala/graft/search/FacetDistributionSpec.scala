package graft.search

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}

/** Port of `/root/reference/milli/tests/search/facet_distribution.rs`:
  * fields with no facet values distribute to zero entries; array facets
  * count per element. */
class FacetDistributionSpec extends AnyFunSuite with Matchers {

  test("facet distribution with no facet values") {
    val spark = TestSpark.spark
    val dir = graft.TestSpark.tempDir("graft-facetdist")
    val settings = IndexSettings(
      searchableFields = Seq("title"),
      filterableFields = Set("genres", "tags"))
    val docs = spark.createDataFrame(
      Seq(Row(0, "What a week, hu..."), Row(1, "I am the pig!")).asJava,
      StructType(Seq(StructField("docid", IntegerType), StructField("title", StringType))))
    // facet rows like the reference docs: doc0 genres=[], tags=["blue"];
    // doc1 tags=["red"]
    val fNum = spark.createDataFrame(Seq.empty[Row].asJava,
      StructType(Seq(StructField("field", StringType), StructField("docid", IntegerType),
        StructField("value", DoubleType))))
    val fStr = spark.createDataFrame(
      Seq(Row("tags", 0, "blue", "blue"), Row("tags", 1, "red", "red")).asJava,
      StructType(Seq(StructField("field", StringType), StructField("docid", IntegerType),
        StructField("norm", StringType), StructField("orig", StringType))))
    val fEx = spark.createDataFrame(
      Seq(Row("genres", 0), Row("tags", 0), Row("tags", 1)).asJava,
      StructType(Seq(StructField("field", StringType), StructField("docid", IntegerType))))
    new IndexBuilder(spark, settings).build(docs, dir, resume = false,
      facetOverride = Some((fNum, fStr, fEx)))
    val index = GraftIndex(spark, dir, settings)
    val fd = new FacetDistribution(index)
    fd.execute(Seq("genres"))("genres") shouldBe empty
    fd.execute(Seq("tags"))("tags") shouldBe Seq(("blue", 1L), ("red", 1L))
  }

  test("facet distribution over the fixture corpus with candidates") {
    val spark = TestSpark.spark
    val index = Fixture.buildIndex(spark)
    val fd = new FacetDistribution(index)
    val all = fd.execute(Seq("tag"))("tag")
    all.map(_._2).sum shouldBe 17
    all.map(_._1).toSet shouldBe Fixture.docs.map(_.tag).toSet
    // restricted to docs 0..4
    val bm = graft.core.Bitmaps.fromInts(0 until 5)
    val restricted = fd.execute(Seq("tag"), Some(bm))("tag")
    restricted.map(_._2).sum shouldBe 5
  }

  test("local (pinned-rows) distribution ≡ distributed aggregation") {
    val spark = TestSpark.spark
    val index = Fixture.buildIndex(spark)
    val fd = new FacetDistribution(index)
    index.facetRowsLocal("tag").isDefined shouldBe true
    Seq(None, Some(graft.core.Bitmaps.fromInts(0 until 9)),
      Some(graft.core.Bitmaps.fromInts(Seq(3, 7, 11, 16)))).foreach { cand =>
      val local = fd.execute(Seq("tag", "opt1.opt2"), cand)
      val dist = fd.execute(Seq("tag", "opt1.opt2"), cand, allowLocal = false)
      local shouldBe dist
    }
    // cap parity
    fd.execute(Seq("tag"), None, maxValuesPerFacet = 2) shouldBe
      fd.execute(Seq("tag"), None, maxValuesPerFacet = 2, allowLocal = false)
  }
}
