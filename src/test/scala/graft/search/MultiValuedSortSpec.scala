package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}

/** Facet sort over MULTI-VALUED fields follows milli's keep-first group
  * iteration (facet_sort_ascending.rs:14-31: "once a document id is
  * returned by the iterator, it is never returned again"): ascending ranks
  * a doc at its MINIMUM value, descending at its MAXIMUM, numbers come
  * before strings in both directions, docs without the field come last,
  * and no page ever repeats a docid. Pinned-local and distributed paths
  * must agree with the hand-computed order. */
class MultiValuedSortSpec extends AnyFunSuite with Matchers {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row

  private lazy val spark = TestSpark.spark

  private lazy val index: GraftIndex = {
    val dir = graft.TestSpark.tempDir("graft-mvsort")
    val settings = IndexSettings(searchableFields = Seq("text"),
      filterableFields = Set("price", "color"),
      sortableFields = Set("price", "color"), primaryKey = "docid")
    val docs = spark.createDataFrame(
      Seq(
        Row(0, "item zero"), Row(1, "item one"), Row(2, "item two"),
        Row(3, "item three"), Row(4, "item four"), Row(5, "item five")
      ).asJava,
      StructType(Seq(StructField("docid", IntegerType),
        StructField("text", StringType))))
    // multi-valued facets: price per doc — 0:[30,7] 1:[5,40] 2:[12] 3:[22]
    // 4:none 5:[9,9]; color — 0:[blue,green] 1:[blue,red] 2:[orange,red]
    // 3:[green,red] 4:[blue,orange,red] 5:none
    val numRows = Seq(
      (0, 30.0), (0, 7.0), (1, 5.0), (1, 40.0), (2, 12.0), (3, 22.0),
      (5, 9.0), (5, 9.0)).map { case (d, v) => Row("price", d, v) }
    val strRows = Seq(
      (0, "blue"), (0, "green"), (1, "blue"), (1, "red"), (2, "orange"),
      (2, "red"), (3, "green"), (3, "red"), (4, "blue"), (4, "orange"),
      (4, "red")).map { case (d, s) => Row("color", d, s, s) }
    val exRows = (0 to 5).flatMap { d =>
      (if (d == 4) Seq.empty else Seq(Row("price", d))) ++
        (if (d == 5) Seq.empty else Seq(Row("color", d)))
    }
    val fNum = spark.createDataFrame(numRows.asJava, StructType(Seq(
      StructField("field", StringType), StructField("docid", IntegerType),
      StructField("value", DoubleType))))
    val fStr = spark.createDataFrame(strRows.asJava, StructType(Seq(
      StructField("field", StringType), StructField("docid", IntegerType),
      StructField("norm", StringType), StructField("orig", StringType))))
    val fEx = spark.createDataFrame(exRows.asJava, StructType(Seq(
      StructField("field", StringType), StructField("docid", IntegerType))))
    new IndexBuilder(spark, settings).build(docs, dir, resume = false,
      facetOverride = Some((fNum, fStr, fEx)))
    GraftIndex(spark, dir, settings)
  }

  private def run(s: Search, field: String, asc: Boolean): Seq[Int] =
    s.execute(SearchRequest(query = Some("item "), limit = 10,
      sortCriteria = Seq(SortSpec(field, ascending = asc)),
      criteriaOverride = Some(Seq(Criterion.Sort)), exhaustive = true))
      .documentsIds

  private lazy val local = new Search(index)
  private lazy val distributed = new Search(index, maxLocalPostings = 0)

  test("ascending multi-valued numeric: doc ranks at its MIN value; absent last") {
    // mins: 1→5, 0→7, 5→9, 2→12, 3→22; 4 has no price → last
    val expect = Seq(1, 0, 5, 2, 3, 4)
    run(local, "price", asc = true) shouldBe expect
    run(distributed, "price", asc = true) shouldBe expect
  }

  test("descending multi-valued numeric: doc ranks at its MAX value; absent last") {
    // maxes: 1→40, 0→30, 3→22, 2→12, 5→9; 4 absent → last
    val expect = Seq(1, 0, 3, 2, 5, 4)
    run(local, "price", asc = false) shouldBe expect
    run(distributed, "price", asc = false) shouldBe expect
  }

  test("ascending multi-valued string: doc ranks at its MIN value; absent last") {
    // mins: 0→blue, 1→blue, 4→blue (tie docid), 3→green, 2→orange; 5 last
    val expect = Seq(0, 1, 4, 3, 2, 5)
    run(local, "color", asc = true) shouldBe expect
    run(distributed, "color", asc = true) shouldBe expect
  }

  test("descending multi-valued string: doc ranks at its MAX value; absent last") {
    // maxes: 1→red, 2→red, 3→red, 4→red (tie docid), 0→green; 5 absent last
    val expect = Seq(1, 2, 3, 4, 0, 5)
    run(local, "color", asc = false) shouldBe expect
    run(distributed, "color", asc = false) shouldBe expect
  }

  test("no page ever repeats a docid (un-aggregated join regression)") {
    Seq(true, false).foreach { asc =>
      Seq("price", "color").foreach { f =>
        val ids = run(distributed, f, asc)
        withClue(s"field $f asc=$asc: ")(ids.distinct shouldBe ids)
      }
    }
  }

  test("sort-LED cascade on an unpinnable field: remaining criteria order " +
      "WITHIN each value group, parity with distributed") {
    // price ties force real within-group work: docs 0-3 share price 5
    // (one value group) but differ in words/typo rank for "item alpha";
    // docs 4-5 share price 9. The walk alone would emit docid order —
    // only the nested cascade gives the distributed order.
    val dir = graft.TestSpark.tempDir("graft-cascsort")
    val settings = IndexSettings(searchableFields = Seq("text"),
      filterableFields = Set("price"), sortableFields = Set("price"),
      primaryKey = "docid")
    val docs = spark.createDataFrame(
      Seq(
        Row(0, "item"), Row(1, "item alpha"), Row(2, "item alpfa"),
        Row(3, "alpha item"), Row(4, "item"), Row(5, "item alpha")
      ).asJava,
      StructType(Seq(StructField("docid", IntegerType),
        StructField("text", StringType))))
    val fNum = spark.createDataFrame(
      Seq(Row("price", 0, 5.0), Row("price", 1, 5.0), Row("price", 2, 5.0),
        Row("price", 3, 5.0), Row("price", 4, 9.0), Row("price", 5, 9.0)).asJava,
      StructType(Seq(StructField("field", StringType),
        StructField("docid", IntegerType), StructField("value", DoubleType))))
    val fStr = spark.createDataFrame(
      Seq.empty[Row].asJava,
      StructType(Seq(StructField("field", StringType),
        StructField("docid", IntegerType), StructField("norm", StringType),
        StructField("orig", StringType))))
    val fEx = spark.createDataFrame(
      (0 to 5).map(d => Row("price", d)).asJava,
      StructType(Seq(StructField("field", StringType),
        StructField("docid", IntegerType))))
    new IndexBuilder(spark, settings).build(docs, dir, resume = false,
      facetOverride = Some((fNum, fStr, fEx)))

    val prevPin = GraftIndex.MaxSortPinRows
    GraftIndex.MaxSortPinRows = 0
    try {
      val fresh = new Search(GraftIndex(spark, dir, settings))
      val dist = new Search(GraftIndex(spark, dir, settings),
        maxLocalPostings = 0)
      val walksBefore = FacetLevels.sortedWalks.get()
      val cascade = Seq(Criterion.Sort, Criterion.Words, Criterion.Typo,
        Criterion.Proximity, Criterion.Attribute, Criterion.Exactness)
      val shapes = Seq(
        SearchRequest(query = Some("item alpha "), limit = 10,
          sortCriteria = Seq(SortSpec("price", ascending = true)),
          criteriaOverride = Some(cascade)),
        SearchRequest(query = Some("item alpha "), limit = 10,
          sortCriteria = Seq(SortSpec("price", ascending = false)),
          criteriaOverride = Some(cascade)),
        // pagination across a group boundary
        SearchRequest(query = Some("item alpha "), limit = 3, offset = 2,
          sortCriteria = Seq(SortSpec("price", ascending = true)),
          criteriaOverride = Some(cascade)),
        // settings-style Asc criterion leading the cascade
        SearchRequest(query = Some("item alpha "), limit = 10,
          criteriaOverride = Some(Seq(Criterion.Asc("price"),
            Criterion.Words, Criterion.Typo, Criterion.Exactness))))
      shapes.zipWithIndex.foreach { case (req, i) =>
        val l = fresh.execute(req)
        val d = dist.execute(req)
        withClue(s"shape $i: ") {
          l.documentsIds shouldBe d.documentsIds
          l.candidates shouldBe d.candidates
        }
      }
      // and the cascade genuinely reorders inside the tied group: docs
      // 1/3/5 (both words) outrank 2 (typo) outrank 0/4 (words bucket 1)
      val full = fresh.execute(SearchRequest(query = Some("item alpha "),
        limit = 10, sortCriteria = Seq(SortSpec("price", ascending = true)),
        criteriaOverride = Some(cascade)))
      full.documentsIds.take(2).toSet shouldBe Set(1, 3)
      withClue("cascade walk never engaged: ")(
        FacetLevels.sortedWalks.get() should be > walksBefore)
    } finally GraftIndex.MaxSortPinRows = prevPin
  }

  test("unpinnable fields sort through the facet level-tree walk, same order") {
    // force the unpinnable path: pin cap 0 on a FRESH handle (pins are
    // cached per handle) — the sorted walk must engage and agree with the
    // pinned/distributed order on every direction and field
    val prevPin = GraftIndex.MaxSortPinRows
    GraftIndex.MaxSortPinRows = 0
    try {
      val fresh = new Search(GraftIndex(spark, index.dir, index.settings))
      val walksBefore = FacetLevels.sortedWalks.get()
      Seq(
        ("price", true, Seq(1, 0, 5, 2, 3, 4)),
        ("price", false, Seq(1, 0, 3, 2, 5, 4)),
        ("color", true, Seq(0, 1, 4, 3, 2, 5)),
        ("color", false, Seq(1, 2, 3, 4, 0, 5))
      ).foreach { case (f, asc, expect) =>
        withClue(s"field $f asc=$asc: ")(run(fresh, f, asc) shouldBe expect)
      }
      withClue("level-tree walk never engaged: ")(
        FacetLevels.sortedWalks.get() should be > walksBefore)
    } finally GraftIndex.MaxSortPinRows = prevPin
  }
}
