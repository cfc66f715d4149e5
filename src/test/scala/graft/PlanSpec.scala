package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Physical-plan assertions: the optimizations the engine is designed
  * around must actually appear in `explain` output (they are what makes the
  * 100 TB plan viable, not incidental).
  */
class PlanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("word filters push down to the parquet scan (posting point-lookups)") {
    val index = graft.search.Fixture.buildIndex(spark)
    val df = index.docWordPositions
      .where(org.apache.spark.sql.functions.col("word").isin("hello", "world"))
    val p = plan(df)
    p should include("PushedFilters")
    p should include("In(word")
  }

  test("small-dimension join broadcasts (nation revenue)") {
    plan(Queries.qJoinNationRevenue(spark, sf)) should include("BroadcastHashJoin")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    plan(Queries.qTopkLineitem(spark, sf)) should include("TakeOrderedAndProject")
  }

  test("aggregation pipeline stays inside whole-stage codegen") {
    // AQE finalizes the plan on execution — run it, then inspect
    val df = Queries.q1Agg(spark, sf)
    df.collect()
    // "*(n)" node prefixes mark whole-stage-codegen stages in AQE plans
    df.queryExecution.executedPlan.toString should include("*(")
  }

  test("bitmap aggregation runs as partial + final hash aggregate") {
    graft.functions.GraftFunctions.registerAll(spark)
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "cast(l_partkey as int) as pk")
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.expr("bitmap_or_agg(pk)"))
    val p = plan(df)
    // partial aggregation = map-side combine: two (Object)HashAggregate
    // nodes around the shuffle
    "HashAggregate".r.findAllIn(p).size should be >= 2
    p should include("partial_bitmap_or_agg")
  }

  test("prefix query words push down as StartsWith to the posting scan") {
    val index = graft.search.Fixture.buildIndex(spark)
    val df = index.docWordPositions
      .where(org.apache.spark.sql.functions.col("word").startsWith("he"))
    val p = plan(df)
    p should include("PushedFilters")
    p should include("StringStartsWith(word,he)")
  }

  test("filter AST compiles to distributed joins, never a docid In-list") {
    val index = graft.search.Fixture.buildIndex(spark)
    val ast = graft.search.FilterParser.parse(
      "(tag = red OR asc_desc_rank > 1) AND NOT tag = green")
    val df = graft.search.FilterEvaluator.candidates(index, ast)
    val p = plan(df)
    p should not include "In(docid"
    p.toLowerCase should include("join")
  }

  test("_geoRadius filter is a distributed haversine join (no driver pivot)") {
    val index = graft.search.Fixture.buildIndex(spark)
    val ast = graft.search.FilterParser.parse("_geoRadius(50.6, 3.0, 100000)")
    val df = graft.search.FilterEvaluator.candidates(index, ast)
    val p = plan(df)
    p should include("haversine")
    p.toLowerCase should include("join")
  }

  test("facet level ranks: no per-field Window node; grouping stays exact") {
    graft.functions.GraftFunctions.registerAll(spark)
    val input = spark.range(300)
      .selectExpr("concat('f', cast(id % 3 as string)) as field",
        "cast(id as double) as bound", "cast(id as int) as docid")
    val df = graft.index.IndexBuilder.buildFacetLevels(spark, input)
    // rank assignment is range-partition + zipWithIndex + broadcast join —
    // a per-field Window would single-task high-cardinality facets
    df.queryExecution.analyzed.toString should not include "windowspecdefinition"
    val rows = df.select("field", "level", "bound", "group_size").collect()
    // 100 values/field: level0=100, level1=25 (groups of 4), level2=7, stop
    rows.count(r => r.getString(0) == "f0" && r.getInt(1) == 0) shouldBe 100
    rows.count(r => r.getString(0) == "f0" && r.getInt(1) == 1) shouldBe 25
    rows.count(r => r.getString(0) == "f0" && r.getInt(1) == 2) shouldBe 7
    // level-1 bounds are each group's LEFT bound: field f0 holds 0,3,6,…,297
    val l1 = rows.filter(r => r.getString(0) == "f0" && r.getInt(1) == 1)
      .map(_.getDouble(2)).sorted.toSeq
    l1 shouldBe (0 until 25).map(g => (g * 4 * 3).toDouble)
  }

  test("posting-block metadata reads prune the bytes column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val settings = graft.index.IndexSettings(searchableFields = Seq("text"))
    val docs = graft.webgen.WebPages.generate(spark, 200)
    new graft.index.IndexBuilder(spark, settings).build(docs, dir, resume = false)
    val index = graft.search.GraftIndex(spark, dir, settings)
    val metaScan = index.postingBlocks
      .where(org.apache.spark.sql.functions.col("word") === "w1")
      .select("word", "block_id", "max_docid", "max_tf", "count")
    val p = plan(metaScan)
    p should include("PushedFilters")
    p should not include "bytes"
  }
}
