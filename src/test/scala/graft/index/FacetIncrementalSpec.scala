package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Value-level incremental facet-tree maintenance must preserve exactly
  * what the reader relies on — per level, bounds strictly increase and a
  * group's bitmap equals the union of the level-0 values in its interval —
  * and range queries through FacetLevels must match brute force after any
  * sequence of merges. Tree SHAPE may drift from a bulk build (groups grow
  * to MaxGroupSize then split), like the reference's incremental trees
  * (incremental.rs); these invariants, not row identity, are the contract. */
class FacetIncrementalSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def valueRows(vs: Seq[(Double, Int)]): DataFrame = {
    import spark.implicits._
    vs.toDF("bound", "docid").select(lit("n").as("field"), $"bound", $"docid")
  }

  private def bulk(vs: Seq[(Double, Int)]): DataFrame =
    IndexBuilder.buildFacetLevels(spark,
      valueRows(vs).select(col("field"), col("bound"), col("docid")))

  /** (level -> sorted (bound, docids set, group_size)) for field n. */
  private def collectTree(levels: DataFrame)
      : Map[Int, Seq[(Double, Set[Int], Int)]] = {
    levels.where(col("field") === "n")
      .select(col("level"), col("bound").cast("double"),
        graft.functions.GraftFunctions.bitmap_to_array(col("docids")),
        col("group_size"))
      .collect()
      .map(r => (r.getInt(0), (r.getDouble(1),
        r.getSeq[Int](2).toSet, r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  /** Every level's bounds strictly increase; every group's bitmap equals
    * the union of level-0 docids in [bound, nextBound); level-0 coverage
    * starts at every level's first bound. */
  private def checkInvariants(levels: DataFrame): Unit = {
    val tree = collectTree(levels)
    val l0 = tree(0)
    tree.keys.toSeq.sorted.foreach { level =>
      val rows = tree(level)
      rows.map(_._1) shouldBe rows.map(_._1).sorted
      rows.map(_._1).distinct.size shouldBe rows.size
      if (level > 0) {
        rows.head._1 should be <= l0.head._1 // leftmost covers the minimum
        rows.zipWithIndex.foreach { case ((b, docs, _), i) =>
          val next = if (i + 1 < rows.length) rows(i + 1)._1 else Double.MaxValue
          val expected = l0.filter(v => v._1 >= b && v._1 < next)
            .flatMap(_._2).toSet
          withClue(s"level $level group $b: ") { docs shouldBe expected }
        }
      }
    }
  }

  /** Range query through the FacetLevels reader over a bare level table. */
  private def rangeVia(levels: DataFrame, lo: Double, hi: Double): Set[Int] = {
    val dir = graft.TestSpark.tempDir("graft-finc")
    levels.write.mode("overwrite").parquet(s"$dir/${IndexSettings.T.FacetNumberLevels}")
    val idx = graft.search.GraftIndex(spark, dir,
      IndexSettings(searchableFields = Seq("text")))
    val r = graft.search.FacetLevels.rangeDocids(idx, numeric = true, "n",
      Some(lo), Some(hi), loIncl = true, hiIncl = true)
    r.map(_.docids.toArray.toSet).getOrElse {
      // no tree (maxLevel 0): brute level-0 read
      collectTree(levels)(0).filter(v => v._1 >= lo && v._1 <= hi)
        .flatMap(_._2).toSet
    }
  }

  private def brute(vs: Seq[(Double, Int)], lo: Double, hi: Double): Set[Int] =
    vs.filter(v => v._1 >= lo && v._1 <= hi).map(_._2).toSet

  test("small delta merges in place: invariants + range parity + ancestor docids") {
    val base = (0 until 2000).map(i => (i.toDouble, i))
    val old = bulk(base)
    // 12 bounds: 6 existing values gain docids, 6 new values (interleaved)
    val deltaVals = (0 until 6).map(i => ((i * 300).toDouble, 10000 + i)) ++
      (0 until 6).map(i => (i * 300 + 0.5, 20000 + i))
    val m = FacetIncremental.merge(spark, old, valueRows(deltaVals))
    m.rebuildFields shouldBe empty
    val merged = m.rows.persist()
    checkInvariants(merged)
    val all = base ++ deltaVals
    for ((lo, hi) <- Seq((0.0, 1999.0), (100.0, 901.0), (299.5, 300.5),
        (0.0, 0.4), (1500.0, 3000.0))) {
      withClue(s"range [$lo,$hi]: ") {
        rangeVia(merged, lo, hi) shouldBe brute(all, lo, hi)
      }
    }
    merged.unpersist()
  }

  test("clustered inserts split overfull groups (row count grows, invariants hold)") {
    val base = (0 until 2000).map(i => (i.toDouble, i))
    val old = bulk(base)
    val l1Before = collectTree(old)(1).size
    // 10 new bounds inside ONE level-1 group interval (group of 4 → 14 → split)
    val deltaVals = (1 to 10).map(i => (100.0 + i * 0.1, 30000 + i))
    val m = FacetIncremental.merge(spark, old, valueRows(deltaVals))
    m.rebuildFields shouldBe empty
    val merged = m.rows.persist()
    val tree = collectTree(merged)
    tree(1).size should be > l1Before
    tree(1).map(_._3).max should be <= FacetIncremental.MaxGroupSize
    checkInvariants(merged)
    rangeVia(merged, 100.0, 101.0) shouldBe
      brute(base ++ deltaVals, 100.0, 101.0)
    merged.unpersist()
  }

  test("a new minimum lowers the leftmost bound at every level") {
    val base = (100 until 2100).map(i => (i.toDouble, i))
    val old = bulk(base)
    val deltaVals = Seq((-5.0, 40000))
    val m = FacetIncremental.merge(spark, old, valueRows(deltaVals))
    m.rebuildFields shouldBe empty
    val merged = m.rows.persist()
    val tree = collectTree(merged)
    tree.keys.foreach { level =>
      withClue(s"level $level: ") { tree(level).head._1 shouldBe -5.0 }
    }
    checkInvariants(merged)
    rangeVia(merged, -10.0, 100.0) shouldBe
      brute(base ++ deltaVals, -10.0, 100.0)
    merged.unpersist()
  }

  test("repeated small merges stay sound (drifted tree still exact)") {
    val rng = new scala.util.Random(7)
    var vals = (0 until 3000).map(i => (i.toDouble, i))
    var levels = bulk(vals)
    val dir = graft.TestSpark.tempDir("graft-finc-rounds")
    (1 to 4).foreach { round =>
      val delta = (1 to 20).map { i =>
        (rng.nextDouble() * 3500, 50000 + round * 100 + i)
      }
      val m = FacetIncremental.merge(spark, levels, valueRows(delta))
      m.rebuildFields shouldBe empty
      // materialize between batches like production writeOver does (the
      // chained logical plan would otherwise grow without bound)
      m.rows.write.mode("overwrite").parquet(s"$dir/r$round")
      levels = spark.read.parquet(s"$dir/r$round")
      vals = vals ++ delta
    }
    checkInvariants(levels)
    (1 to 10).foreach { _ =>
      val lo = rng.nextDouble() * 3000
      val hi = lo + rng.nextDouble() * 500
      withClue(s"range [$lo,$hi]: ") {
        rangeVia(levels, lo, hi) shouldBe brute(vals, lo, hi)
      }
    }
  }

  test("end-to-end: addDocuments maintains the tree value-incrementally") {
    import spark.implicits._
    val stg = IndexSettings(searchableFields = Seq("text"),
      filterableFields = Set("n"), primaryKey = "id")
    val dir = graft.TestSpark.tempDir("graft-finc-e2e")
    val base = (0 until 3000).map(i => (i, i, s"doc w$i", i.toDouble))
      .toDF("docid", "id", "text", "n")
    new IndexBuilder(spark, stg).build(base, dir, resume = false)
    val batch = (3000 until 3020).map(i => (i, i, s"doc w$i", i + 0.5))
      .toDF("docid", "id", "text", "n")
    new Updates(spark, stg).addDocuments(dir, batch)

    checkInvariants(spark.read.parquet(s"$dir/${IndexSettings.T.FacetNumberLevels}")
      .where(col("field") === "n")
      .select(col("field"), col("bound"), col("docids"), col("level"), col("group_size")))
    val idx = graft.search.GraftIndex(spark, dir, stg)
    val got = graft.search.FilterEvaluator
      .candidates(idx, graft.search.FilterParser.parse("n 2995 TO 3015.5"))
      .select($"docid").as[Int].collect().toSet
    got shouldBe ((2995 to 2999) ++ (3000 to 3015)).toSet
  }

  test("bulk fallbacks: big delta (1/50 rule), unknown field, top-level growth") {
    val base = (0 until 500).map(i => (i.toDouble, i))
    val old = bulk(base)
    // 1/50 criterion: 500 values → deltas of ≥ 10 bounds go bulk
    val big = (0 until 50).map(i => (5000.0 + i, 60000 + i))
    FacetIncremental.merge(spark, old, valueRows(big))
      .rebuildFields shouldBe Seq("n")
    // unknown field
    import spark.implicits._
    val other = Seq((1.0, 1)).toDF("bound", "docid")
      .select(lit("m").as("field"), $"bound", $"docid")
    FacetIncremental.merge(spark, old, other).rebuildFields shouldBe Seq("m")
  }
}
