package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import graft.webgen.WebPages

/** The (typo, proximity) bitmap CELL drain must be invisible in results:
  * for every eligible shape the local path (which now subdivides big words
  * buckets into typo/prox cells and per-doc-ranks only the leading cells)
  * returns EXACTLY the forced-distributed path's ids and counts — across
  * criteria orders, prefixes, typos, filters, multi-word trees and
  * pagination. Also pins that the drain actually ENGAGES on the shapes it
  * is built for (a silently-never-taken fast path is worse than none). */
class CellDrainSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val stg = IndexSettings(
    searchableFields = Seq("text"), filterableFields = Set("lang"))
  private lazy val dir: String = {
    val d = graft.TestSpark.tempDir("graft-celldrain")
    new IndexBuilder(spark, stg).build(WebPages.generate(spark, 4000), d, resume = false)
    d
  }
  private lazy val index = GraftIndex(spark, dir, stg)

  private def compare(q: String, filter: Option[String] = None,
      criteria: Option[Seq[Criterion]] = None, limit: Int = 20,
      offset: Int = 0, typos: Boolean = true): Unit = {
    val req = SearchRequest(query = Some(q), filter = filter, limit = limit,
      offset = offset, authorizeTypos = typos, criteriaOverride = criteria)
    val local = new Search(index).execute(req)
    val dist = new Search(index, maxLocalPostings = 0).execute(req)
    withClue(s"query=$q criteria=$criteria filter=$filter offset=$offset: ") {
      local.documentsIds shouldBe dist.documentsIds
      local.candidates shouldBe dist.candidates
    }
  }

  test("2-word stop/common query engages the cell drain and stays rank-identical") {
    val before = RankCells.drains.get()
    compare("the w100 ")
    compare("the of ")
    compare("w3 w17 ")
    RankCells.drains.get() should be > before
  }

  test("trailing prefix (prefix-side pair fetch) stays rank-identical") {
    val before = RankCells.drains.get()
    compare("the w1") // prefix w1 covers w1, w10..w19, w100..: big, mixed buckets
    compare("w3 w17") // rarer prefix
    RankCells.drains.get() should be > before
  }

  test("dict-prefix prox cells point-read the precomputed prefix-pair tables") {
    // "w1" is a len-2 prefix-dict entry → its (word, prefix) prox rows must
    // come from word_prefix_pair_proximity_docids / prefix_word_pair_…
    // point reads (#8/#9), NEVER from a per-query ranged aggregation over
    // the pair table (the reference reads those tables the same way,
    // criteria/mod.rs:656-707)
    val ranged0 = index.prefixPairRangedReads.get()
    val point0 = index.prefixPairPointReads.get()
    compare("the w1")
    compare("of w9")
    index.prefixPairRangedReads.get() shouldBe ranged0
    assert(index.prefixPairPointReads.get() > point0,
      "expected the drain to fetch from the precomputed prefix-pair tables")
    // and warm repeats run from the driver cache: no further fetches of
    // either kind
    val point1 = index.prefixPairPointReads.get()
    compare("the w1")
    index.prefixPairPointReads.get() shouldBe point1
    index.prefixPairRangedReads.get() shouldBe ranged0
  }

  test("3-word query: prox dim unsupported (And of 3) → typo-only cells, identical") {
    compare("the w0 w1 ")
    compare("the of w10 ")
  }

  test("typo'd long words stratify typo cells, identical") {
    // w1234 (len 5) gets a 1-typo budget; w123 (len 4) none
    compare("w1234 w123 ")
    compare("the w1234 ")
    compare("w1234 w5678 ", typos = true)
    compare("w1234 w5678 ", typos = false)
  }

  test("criteria permutations: proximity-first, typo-only, prox-only, degenerate") {
    import Criterion._
    compare("the w100 ", criteria = Some(Seq(Words, Proximity, Typo, Attribute)))
    compare("the w100 ", criteria = Some(Seq(Words, Typo)))
    compare("the w100 ", criteria = Some(Seq(Words, Proximity)))
    compare("the w100 ", criteria = Some(Seq(Typo, Words, Proximity))) // not words-first
    compare("the w100 ", criteria = Some(Seq(Words)))
  }

  test("filters compose with the cell drain") {
    compare("the w100 ", filter = Some("lang = en"))
    compare("the w100 ", filter = Some("lang != en"))
    compare("the w17 ", filter = Some("lang IN [fr, de]"))
  }

  test("pagination beyond the leading cells") {
    compare("the w100 ", offset = 30, limit = 25)
    compare("the of ", offset = 100, limit = 40)
  }

  test("phrase branches fall back and still agree") {
    compare("\"the w100\" ")
    compare("\"w3 w17\" the ")
  }
}
