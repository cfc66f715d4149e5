package graft.search

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}
import graft.webgen.WebPages

/** The no-rank candidates/count fast path must (a) be bitmap-resolved off
  * `word_docids` / `word_prefix_docids` point reads with NO
  * `doc_word_positions` scan (milli criteria/mod.rs:590-637 — one
  * pre-unioned row per prefix instead of every extension's postings), and
  * (b) agree exactly with the distributed rank path on ids and counts. */
class CandidatesFastPathSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val stg = IndexSettings(
    searchableFields = Seq("text"), filterableFields = Set("lang"))
  private lazy val dir: String = {
    val d = graft.TestSpark.tempDir("graft-candfast")
    val docs = WebPages.generate(spark, 2000)
    new IndexBuilder(spark, stg).build(docs, d, resume = false)
    d
  }
  private lazy val index = GraftIndex(spark, dir, stg)
  /** throws if the fast path ever scans the forward index */
  private lazy val guarded: GraftIndex = {
    dir // force build
    new GraftIndex(spark, dir, stg) {
      override lazy val docWordPositions: DataFrame =
        throw new IllegalStateException(
          "doc_word_positions scanned on the bitmap candidates fast path")
    }
  }

  private def run(s: Search, q: String, filter: Option[String] = None,
      typos: Boolean = false) =
    s.execute(SearchRequest(query = Some(q), filter = filter, limit = 100000,
      authorizeTypos = typos, criteriaOverride = Some(Nil)))

  private def compare(q: String, filter: Option[String] = None,
      typos: Boolean = false): Unit = {
    val fast = run(new Search(guarded), q, filter, typos)
    val dist = run(new Search(index, maxLocalPostings = 0), q, filter, typos)
    fast.documentsIds shouldBe dist.documentsIds
    fast.candidates shouldBe dist.candidates
    fast.candidates should be > 0L
  }

  test("prefix query reads the prefix tables, not the extension scan") {
    compare("w1") // no trailing space → prefix; many w1* extensions
  }

  test("long prefix (outside the prefix dict) uses the range union") {
    compare("w100") // 4+ chars; few extensions → dictionary-miss fallback
  }

  test("multi-word AND query via word_docids bitmaps") {
    compare("w3 w17 ") // trailing space → non-prefix words
  }

  test("typo-tolerant no-rank query unions derivation bitmaps") {
    compare("w3 ", typos = true)
  }

  test("filtered no-rank query: bitmap literal + distributed filter") {
    compare("w1 ", filter = Some("lang = en"))
  }

  test("pagination slices the bitmap iteration") {
    val fast = new Search(guarded).execute(SearchRequest(query = Some("w1 "),
      offset = 5, limit = 10, criteriaOverride = Some(Nil)))
    val dist = new Search(index, maxLocalPostings = 0).execute(SearchRequest(
      query = Some("w1 "), offset = 5, limit = 10, criteriaOverride = Some(Nil)))
    fast.documentsIds shouldBe dist.documentsIds
    fast.candidates shouldBe dist.candidates
  }
}
