package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.{IndexBuilder, IndexSettings}

/** Index→search round-trip over a CJK / mixed-script corpus: the
  * deterministic script-aware segmentation (Han unigrams, kana/hangul
  * segments — `core/Tokenizer.segmentRun`) must be symmetrical between the
  * indexer and the query parser, so CJK queries recall CJK documents even
  * though no dictionary segmenter exists in this build (SURVEY §8 documents
  * the divergence from charabia's jieba/lindera). */
class CjkSearchSpec extends AnyFunSuite with Matchers {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row

  private lazy val spark = TestSpark.spark
  private lazy val settings =
    IndexSettings(searchableFields = Seq("text"), primaryKey = "docid")

  private lazy val index: GraftIndex = {
    val dir = graft.TestSpark.tempDir("graft-cjk")
    val docs = spark.createDataFrame(
      Seq(
        Row(0, "東京大学の研究"),              // Tokyo University research (ja)
        Row(1, "京都は美しい"),                // Kyoto is beautiful (ja)
        Row(2, "北京大学欢迎你"),              // Peking University welcomes you (zh)
        Row(3, "データベース検索エンジン"),    // database search engine (katakana+kanji)
        Row(4, "한국어 검색 엔진"),            // Korean search engine (ko)
        Row(5, "plain english document about search engines"),
        Row(6, "mixed 東京 and english text")
      ).asJava,
      StructType(Seq(StructField("docid", IntegerType),
        StructField("text", StringType))))
    new IndexBuilder(spark, settings).build(docs, dir, resume = false)
    GraftIndex(spark, dir, settings)
  }

  private def ids(q: String, exhaustive: Boolean = true): Seq[Int] =
    new Search(index).execute(SearchRequest(query = Some(q), limit = 10,
      exhaustive = exhaustive)).documentsIds.sorted

  test("Han unigram query recalls every doc containing the ideographs") {
    // 大学 segments to [大, 学]; docs 0 and 2 contain both
    ids("大学 ") should contain allOf (0, 2)
  }

  test("single ideograph matches across word contexts") {
    // 京 appears in 東京 (0, 6), 京都 (1), and 北京 (2)
    ids("京 ") shouldBe Seq(0, 1, 2, 6)
  }

  test("proximity ranks the contiguous ideograph pair first") {
    // both 0 and 2 contain 大+学 adjacent; doc 1 has neither; ranked search
    // puts adjacent-unigram docs ahead of any scattered match
    val r = new Search(index).execute(
      SearchRequest(query = Some("東京 "), limit = 10, exhaustive = false))
    // 東京 as adjacent unigrams: docs 0 and 6; doc 1 (京都) has 京 but not 東
    r.documentsIds.take(2).toSet shouldBe Set(0, 6)
  }

  test("katakana segment is a whole word") {
    ids("データベース ") shouldBe Seq(3)
    // katakana prefix (last query word is a prefix): データ matches データベース
    ids("データ", exhaustive = true) shouldBe Seq(3)
  }

  test("hangul words are whitespace-delimited whole words") {
    ids("검색 ") shouldBe Seq(4)
    ids("한국어 검색 ") shouldBe Seq(4)
  }

  test("CJK phrase query enforces adjacency of the unigrams") {
    // "北京大学" quoted: 北 京 大 学 must be consecutive — only doc 2
    ids("\"北京大学\"") shouldBe Seq(2)
    // 東京大学 quoted matches doc 0 only (doc 2 is 北京大学)
    ids("\"東京大学\"") shouldBe Seq(0)
  }

  test("mixed-script query spans scripts") {
    // Last matching strategy admits the 東京-only doc (0) in a lower
    // bucket — the full-match doc (6) must rank first
    val r = new Search(index).execute(
      SearchRequest(query = Some("東京 english "), limit = 10, exhaustive = false))
    r.documentsIds.head shouldBe 6
    r.documentsIds should contain (0)
  }

  test("latin path is untouched by the segmentation") {
    ids("search engines ") should contain (5)
  }
}
