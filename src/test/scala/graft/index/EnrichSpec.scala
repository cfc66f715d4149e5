package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Enrich validation semantics (enrich.rs:28-145, validators :328-400):
  * pk discovery, id charset/missing/duplicate checks, geo validation. */
class EnrichSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("primary key discovery: one 'id' column wins, many/none error") {
    val one = Seq((1, "x")).toDF("movie_id", "title")
    Enrich.resolvePrimaryKey(one, None) shouldBe "movie_id"
    val many = Seq((1, 2)).toDF("movie_id", "actor_id")
    an[IllegalArgumentException] should be thrownBy
      Enrich.resolvePrimaryKey(many, None)
    val none = Seq((1, 2)).toDF("a", "b")
    an[IllegalArgumentException] should be thrownBy
      Enrich.resolvePrimaryKey(none, None)
    Enrich.resolvePrimaryKey(many, Some("actor_id")) shouldBe "actor_id"
  }

  test("valid batch passes and returns the key") {
    val df = Seq(("a-1", "t"), ("b_2", "u"), ("3", "v")).toDF("id", "text")
    Enrich.validate(df, Some("id")) shouldBe "id"
  }

  test("missing, invalid, and duplicate ids are rejected with counts") {
    val missing = Seq((Some("a"), "t"), (None, "u")).toDF("id", "text")
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(missing, Some("id"))).getMessage should include("missing document id")

    val invalid = Seq(("ok", "t"), ("bad id!", "u")).toDF("id", "text")
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(invalid, Some("id"))).getMessage should include("invalid document id")

    val dup = Seq(("a", "t"), ("a", "u")).toDF("id", "text")
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(dup, Some("id"))).getMessage should include("duplicate document ids")
  }

  test("configured primary key absent from the batch throws (MissingDocumentId)") {
    val df = Seq(("a", "t")).toDF("id", "text")
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(df, Some("uid"))).getMessage should include("missing document id")
    // discovery still works when nothing is configured
    Enrich.resolvePrimaryKey(df, None) shouldBe "id"
  }

  test("geo: lat/lng must be present together, numeric and finite") {
    val cols = Seq("id", "_geo.lat", "_geo.lng")
    val ok = Seq[(String, Option[String], Option[String])](
      ("a", Some("48.8"), Some("2.3")), ("b", None, None)).toDF(cols: _*)
    Enrich.validate(ok, Some("id")) shouldBe "id"

    val half = Seq[(String, Option[String], Option[String])](
      ("a", Some("48.8"), None)).toDF(cols: _*)
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(half, Some("id"))).getMessage should include("only one of")

    val bad = Seq(("a", Some("north"), Some("2.3"))).toDF(cols: _*)
    (the[IllegalArgumentException] thrownBy
      Enrich.validate(bad, Some("id"))).getMessage should include("non-finite or non-numeric")
  }
}
