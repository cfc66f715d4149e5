package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Port of the reference flatten-serde-json test suite
  * (`/root/reference/flatten-serde-json/src/lib.rs:77-310`) against
  * [[JsonFlatten.flatten]], plus typed-DataFrame flattening checks. */
class FlattenSpec extends AnyFunSuite with Matchers {

  private def flat(m: (String, Any)*): Map[String, Any] =
    JsonFlatten.flatten(scala.collection.immutable.ListMap(m: _*)).toMap

  test("no_flattening") {
    val doc = Seq(
      "id" -> "287947",
      "title" -> "Shazam!",
      "release_date" -> 1553299200L,
      "genres" -> Vector("Action", "Comedy", "Fantasy"))
    flat(doc: _*) shouldBe doc.toMap
  }

  test("flatten_object") {
    flat("a" -> Map("b" -> "c", "d" -> "e", "f" -> "g")) shouldBe
      Map("a" -> Vector(), "a.b" -> "c", "a.d" -> "e", "a.f" -> "g")
  }

  test("flatten_array") {
    flat("a" -> Vector(1L, "b", Vector(), Vector(Map()),
      Map("b" -> "c"), Map("b" -> "d"), Map("b" -> "e"))) shouldBe
      Map("a" -> Vector(1L, "b"), "a.b" -> Vector("c", "d", "e"))

    // here we must keep 42 in "a"
    flat("a" -> Vector(42L, Map("b" -> "c"), Map("b" -> "d"), Map("b" -> "e"))) shouldBe
      Map("a" -> 42L, "a.b" -> Vector("c", "d", "e"))

    // here we must keep null in "a"
    flat("a" -> Vector(Map("b" -> "c"), Map("b" -> "d"), Map("b" -> "e"), null)) shouldBe
      Map("a" -> null, "a.b" -> Vector("c", "d", "e"))
  }

  test("collision_with_object") {
    flat("a" -> Map("b" -> "c"), "a.b" -> "d") shouldBe
      Map("a" -> Vector(), "a.b" -> Vector("c", "d"))
  }

  test("collision_with_array") {
    flat("a" -> Vector(Map("b" -> "c"), Map("b" -> "d", "c" -> "e"), Vector(35L)),
      "a.b" -> "f") shouldBe
      Map("a.b" -> Vector("c", "d", "f"), "a.c" -> "e", "a" -> 35L)
  }

  test("flatten_nested_arrays") {
    flat("a" -> Vector(
      Vector("b", "c"),
      Map("d" -> "e"),
      Vector("f", "g"),
      Vector(Map("h" -> "i"), Map("d" -> "j")),
      Vector("k", "l"))) shouldBe
      Map("a" -> Vector("b", "c", "f", "g", "k", "l"),
        "a.d" -> Vector("e", "j"),
        "a.h" -> "i")
  }

  test("flatten_nested_arrays_and_objects") {
    flat("a" -> Vector(
      "b",
      Vector("c", "d"),
      Map("e" -> Vector("f", "g")),
      Vector(Map("h" -> "i"), Map("e" -> Vector("j", Map("z" -> "y")))),
      Vector("l"),
      "m")) shouldBe
      Map("a" -> Vector("b", "c", "d", "l", "m"),
        "a.e" -> Vector("f", "g", "j"),
        "a.h" -> "i",
        "a.e.z" -> "y")
  }

  test("flattenColumns: structs become dotted columns, arrays stay element-wise") {
    val spark = TestSpark.spark
    val df = spark.read.json(spark.createDataset(Seq(
      """{"id": 1, "user": {"name": "ann", "address": {"city": "oslo"}},
        | "tags": ["x", "y"],
        | "events": [{"kind": "a", "n": 1}, {"kind": "b", "n": 2}]}""".stripMargin.replace("\n", "")
    ))(spark.implicits.newStringEncoder))
    val out = JsonFlatten.flattenColumns(df)
    out.columns.sorted.toSeq shouldBe
      Seq("events.kind", "events.n", "id", "tags", "user.address.city", "user.name")
    val row = out.select("id", "`user.name`", "`user.address.city`",
        "`events.kind`", "`events.n`")
      .collect().head
    row.getLong(0) shouldBe 1L
    row.getString(1) shouldBe "ann"
    row.getString(2) shouldBe "oslo"
    row.getSeq[String](3) shouldBe Seq("a", "b")
    row.getSeq[Long](4) shouldBe Seq(1L, 2L)
  }
}
