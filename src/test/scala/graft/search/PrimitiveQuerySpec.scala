package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import QueryTree._

/** `create_primitive_query` semantics ported from the reference unit tests
  * (query_tree.rs:780-846 + the phrase / phrase_with_hard_separator /
  * words_limit snapshots). */
class PrimitiveQuerySpec extends AnyFunSuite with Matchers {

  test("phrase: unterminated quote keeps the tail as a phrase (ref `phrase`)") {
    primitiveQuery("\"hey friends\" \" \" \"wooop", Set.empty) shouldBe Seq(
      PPhrase(Seq(Some("hey"), Some("friends"))),
      PPhrase(Seq(Some("wooop"))))
  }

  test("hard separator closes an in-progress phrase (ref `phrase_with_hard_separator`)") {
    primitiveQuery("\"hey friends. wooop wooop\"", Set.empty) shouldBe Seq(
      PPhrase(Seq(Some("hey"), Some("friends"))),
      PPhrase(Seq(Some("wooop"), Some("wooop"))))
  }

  test("words_limit caps the number of parts (ref `words_limit`)") {
    primitiveQuery("\"hey my\" good friend", Set.empty, wordsLimit = 2) shouldBe Seq(
      PPhrase(Seq(Some("hey"), Some("my"))),
      PWord("good", prefix = false))
  }

  test("stop words drop mid-query but the last token is always a prefix word") {
    primitiveQuery("guitar the", Set("the")) shouldBe Seq(
      PWord("guitar", prefix = false), PWord("the", prefix = true))
    primitiveQuery("the guitar", Set("the")) shouldBe Seq(
      PWord("guitar", prefix = true))
    // stop words inside phrases become None holes
    primitiveQuery("\"the quick fox\"", Set("the")) shouldBe Seq(
      PPhrase(Seq(None, Some("quick"), Some("fox"))))
  }

  test("trailing separator disables the prefix flag") {
    primitiveQuery("hello world ", Set.empty) shouldBe Seq(
      PWord("hello", prefix = false), PWord("world", prefix = false))
    primitiveQuery("hello world", Set.empty) shouldBe Seq(
      PWord("hello", prefix = false), PWord("world", prefix = true))
  }
}
