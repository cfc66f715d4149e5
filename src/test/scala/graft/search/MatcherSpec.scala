package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import Matcher._

class MatcherSpec extends AnyFunSuite with Matchers {
  private val words = Seq(
    QueryWord("world", prefix = false, maxTypo = 1),
    QueryWord("ameri", prefix = true, maxTypo = 0))

  test("highlight wraps typo and prefix matches") {
    highlight("the wrold of american dreams", words) shouldBe
      "the <em>wrold</em> of <em>american</em> dreams"
  }

  test("no matches leaves text untouched") {
    highlight("nothing to see here", words) shouldBe "nothing to see here"
  }

  test("crop picks the densest window") {
    val text = ("pad " * 30) + "world again american stuff" + (" tail" * 30)
    val c = crop(text, words, cropSize = 6)
    c should include("world")
    c should include("american")
    c.length should be < text.length
  }

  test("highlight respects diacritics normalization") {
    highlight("Wörld tour", Seq(QueryWord("world", false, 1))) shouldBe
      "<em>Wörld</em> tour"
  }
}
