package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import Matcher._

/** Golden port of the reference matcher unit tests
  * (`/root/reference/milli/src/search/matches/mod.rs:495-865` and
  * `matching_words.rs` tests): every insta snapshot below is copied
  * verbatim from the reference expectations. */
class MatcherSpec extends AnyFunSuite with Matchers {

  // matching_words() fixture (mod.rs:504-517)
  private def fixtureWords: MatchingWords = MatchingWords(Seq(
    (Seq(MatchingWord("split", 0, prefix = false)), Seq(0)),
    (Seq(MatchingWord("the", 0, prefix = false)), Seq(1)),
    (Seq(MatchingWord("world", 1, prefix = true)), Seq(2))))

  private def fmt(words: MatchingWords, text: String, options: FormatOptions,
      pre: String = "<em>", post: String = "</em>"): String =
    new TextMatcher(words, highlightPrefix = pre, highlightSuffix = post)
      .format(text, options)

  test("format_identity (mod.rs:525-556)") {
    val o = FormatOptions(highlight = false, crop = None)
    val t1 = "A quick brown fox can not jump 32 feet, right? Brr, it is cold!"
    fmt(fixtureWords, t1, o) shouldBe t1
    val t2 = "Natalie risk her future to build a world with the boy she loves. Emily Henry: The Love That Split The World."
    fmt(fixtureWords, t2, o) shouldBe t2
    val t3 = "Natalie risk her future to build a world with the boy she loves."
    fmt(fixtureWords, t3, o) shouldBe t3
  }

  test("format_highlight (mod.rs:558-595)") {
    val o = FormatOptions(highlight = true, crop = None)
    fmt(fixtureWords, "", o) shouldBe ""
    fmt(fixtureWords, ":-)", o) shouldBe ":-)"
    val t1 = "A quick brown fox can not jump 32 feet, right? Brr, it is cold!"
    fmt(fixtureWords, t1, o) shouldBe t1
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves. Emily Henry: The Love That Split The World.",
      o) shouldBe
      "Natalie risk her future to build a <em>world</em> with <em>the</em> boy she loves. Emily Henry: <em>The</em> Love That <em>Split</em> <em>The</em> <em>World</em>."
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves.", o) shouldBe
      "Natalie risk her future to build a <em>world</em> with <em>the</em> boy she loves."
  }

  test("highlight_unicode (mod.rs:597-635)") {
    val words = MatchingWords(Seq(
      (Seq(MatchingWord("wessfali", 1, prefix = true)), Seq(0)),
      (Seq(MatchingWord("world", 1, prefix = true)), Seq(1))))
    val o = FormatOptions(highlight = true, crop = None)
    fmt(words, "Ŵôřlḑôle", o) shouldBe "<em>Ŵôřlḑ</em>ôle"
    fmt(words, "Ŵôřlḑ", o) shouldBe "<em>Ŵôřlḑ</em>"
    fmt(words, "Westfália", o) shouldBe "<em>Westfáli</em>a"
  }

  test("format_crop (mod.rs:637-729)") {
    val o = FormatOptions(highlight = false, crop = Some(10))
    fmt(fixtureWords, "", o) shouldBe ""
    fmt(fixtureWords, ":-)", o) shouldBe ":-)"
    fmt(fixtureWords,
      "A quick brown fox can not jump 32 feet, right? Brr, it is cold!", o) shouldBe
      "A quick brown fox can not jump 32 feet, right…"
    fmt(fixtureWords,
      "(A quick brown fox can not jump 32 feet, right? Brr, it is cold!)", o) shouldBe
      "(A quick brown fox can not jump 32 feet, right…"
    fmt(fixtureWords,
      "Natalie risk her future. Split The World is a book written by Emily Henry. I never read it.",
      o) shouldBe
      "… Split The World is a book written by Emily Henry…"
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves.", o) shouldBe
      "…future to build a world with the boy she loves…"
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves. Emily Henry: The Love That Split The World.",
      o) shouldBe
      "…she loves. Emily Henry: The Love That Split The World."
    fmt(fixtureWords,
      "The world split void void void void void void void void void split the world void void",
      o) shouldBe
      "…void void void void void split the world void void"
    fmt(fixtureWords,
      "split void the void void world void void void void void void void void void void split the world void void",
      o) shouldBe
      "…void void void void void split the world void void"
    fmt(fixtureWords,
      "split split split split split split void void void void void void void void void void split the world void void",
      o) shouldBe
      "…void void void void void split the world void void"
  }

  test("format_highlight_crop (mod.rs:731-795)") {
    val o = FormatOptions(highlight = true, crop = Some(10))
    fmt(fixtureWords, "", o) shouldBe ""
    fmt(fixtureWords, ":-)", o) shouldBe ":-)"
    fmt(fixtureWords,
      "A quick brown fox can not jump 32 feet, right? Brr, it is cold!", o) shouldBe
      "A quick brown fox can not jump 32 feet, right…"
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves.", o) shouldBe
      "…future to build a <em>world</em> with <em>the</em> boy she loves…"
    fmt(fixtureWords,
      "Natalie risk her future to build a world with the boy she loves. Emily Henry: The Love That Split The World.",
      o) shouldBe
      "…she loves. Emily Henry: <em>The</em> Love That <em>Split</em> <em>The</em> <em>World</em>."
    fmt(fixtureWords,
      "The world split void void void void void void void void void split the world void void",
      o) shouldBe
      "…void void void void void <em>split</em> <em>the</em> <em>world</em> void void"
  }

  test("smaller_crop_size (mod.rs:797-829)") {
    val text = "void void split the world void void."
    fmt(fixtureWords, text, FormatOptions(highlight = false, crop = Some(2))) shouldBe
      "…split the…"
    fmt(fixtureWords, text, FormatOptions(highlight = false, crop = Some(1))) shouldBe
      "…split…"
    fmt(fixtureWords, text, FormatOptions(highlight = false, crop = Some(0))) shouldBe
      text
  }

  test("partial_matches (mod.rs:831-864)") {
    val words = MatchingWords(Seq(
      (Seq(MatchingWord("the", 0, prefix = false)), Seq(0)),
      (Seq(MatchingWord("t", 0, prefix = false),
        MatchingWord("he", 0, prefix = false)), Seq(0)),
      (Seq(MatchingWord("door", 0, prefix = false)), Seq(1)),
      (Seq(MatchingWord("do", 0, prefix = false),
        MatchingWord("or", 0, prefix = false)), Seq(1)),
      (Seq(MatchingWord("do", 0, prefix = false)), Seq(2))))
    val o = FormatOptions(highlight = true, crop = None)
    fmt(words, "the do or die can't be he do and or isn't he", o, pre = "_", post = "_") shouldBe
      "_the_ _do_ _or_ die can't be he _do_ and or isn'_t_ _he_"
  }

  test("charsToHighlight (matching_words.rs test_bytes_to_highlight, char counts)") {
    // reference cases, (source=text, target=query); lengths in chars (the
    // reference counts bytes — identical for these ASCII/BMP cases)
    charsToHighlight("bip", "bip") shouldBe 3
    charsToHighlight("boup", "bip") shouldBe 3
    charsToHighlight("Levenshtein", "Levenshtein") shouldBe 11
    // we get to the end of our word with only one typo
    charsToHighlight("Levenshtein", "Levenste") shouldBe 8
    // third and last authorized typo right on the last character
    charsToHighlight("Levenshte", "Levenstein") shouldBe 8
    // two typos at the beginning
    charsToHighlight("Levenshtein", "Bavenshtein") shouldBe 11
    charsToHighlight("Альфой", "Альфа") shouldBe 4 // "Альф" chars
    charsToHighlight("chäräcters", "ch") shouldBe 2
    charsToHighlight("chäräcters", "chär") shouldBe 4
    charsToHighlight("chäräcters", "chäräcters") shouldBe 10
  }

  test("matchLemma: typo + prefix semantics (matching_words.rs matching_words test)") {
    // match_token("word") → Full { char_len: 3, ids: [2] } via world/1/prefix
    MatchingWord("world", 1, prefix = true).matchLemma("word") shouldBe Some(3)
    MatchingWord("split", 1, prefix = true).matchLemma("word") shouldBe None
    MatchingWord("this", 0, prefix = false).matchLemma("nyc") shouldBe None
    MatchingWord("split", 0, prefix = false).matchLemma("split") shouldBe Some(5)
    MatchingWord("world", 1, prefix = true).matchLemma("worlded") shouldBe Some(5)
  }
}
