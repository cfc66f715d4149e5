package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import QueryTree._
import QueryTree.MatchingStrategy._

/** Structural snapshots of `create_query_tree` ported verbatim from the
  * reference unit tests (query_tree.rs:905-1180 + the TestContext at
  * :930-990): same synonyms, pair frequencies and word counts, same
  * expected trees. */
class QueryTreeSpec extends AnyFunSuite with Matchers {

  private val ctx = new QueryContext {
    private val syns: Map[Seq[String], Seq[Seq[String]]] = Map(
      Seq("hello") -> Seq(Seq("hi"), Seq("good", "morning")),
      Seq("world") -> Seq(Seq("earth"), Seq("nature")),
      Seq("nyc") -> Seq(Seq("new", "york"), Seq("new", "york", "city")),
      Seq("new", "york") -> Seq(Seq("nyc"), Seq("new", "york", "city")),
      Seq("new", "york", "city") -> Seq(Seq("nyc"), Seq("new", "york")))
    private val pairFreqs: Map[(String, String), Long] = Map(
      ("word", "split") -> 5000L,
      ("quick", "brownfox") -> 7000L,
      ("quickbrown", "fox") -> 8000L)
    private val counts: Map[String, Long] = Map(
      "hello" -> 1500L, "hi" -> 4000L, "word" -> 2500L, "split" -> 400L,
      "ngrams" -> 1400L, "world" -> 15000L, "earth" -> 8000L,
      "2021" -> 100L, "2020" -> 500L, "is" -> 50000L, "this" -> 50000L,
      "good" -> 1250L, "morning" -> 125L)
    override def synonyms(words: Seq[String]): Seq[Seq[String]] =
      syns.getOrElse(words, Nil)
    override def wordPairFrequency(l: String, r: String): Long =
      pairFreqs.getOrElse((l, r), 0L)
    override def wordDocumentsCount(word: String): Long =
      counts.getOrElse(word, 0L)
    override def exactWords: Set[String] = Set.empty
    override def minWordLenOneTypo: Int = 5
    override def minWordLenTwoTypos: Int = 9
  }

  /** insta-style debug rendering (Operation's Debug impl, query_tree.rs:47-85). */
  private def render(op: Op): String = {
    val sb = new StringBuilder
    def go(o: Op, d: Int): Unit = {
      val pad = "  " * d
      o match {
        case And(cs) => sb.append(pad).append("AND\n"); cs.foreach(go(_, d + 1))
        case Or(word, cs) =>
          sb.append(pad).append(if (word) "OR(WORD)" else "OR").append('\n')
          cs.foreach(go(_, d + 1))
        case Phrase(ws) =>
          sb.append(pad).append("PHRASE [")
            .append(ws.map {
              case Some(w) => s"""Some("$w")"""
              case None => "None"
            }.mkString(", "))
            .append("]\n")
        case Query(prefix, kind) =>
          val p = if (prefix) "Prefix" else ""
          kind match {
            case Exact(w, _) =>
              sb.append(pad).append(s"""${p}Exact { word: "$w" }""").append('\n')
            case Tolerant(w, t) =>
              sb.append(pad).append(s"""${p}Tolerant { word: "$w", max typo: $t }""").append('\n')
          }
      }
    }
    go(op, 0)
    sb.toString
  }

  private def tree(query: String, strategy: MatchingStrategy = All,
      typos: Boolean = true, wordsLimit: Int = 10): String =
    render(QueryTree.build(ctx, strategy, typos,
      primitiveQuery(query, Set.empty, wordsLimit)).get)

  test("prefix (query_tree.rs `prefix`)") {
    tree("hey friends") shouldBe
      """OR
        |  AND
        |    Exact { word: "hey" }
        |    PrefixTolerant { word: "friends", max typo: 1 }
        |  PrefixTolerant { word: "heyfriends", max typo: 1 }
        |""".stripMargin
  }

  test("no_prefix (trailing space)") {
    tree("hey friends ") shouldBe
      """OR
        |  AND
        |    Exact { word: "hey" }
        |    Tolerant { word: "friends", max typo: 1 }
        |  Tolerant { word: "heyfriends", max typo: 1 }
        |""".stripMargin
  }

  test("synonyms") {
    tree("hello world ") shouldBe
      """OR
        |  AND
        |    OR
        |      Exact { word: "hi" }
        |      PHRASE [Some("good"), Some("morning")]
        |      Tolerant { word: "hello", max typo: 1 }
        |    OR
        |      Exact { word: "earth" }
        |      Exact { word: "nature" }
        |      Tolerant { word: "world", max typo: 1 }
        |  Tolerant { word: "helloworld", max typo: 1 }
        |""".stripMargin
  }

  test("ngrams") {
    tree("n grams ") shouldBe
      """OR
        |  AND
        |    Exact { word: "n" }
        |    Tolerant { word: "grams", max typo: 1 }
        |  Tolerant { word: "ngrams", max typo: 1 }
        |""".stripMargin
  }

  test("word_split") {
    tree("wordsplit fish ") shouldBe
      """OR
        |  AND
        |    OR
        |      PHRASE [Some("word"), Some("split")]
        |      Tolerant { word: "wordsplit", max typo: 2 }
        |    Exact { word: "fish" }
        |  Tolerant { word: "wordsplitfish", max typo: 1 }
        |""".stripMargin
  }

  test("word_split_choose_pair_with_max_freq") {
    tree("quickbrownfox") shouldBe
      """OR
        |  PHRASE [Some("quickbrown"), Some("fox")]
        |  PrefixTolerant { word: "quickbrownfox", max typo: 2 }
        |""".stripMargin
  }

  test("phrase (tree level: single-word phrase collapses to Exact)") {
    tree("\"hey friends\" \" \" \"wooop") shouldBe
      """AND
        |  PHRASE [Some("hey"), Some("friends")]
        |  Exact { word: "wooop" }
        |""".stripMargin
  }

  test("phrase_with_hard_separator") {
    tree("\"hey friends. wooop wooop\"") shouldBe
      """AND
        |  PHRASE [Some("hey"), Some("friends")]
        |  PHRASE [Some("wooop"), Some("wooop")]
        |""".stripMargin
  }

  test("optional_word (Last strategy branch list)") {
    tree("hey my friend ", strategy = Last) shouldBe
      """OR(WORD)
        |  Exact { word: "hey" }
        |  OR
        |    AND
        |      Exact { word: "hey" }
        |      Exact { word: "my" }
        |    Tolerant { word: "heymy", max typo: 1 }
        |  OR
        |    AND
        |      Exact { word: "hey" }
        |      OR
        |        AND
        |          Exact { word: "my" }
        |          Tolerant { word: "friend", max typo: 1 }
        |        Tolerant { word: "myfriend", max typo: 1 }
        |    AND
        |      Tolerant { word: "heymy", max typo: 1 }
        |      Tolerant { word: "friend", max typo: 1 }
        |    Tolerant { word: "heymyfriend", max typo: 1 }
        |""".stripMargin
  }

  test("no_typo") {
    tree("hey friends ", typos = false) shouldBe
      """OR
        |  AND
        |    Exact { word: "hey" }
        |    Exact { word: "friends" }
        |  Exact { word: "heyfriends" }
        |""".stripMargin
  }

  test("words_limit") {
    tree("\"hey my\" good friend", wordsLimit = 2) shouldBe
      """AND
        |  PHRASE [Some("hey"), Some("my")]
        |  Exact { word: "good" }
        |""".stripMargin
  }
}
