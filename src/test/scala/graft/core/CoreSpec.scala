package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Golden tests for the pure core, mirroring the reference's own unit
  * expectations (see FIXTURES.md §4 for citations). */
class TokenizerSpec extends AnyFunSuite with Matchers {

  test("simple words get consecutive positions") {
    Tokenizer.tokenize("hello world america") shouldBe Vector(
      Tokenizer.Token("hello", 0),
      Tokenizer.Token("world", 1),
      Tokenizer.Token("america", 2))
  }

  test("hard separator advances position by 8 (process_tokens)") {
    // `extract_docid_word_positions.rs:146-174`
    Tokenizer.tokenize("a b. c") shouldBe Vector(
      Tokenizer.Token("a", 0),
      Tokenizer.Token("b", 1),
      Tokenizer.Token("c", 9))
  }

  test("multiple separators collapse; hard wins over soft") {
    Tokenizer.tokenize("a . , - b") shouldBe Vector(
      Tokenizer.Token("a", 0),
      Tokenizer.Token("b", 8))
    Tokenizer.tokenize("a - b") shouldBe Vector(
      Tokenizer.Token("a", 0),
      Tokenizer.Token("b", 1))
  }

  test("leading separators are skipped (skip_while is_separator)") {
    Tokenizer.tokenize(". hello") shouldBe Vector(Tokenizer.Token("hello", 0))
  }

  test("normalization lowercases and strips diacritics") {
    Tokenizer.normalize("Café") shouldBe "cafe"
    Tokenizer.normalize("ÉLÈVE") shouldBe "eleve"
    Tokenizer.normalize("Straße") shouldBe "strasse"
  }

  test("words longer than 250 bytes are skipped but keep a position") {
    val long = "x" * 251
    val toks = Tokenizer.tokenize(s"a $long b")
    toks shouldBe Vector(Tokenizer.Token("a", 0), Tokenizer.Token("b", 2))
  }

  // ---- script-aware segmentation goldens (charabia's script switch; our
  // deterministic fallback: Han unigrams, kana/hangul/thai whole segments,
  // split at script boundaries — SURVEY §8 documents the divergence from
  // jieba/lindera dictionary segmentation)

  test("Han ideographs segment as unigrams with adjacent positions") {
    Tokenizer.tokenize("东京大学") shouldBe Vector(
      Tokenizer.Token("东", 0), Tokenizer.Token("京", 1),
      Tokenizer.Token("大", 2), Tokenizer.Token("学", 3))
  }

  test("CJK fullwidth punctuation is a hard separator") {
    Tokenizer.tokenize("东京。大学") shouldBe Vector(
      Tokenizer.Token("东", 0), Tokenizer.Token("京", 1),
      Tokenizer.Token("大", 9), Tokenizer.Token("学", 10))
  }

  test("mixed Japanese text splits at script boundaries, kana runs whole") {
    // 東京タワーに行く: Han 東,京 | katakana タワー | hiragana に | Han 行 | hiragana く
    Tokenizer.tokenize("東京タワーに行く") shouldBe Vector(
      Tokenizer.Token("東", 0), Tokenizer.Token("京", 1),
      Tokenizer.Token("タワー", 2), Tokenizer.Token("に", 3),
      Tokenizer.Token("行", 4), Tokenizer.Token("く", 5))
  }

  test("Hangul syllable runs stay whole words (space-separated Korean)") {
    Tokenizer.tokenize("한국어 검색") shouldBe Vector(
      Tokenizer.Token("한국어", 0), Tokenizer.Token("검색", 1))
  }

  test("Thai runs stay whole tokens (documented divergence: no dictionary)") {
    Tokenizer.tokenize("ภาษาไทย test") shouldBe Vector(
      Tokenizer.Token("ภาษาไทย", 0), Tokenizer.Token("test", 1))
  }

  test("Latin embedded in CJK keeps the normalize path; digits split from Han") {
    Tokenizer.tokenize("Café中文3月") shouldBe Vector(
      Tokenizer.Token("cafe", 0), Tokenizer.Token("中", 1),
      Tokenizer.Token("文", 2), Tokenizer.Token("3", 3),
      Tokenizer.Token("月", 4))
  }

  test("supplementary-plane ideographs segment as single unigrams") {
    // U+20000 (𠀀, CJK ext B) is a surrogate pair in UTF-16
    val extB = new String(Character.toChars(0x20000))
    Tokenizer.tokenize(s"a$extB${extB}b") shouldBe Vector(
      Tokenizer.Token("a", 0), Tokenizer.Token(extB, 1),
      Tokenizer.Token(extB, 2), Tokenizer.Token("b", 3))
  }

  test("Arabic keeps the normalize path and sheds harakat (NFD marks)") {
    // كَتَبَ with fatha marks normalizes to كتب
    Tokenizer.tokenize("كَتَبَ كتب") shouldBe Vector(
      Tokenizer.Token("كتب", 0), Tokenizer.Token("كتب", 1))
  }

  test("json_to_string renders objects as 'key: value. '") {
    // `milli/src/lib.rs:262-287`
    val obj = scala.collection.immutable.ListMap(
      "name" -> "John Doe", "age" -> (43: Any), "not_there" -> null)
    Tokenizer.jsonToString(obj) shouldBe Some("name: John Doe. age: 43. ")
    val arr = Seq(
      scala.collection.immutable.ListMap("name" -> "John Doe"),
      43, "hello", Seq("I", "am", "fine"), null)
    Tokenizer.jsonToString(arr) shouldBe Some("name: John Doe. . 43. hello. I. am. fine. . ")
  }

  test("absolute/relative position conversion") {
    Tokenizer.relativeFromAbsolute(0x12345678) shouldBe ((0x1234, 0x5678))
    Tokenizer.absoluteFromRelative(0x1234, 0x5678) shouldBe 0x12345678
  }

  test("simpleTokens matches duckdb regexp_split_to_array semantics") {
    Tokenizer.simpleTokens("Hello, World-foo") shouldBe Vector("hello", "world", "foo")
    Tokenizer.simpleTokens("  .x9 Y ") shouldBe Vector("x9", "y")
    Tokenizer.simpleTokens("") shouldBe Vector()
  }
}

class ProximitySpec extends AnyFunSuite with Matchers {
  test("index proximity formula (proximity.rs:7-23)") {
    Proximity.indexProximity(2, 5) shouldBe 3
    Proximity.indexProximity(5, 2) shouldBe 4
    Proximity.indexProximity(0, 20) shouldBe 8
    Proximity.indexProximity(3, 3) shouldBe 0
  }
  test("cross-attribute positions are maximally distant") {
    val a = Tokenizer.absoluteFromRelative(0, 3)
    val b = Tokenizer.absoluteFromRelative(1, 4)
    Proximity.positionsProximity(a, b) shouldBe 8
  }
}

class TypoSpec extends AnyFunSuite with Matchers {
  // goldens from `milli/src/search/mod.rs:475-535`
  test("one typo tolerance") {
    Typo.derive("zealend", "zealand", isPrefix = false, maxTypo = 1) shouldBe Some(1)
  }
  test("one typo requires identical first letter") {
    Typo.derive("sealand", "zealand", isPrefix = false, maxTypo = 1) shouldBe None
  }
  test("two typos tolerance") {
    Typo.derive("zealemd", "zealand", isPrefix = false, maxTypo = 2) shouldBe Some(2)
  }
  test("two typos, different first letter counts as 2") {
    Typo.derive("sealand", "zealand", isPrefix = false, maxTypo = 2) shouldBe Some(2)
  }
  test("prefix exact") {
    Typo.derive("ze", "zealand", isPrefix = true, maxTypo = 0) shouldBe Some(0)
    Typo.derive("se", "zealand", isPrefix = true, maxTypo = 0) shouldBe None
  }
  test("prefix with typo") {
    Typo.derive("zae", "zealand", isPrefix = true, maxTypo = 1) shouldBe Some(1)
  }
  test("transposition counts as one typo (damerau)") {
    Typo.osaDistance("world", "wrold", 2) shouldBe 1
    Typo.osaDistance("abc", "acb", 2) shouldBe 1
    Typo.osaDistance("abc", "abc", 2) shouldBe 0
  }
  test("typo budget by word length (query_tree.rs:323-336)") {
    Typo.typoBudget(4) shouldBe 0
    Typo.typoBudget(5) shouldBe 1
    Typo.typoBudget(8) shouldBe 1
    Typo.typoBudget(9) shouldBe 2
  }
  test("exact match when budget allows more") {
    Typo.derive("zealand", "zealand", isPrefix = false, maxTypo = 2) shouldBe Some(0)
  }
}

class BitmapsSpec extends AnyFunSuite with Matchers {
  test("cbo codec: ≤7 ids raw u32 LE form") {
    val bm = Bitmaps.fromInts(Seq(1, 5, 7))
    val bytes = Bitmaps.cboSerialize(bm)
    bytes.length shouldBe 12
    Bitmaps.cboDeserialize(bytes).toArray shouldBe Array(1, 5, 7)
  }
  test("cbo codec: >7 ids roaring form round-trips") {
    val ids = (0 until 1000).map(_ * 3)
    val bytes = Bitmaps.cboSerialize(Bitmaps.fromInts(ids))
    bytes.length should be > 28
    Bitmaps.cboDeserialize(bytes).toArray shouldBe ids.toArray
  }
  test("consecutive ids (run-compressible) round-trip — length disambiguation") {
    // regression: >7 consecutive ids run-optimize to a roaring form smaller
    // than 28 bytes, which the length test would misread as raw u32s
    for (n <- 8 to 40) {
      val ids = (0 until n)
      val bytes = Bitmaps.cboSerialize(Bitmaps.fromInts(ids))
      bytes.length should be > 28
      Bitmaps.cboDeserialize(bytes).toArray shouldBe ids.toArray
    }
  }

  test("empty bitmap round-trips") {
    Bitmaps.cboDeserialize(Bitmaps.cboSerialize(new org.roaringbitmap.RoaringBitmap()))
      .getLongCardinality shouldBe 0
  }
}

class PostingBlocksSpec extends AnyFunSuite with Matchers {
  test("FOR blocks round-trip with block-max metadata") {
    val postings = (0 until 1000).map(i => (i * 7, (i % 13) + 1)).toArray
    val blocks = PostingBlocks.encode(postings)
    blocks.length shouldBe math.ceil(1000.0 / PostingBlocks.BlockSize).toInt
    blocks.flatMap(b => PostingBlocks.decode(b.bytes)) shouldBe postings
    blocks.head.maxDocid shouldBe postings(PostingBlocks.BlockSize - 1)._1
    blocks.head.maxTf shouldBe postings.take(PostingBlocks.BlockSize).map(_._2).max
  }
  test("empty postings encode to no blocks") {
    PostingBlocks.encode(Array.empty) shouldBe Array.empty[PostingBlocks.Block]
  }
}
