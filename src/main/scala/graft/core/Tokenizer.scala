package graft.core

/** Milli-compatible Latin tokenizer.
  *
  * Re-expresses the reference pipeline (charabia tokenize → normalize →
  * `process_tokens` position assignment, see
  * `/root/reference/milli/src/update/index_documents/extract/extract_docid_word_positions.rs:146-174`)
  * as a pure deterministic Scala function so every Spark task produces
  * byte-identical tokens for a given input string.
  *
  * Semantics implemented:
  *  - word characters: Unicode letters and digits; everything else separates.
  *  - hard separators (sentence punctuation) advance the next word position
  *    by 8; soft separators (whitespace, dashes, quotes, …) by 1
  *    (`extract_docid_word_positions.rs:152-158`).
  *  - normalization: lowercase + NFD diacritic stripping (charabia's
  *    lowercase + deunicode path for Latin script).
  *  - words longer than [[Tokenizer.MaxWordLength]] bytes are skipped
  *    (`/root/reference/milli/src/lib.rs:87`).
  *  - at most [[Tokenizer.MaxPositionPerAttribute]] relative positions per
  *    attribute (`/root/reference/milli/src/lib.rs:89`).
  */
object Tokenizer extends Serializable {

  final val MaxWordLength = 250
  final val MaxPositionPerAttribute: Int = 1 << 16

  /** One emitted word with its relative (in-attribute) position. */
  final case class Token(word: String, position: Int)

  /** Hard separators: chars that end a "sentence-ish" unit.
    * Mirrors charabia's SeparatorKind::Hard classification for the ASCII
    * punctuation the corpus exercises, plus the CJK fullwidth equivalents
    * (。！？；，、：（）【】「」) web text in those scripts actually uses.
    * Documented divergence: other exotic Unicode separators default to soft.
    */
  private[graft] val HardSeps: Set[Char] =
    Set('.', ';', ',', '!', '?', '(', ')', '[', ']', '{', '}', '|', '…',
      '。', '！', '？', '；', '，', '、', '：', '（', '）', '【', '】', '「', '」')

  @inline def isHardSep(c: Char): Boolean = HardSeps.contains(c)

  /** Word characters: letters, digits, and combining marks (a combining
    * mark splits its word otherwise — Arabic harakat, Hebrew niqqud, Thai
    * vowels, NFD Latin accents are all Mn and all belong INSIDE the word;
    * normalize() strips the ones that should vanish). */
  @inline def isWordChar(cp: Int): Boolean =
    Character.isLetterOrDigit(cp) ||
      Character.getType(cp) == Character.NON_SPACING_MARK

  // ---------------------------------------------- script-aware segmentation
  //
  // charabia detects the script of each token run and switches segmenters
  // (Latin whitespace rules, jieba for Chinese, lindera for Japanese/Korean,
  // a dictionary segmenter for Thai). Those dictionaries are not available
  // here, so the fallback is DETERMINISTIC and symmetrical between index and
  // query time (both sides call [[segmentRun]], so recall is preserved):
  //  - word-character runs split at script-class boundaries (Han|kana|
  //    hangul|thai|other), exactly like charabia's script change detection;
  //  - Han ideographs index as UNIGRAMS (one token per code point, incl.
  //    supplementary-plane ideographs) — the standard dictionary-free CJK
  //    fallback; proximity ranking recovers phrase-level precision;
  //  - kana / hangul / thai runs stay whole tokens (DIVERGENCE from
  //    lindera's morphological analysis, documented in SURVEY §8);
  //  - everything else (Latin, Cyrillic, Greek, Arabic, …) keeps the
  //    normalize() path — lowercase + NFD mark stripping, which also
  //    removes Arabic harakat and Hebrew niqqud.

  private final val ScOther = 0
  private final val ScHan = 1
  private final val ScHira = 2
  private final val ScKata = 3
  private final val ScHangul = 4
  private final val ScThai = 5

  /** Script class of a code point, by range (no Character.UnicodeScript
    * allocation on the hot path). Hiragana and katakana are SEPARATE
    * classes: the boundary between them is a real word boundary in
    * Japanese far more often than not (katakana loanword + hiragana
    * particle), which recovers part of what lindera's dictionary gives. */
  @inline private[graft] def scriptClass(cp: Int): Int =
    if (cp < 0x0E00) ScOther
    else if (cp <= 0x0E7F) ScThai
    else if (cp < 0x1100) ScOther
    else if (cp <= 0x11FF) ScHangul // Hangul Jamo
    else if (cp < 0x3040) ScOther
    else if (cp <= 0x309F) ScHira // Hiragana
    else if (cp <= 0x30FF) ScKata // Katakana
    else if (cp >= 0x3130 && cp <= 0x318F) ScHangul // compat Jamo
    else if (cp >= 0x31F0 && cp <= 0x31FF) ScKata // Katakana phonetic ext
    else if (cp >= 0x3400 && cp <= 0x9FFF) ScHan // ext A + URO
    else if (cp >= 0xA960 && cp <= 0xA97F) ScHangul // Jamo ext A
    else if (cp >= 0xAC00 && cp <= 0xD7FF) ScHangul // syllables + Jamo ext B
    else if (cp >= 0xF900 && cp <= 0xFAFF) ScHan // compat ideographs
    else if (cp >= 0xFF66 && cp <= 0xFF9D) ScKata // halfwidth Katakana
    else if (cp >= 0x20000 && cp <= 0x3FFFF) ScHan // ext B..I (supplementary)
    else ScOther

  /** Segment one maximal run of word characters into index tokens: split at
    * script-class boundaries, Han → one token per ideograph, kana / hangul /
    * thai segments whole, all other segments through [[normalize]]. Both the
    * indexer and the query parser call this — the single source of truth
    * that keeps index-time and query-time tokens identical. */
  def segmentRun(raw: String): Vector[String] = {
    // fast path: pure pre-Thai (ASCII/Latin/…) runs are one normalized word
    var allOther = true
    var j = 0
    while (allOther && j < raw.length) {
      if (raw.charAt(j) >= 0x0E00) allOther = false else j += 1
    }
    if (allOther) return Vector(normalize(raw))
    val out = Vector.newBuilder[String]
    var i = 0
    val n = raw.length
    while (i < n) {
      val cp = raw.codePointAt(i)
      val sc = scriptClass(cp)
      if (sc == ScHan) {
        out += raw.substring(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      } else {
        val start = i
        while (i < n && {
          val c2 = raw.codePointAt(i); scriptClass(c2) == sc && scriptClass(c2) != ScHan
        }) i += Character.charCount(raw.codePointAt(i))
        val seg = raw.substring(start, i)
        out += (if (sc == ScOther) normalize(seg) else seg)
      }
    }
    out.result()
  }

  /** Lowercase + strip combining diacritical marks (NFD), with the handful
    * of Latin ligature foldings deunicode applies that NFD alone misses.
    */
  def normalize(s: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val needsFold = lower.exists(c => c > 127)
    if (!needsFold) lower
    else {
      val folded = lower.flatMap {
        case 'œ' => "oe"
        case 'æ' => "ae"
        case 'ø' => "o"
        case 'ß' => "ss"
        case 'đ' => "d"
        case 'ł' => "l"
        case c   => c.toString
      }
      val nfd = java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFD)
      nfd.filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
    }
  }

  /** Tokenize one attribute's text into (normalized word, relative position)
    * with milli's position semantics. Deterministic, allocation-light.
    * Word-character runs segment script-aware through [[segmentRun]]; each
    * segment is its own word (consecutive segments are soft-adjacent, +1
    * position apart — exactly how charabia's segmenters hand multiple
    * tokens to `process_tokens` with no separator between them).
    */
  def tokenize(text: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = text.length
    var position = 0
    var seenWord = false
    // pending separator strength between previous word and next word:
    // 0 = none yet, 1 = soft, 8 = hard
    var pendingSep = 0
    while (i < n && position < MaxPositionPerAttribute) {
      val cp = text.codePointAt(i)
      if (isWordChar(cp)) {
        val start = i
        while (i < n && isWordChar(text.codePointAt(i)))
          i += Character.charCount(text.codePointAt(i))
        val raw = text.substring(start, i)
        segmentRun(raw).foreach { word =>
          if (seenWord) position += (if (pendingSep == 8) 8 else 1)
          pendingSep = 0
          seenWord = true
          if (position < MaxPositionPerAttribute && word.nonEmpty &&
              word.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= MaxWordLength) {
            out += Token(word, position)
          }
        }
      } else {
        // separator run: hard wins over soft (process_tokens keeps Hard as
        // prev_kind once seen until the next word)
        if (cp <= 0xFFFF && HardSeps.contains(cp.toChar)) pendingSep = 8
        else if (pendingSep != 8) pendingSep = 1
        i += Character.charCount(cp)
      }
    }
    out.result()
  }

  /** Simple tokens mode: lowercase ASCII-alnum tokens, split on everything
    * else, empties dropped. This is the oracle-checkable tokenization used
    * for the DuckDB-verified queries: it matches
    * `regexp_split_to_array(lower(text), '[^a-z0-9]+')` exactly.
    */
  def simpleTokens(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Absolute position = (fieldId << 16) | relative word position.
    * `/root/reference/milli/src/lib.rs:94-101`. */
  @inline def absoluteFromRelative(fieldId: Int, relative: Int): Int =
    (fieldId << 16) | relative

  @inline def relativeFromAbsolute(absolute: Int): (Int, Int) =
    ((absolute >>> 16) & 0xffff, absolute & 0xffff)

  /** Render a JSON-ish nested value to indexable text exactly like
    * `json_to_string` (`extract_docid_word_positions.rs:96-146`):
    * objects → `"key: value. "`, arrays → `"elem. "` concatenation.
    * Values are modeled with plain Scala types
    * (String / Boolean / Number / Seq / Map / null).
    */
  def jsonToString(value: Any): Option[String] = {
    def inner(v: Any, out: java.lang.StringBuilder): Boolean = v match {
      case null       => false
      case None       => false
      case s: String  => out.append(s); true
      case b: Boolean => out.append(b.toString); true
      case d: Double  => out.append(formatNum(d)); true
      case n: Number  => out.append(n.toString); true
      case seq: Seq[_] =>
        var count = 0
        seq.foreach { e => if (inner(e, out)) { out.append(". "); count += 1 } }
        count != 0
      case m: scala.collection.Map[_, _] =>
        var count = 0
        m.foreach { case (k, v2) =>
          val buf = new java.lang.StringBuilder()
          buf.append(k.toString).append(": ")
          if (inner(v2, buf)) {
            buf.append(". ")
            out.append(buf)
            count += 1
          }
        }
        count != 0
      case other => out.append(other.toString); true
    }
    value match {
      case s: String => Some(s)
      case _ =>
        val sb = new java.lang.StringBuilder()
        if (inner(value, sb)) Some(sb.toString) else None
    }
  }

  private def formatNum(d: Double): String =
    if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
