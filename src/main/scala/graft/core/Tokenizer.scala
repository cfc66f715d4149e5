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
    * punctuation the corpus exercises. Documented divergence: exotic
    * Unicode separators default to soft.
    */
  private val HardSeps: Set[Char] =
    Set('.', ';', ',', '!', '?', '(', ')', '[', ']', '{', '}', '|', '…')

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c)

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
      val c = text.charAt(i)
      if (isWordChar(c)) {
        val start = i
        while (i < n && isWordChar(text.charAt(i))) i += 1
        val raw = text.substring(start, i)
        val word = normalize(raw)
        if (seenWord) position += (if (pendingSep == 8) 8 else 1)
        pendingSep = 0
        seenWord = true
        if (position < MaxPositionPerAttribute && word.nonEmpty &&
            word.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= MaxWordLength) {
          out += Token(word, position)
        }
      } else {
        // separator run: hard wins over soft (process_tokens keeps Hard as
        // prev_kind once seen until the next word)
        if (HardSeps.contains(c)) pendingSep = 8
        else if (pendingSep != 8) pendingSep = 1
        i += 1
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
