package graft.search

import scala.collection.mutable

import graft.core.Typo

/** Highlight / crop formatting of returned documents — a faithful port of
  * `/root/reference/milli/src/search/matches/mod.rs:118-500` (Matcher:
  * match computation, best-interval crop, window growth, formatting) and
  * `matching_words.rs:1-275` (MatchingWords, partial/consecutive matches,
  * bytes_to_highlight), DFA evaluation replaced by the same OSA
  * distance kernels retrieval uses ([[graft.core.Typo]]).
  *
  * Not rank-relevant — pure post-processing of the returned page (runs as a
  * map over the top-k rows only, never inside a Spark job).
  */
object Matcher {

  final val DefaultCropMarker = "…"
  final val DefaultHighlightPrefix = "<em>"
  final val DefaultHighlightSuffix = "</em>"

  // ------------------------------------------------------- matching words

  /** One query term to match (`matching_words.rs:84-131`): DFA ≡ OSA
    * distance ≤ typo; prefix mode matches any token extending a typo'd
    * variant and highlights only the matched head (`bytes_to_highlight`). */
  final case class MatchingWord(word: String, typo: Int, prefix: Boolean) {
    /** length IN NORMALIZED CHARS of the match when the lemma matches. */
    def matchLemma(lemma: String): Option[Int] = {
      val d =
        if (prefix) Typo.prefixOsaDistance(word, lemma, typo)
        else Typo.osaDistance(word, lemma, typo)
      if (d > typo) None
      else if (prefix) Some(charsToHighlight(lemma, word))
      else Some(lemma.length)
    }
  }

  sealed trait MatchType
  final case class Full(charLen: Int, ids: Vector[Int]) extends MatchType
  /** split words / multi-word synonyms / phrases: several consecutive
    * tokens must match to complete (`matching_words.rs:133-172`). */
  final case class Partial(rest: Vector[MatchingWord], ids: Vector[Int], charLen: Int)
      extends MatchType

  /** Entries sorted longest-match-first (`MatchingWords::new`,
    * matching_words.rs:33-40). */
  final class MatchingWords private[Matcher] (
      val entries: Vector[(Vector[MatchingWord], Vector[Int])]) {

    /** Lazily match `tok` against every entry; `charLen` values are in
      * ORIGINAL chars of the token. */
    def matchToken(tok: FmtToken): Iterator[MatchType] =
      entries.iterator.flatMap { case (mws, ids) =>
        mws.head.matchLemma(tok.lemma).map { lemmaLen =>
          val charLen = tok.originalLen(lemmaLen)
          if (mws.length > 1) Partial(mws.drop(1), ids, charLen)
          else Full(charLen, ids)
        }
      }
  }

  object MatchingWords {
    def apply(entries: Seq[(Seq[MatchingWord], Seq[Int])]): MatchingWords =
      new MatchingWords(entries.iterator
        .map { case (m, i) => (m.toVector, i.toVector) }
        .toVector
        .sortBy { case (mw, _) => (-mw.length, -mw.head.word.length) })

    /** Port of `create_matching_words` (query_tree.rs:570-745): words with
      * their typo budget, split-word pairs, one- and multi-word synonyms,
      * phrases as consecutive runs, and 1..=3-gram concatenations. */
    def fromQuery(
        ctx: QueryTree.QueryContext,
        authorizeTypos: Boolean,
        parts: Seq[QueryTree.Part]): MatchingWords = {
      import QueryTree._
      val out = mutable.ArrayBuffer.empty[(Seq[MatchingWord], Seq[Int])]

      def typoOf(word: String, maxTypos: Int): Int =
        if (authorizeTypos && !ctx.exactWords.contains(word))
          Typo.typoBudget(word.length, maxTypos,
            ctx.minWordLenOneTypo, ctx.minWordLenTwoTypos)
        else 0

      def partLen(p: Part): Int = p match {
        case PWord(_, _)  => 1
        case PPhrase(ws) => ws.length
      }

      def resolvePart(part: Part, id: Int): Unit = part match {
        case PWord(word, prefix) =>
          ctx.synonyms(Seq(word)).foreach { syn =>
            out += ((syn.map(w => MatchingWord(w, 0, prefix = false)), Seq(id)))
          }
          splitBestFrequency(ctx, word).foreach { case (l, r) =>
            out += ((Seq(MatchingWord(l, 0, prefix = false),
              MatchingWord(r, 0, prefix = false)), Seq(id)))
          }
          out += ((Seq(MatchingWord(word, typoOf(word, 2), prefix)), Seq(id)))
        case PPhrase(ws) =>
          val ids = ws.indices.map(id + _)
          out += ((ws.flatten.map(w => MatchingWord(w, 0, prefix = false)), ids))
      }

      def ngrams(query: Seq[Part], id0: Int): Unit = {
        val MaxNgram = 3
        var id = id0
        // linear_group_by: split at phrase boundaries
        val groups = mutable.ArrayBuffer.empty[Vector[Part]]
        var cur = Vector.newBuilder[Part]
        var curLast: Option[Part] = None
        query.foreach { p =>
          if (curLast.exists(last => last.isPhrase || p.isPhrase)) {
            groups += cur.result(); cur = Vector.newBuilder[Part]
          }
          cur += p; curLast = Some(p)
        }
        val lastGroup = cur.result()
        if (lastGroup.nonEmpty) groups += lastGroup

        groups.foreach { sub =>
          for (ngram <- 1 to math.min(MaxNgram, sub.length)) {
            val group = sub.take(ngram)
            val tail = sub.drop(ngram)
            group match {
              case Seq(part) => resolvePart(part, id)
              case words =>
                val isPrefix = words.last match {
                  case PWord(_, p) => p
                  case _           => false
                }
                val ws = words.collect { case PWord(w, _) => w }
                val ids = ws.indices.map(id + _)
                ctx.synonyms(ws).foreach { syn =>
                  out += ((syn.map(w => MatchingWord(w, 0, prefix = false)), ids))
                }
                val concat = ws.mkString
                out += ((Seq(MatchingWord(concat, typoOf(concat, 1), isPrefix)), ids))
            }
            if (tail.nonEmpty) ngrams(tail, id + 1)
          }
          id += sub.map(partLen).sum
        }
      }

      ngrams(parts, 0)
      MatchingWords(out.toSeq)
    }
  }

  /** Number of chars of `source` to highlight for a prefix match against
    * `target` — modified Damerau-Levenshtein keeping the longest
    * low-typo head (`bytes_to_highlight`, matching_words.rs:205-275;
    * char-based since our strings are in-memory, not utf-8 slices). */
  def charsToHighlight(source: String, target: String): Int = {
    val n = source.length
    val m = target.length
    if (n == 0) return 0
    // we allow two typos, so send two chars even if completely wrong
    if (m < 3) return math.min(n, m)
    if (n == m && source == target) return n

    val inf = n + m
    val ySize = m + 2
    val matrix = Array.fill((n + 2) * ySize)(0)
    @inline def get(x: Int, y: Int) = matrix(x * ySize + y)
    @inline def set(x: Int, y: Int, v: Int): Unit = matrix(x * ySize + y) = v

    set(0, 0, inf)
    for (i <- 0 to n) { set(i + 1, 0, inf); set(i + 1, 1, i) }
    for (j <- 0 to m) { set(0, j + 1, inf); set(1, j + 1, j) }

    val lastRow = mutable.HashMap.empty[Char, Int]
    for (row0 <- 0 until n) {
      val charS = source.charAt(row0)
      var lastMatchCol = 0
      val row = row0 + 1
      for (col0 <- 0 until m) {
        val col = col0 + 1
        val charT = target.charAt(col0)
        val lastMatchRow = lastRow.getOrElse(charT, 0)
        val cost = if (charS != charT) 1 else 0
        val distAdd = get(row, col + 1) + 1
        val distDel = get(row + 1, col) + 1
        val distSub = get(row, col) + cost
        val distTrans = get(lastMatchRow, lastMatchCol) +
          (row - lastMatchRow - 1) + 1 + (col - lastMatchCol - 1)
        val dist = math.min(math.min(distAdd, distDel), math.min(distSub, distTrans))
        set(row + 1, col + 1, dist)
        if (cost == 0) lastMatchCol = col
      }
      lastRow(charS) = row
    }
    var minimum = (Int.MaxValue, 0)
    for (x <- 0 to m) {
      val dist = get(n + 1, x + 1)
      if (dist < minimum._1) minimum = (dist, x)
    }
    minimum._2
  }

  // --------------------------------------------------- formatting tokens

  /** Formatting token: word (with normalized lemma + original-length map)
    * or separator (soft/hard, charabia SeparatorKind). Offsets are char
    * offsets into the original text, [start, end). */
  final case class FmtToken(
      start: Int, end: Int,
      lemma: String,
      /** original chars consumed to produce the first k lemma chars */
      lemmaToOrig: Array[Int],
      /** 0 = word, 1 = soft separator, 2 = hard separator */
      kind: Int) {
    def isSeparator: Boolean = kind != 0
    /** None = word, Some(true) = hard (charabia `separator_kind`) */
    def separatorKind: Option[Boolean] =
      if (kind == 0) None else Some(kind == 2)
    def originalLen(lemmaLen: Int): Int =
      if (lemmaLen >= lemmaToOrig.length) end - start else lemmaToOrig(lemmaLen)
  }

  private val HardSeps: Set[Char] =
    Set('.', ';', ',', '!', '?', '(', ')', '[', ']', '{', '}', '|', '…')

  /** normalize one original char exactly like Tokenizer.normalize does for
    * whole words, keeping the char-count mapping. */
  private def normChar(c: Char): String = {
    val lower = Character.toLowerCase(c)
    val folded = lower match {
      case 'œ' => "oe"
      case 'æ' => "ae"
      case 'ø' => "o"
      case 'ß' => "ss"
      case 'đ' => "d"
      case 'ł' => "l"
      case x   => x.toString
    }
    if (folded.forall(_ < 128)) folded
    else {
      val nfd = java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFD)
      nfd.filter(ch => Character.getType(ch) != Character.NON_SPACING_MARK)
    }
  }

  /** Tokenize for formatting: words + one token per separator char run of
    * the same character (charabia emits separators as their own tokens). */
  def fmtTokens(text: String): Vector[FmtToken] = {
    val out = Vector.newBuilder[FmtToken]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) {
        val start = i
        val lemma = new java.lang.StringBuilder()
        val map = mutable.ArrayBuffer[Int](0)
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) {
          val norm = normChar(text.charAt(i))
          i += 1
          var k = 0
          while (k < norm.length) { lemma.append(norm.charAt(k)); map += (i - start); k += 1 }
        }
        out += FmtToken(start, i, lemma.toString, map.toArray, 0)
      } else {
        val start = i
        val sepChar = c
        while (i < n && text.charAt(i) == sepChar) i += 1
        val kind = if (HardSeps.contains(sepChar)) 2 else 1
        out += FmtToken(start, i, "", Array(0), kind)
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- matcher

  /** One matched token (`Match`, mod.rs:88-96). */
  final case class Match(matchLen: Int, ids: Vector[Int],
      wordPosition: Int, tokenPosition: Int)

  final case class MatchBounds(start: Int, length: Int)

  final case class FormatOptions(highlight: Boolean, crop: Option[Int] = None)

  /** `Matcher` (mod.rs:104-500): computes matches once per text, then
    * formats (crop to the best match interval + highlight). */
  final class TextMatcher(
      matchingWords: MatchingWords,
      cropMarker: String = DefaultCropMarker,
      highlightPrefix: String = DefaultHighlightPrefix,
      highlightSuffix: String = DefaultHighlightSuffix) {

    /** compute_matches (mod.rs:118-225): full matches break to the next
      * token; partial matches look ahead over consecutive word tokens and
      * either commit every covered token or fall through to the next
      * matching-words entry. */
    def computeMatches(text: String): (Vector[FmtToken], Vector[Match]) = {
      val tokens = fmtTokens(text)
      // (tokenPosition, wordPosition, token) for word tokens only
      val words = {
        val b = Vector.newBuilder[(Int, Int, FmtToken)]
        var wp = 0
        tokens.iterator.zipWithIndex.foreach { case (t, tp) =>
          if (!t.isSeparator) { b += ((tp, wp, t)); wp += 1 }
        }
        b.result()
      }
      val matches = mutable.ArrayBuffer.empty[Match]
      var i = 0
      while (i < words.length) {
        val (tp, wp, tok) = words(i)
        var advancedTo = -1
        val it = matchingWords.matchToken(tok)
        var break = false
        while (it.hasNext && !break) {
          it.next() match {
            case Full(charLen, ids) =>
              matches += Match(charLen, ids, wp, tp)
              break = true
            case Partial(rest0, ids, charLen) =>
              // compute_partial_match (mod.rs:121-168)
              val potential = mutable.ArrayBuffer[(Int, Int, Int)]((tp, wp, charLen))
              var rest = rest0
              var j = i + 1
              var done = false
              var failed = false
              while (!done && !failed) {
                if (j >= words.length) failed = true
                else {
                  val (tp2, wp2, tok2) = words(j)
                  rest.head.matchLemma(tok2.lemma).map(tok2.originalLen) match {
                    case Some(cl2) if rest.length > 1 =>
                      potential += ((tp2, wp2, cl2))
                      rest = rest.tail
                      j += 1
                    case Some(cl2) =>
                      potential.foreach { case (tpp, wpp, ml) =>
                        matches += Match(ml, ids, wpp, tpp)
                      }
                      matches += Match(cl2, ids, wp2, tp2)
                      done = true
                    case None => failed = true
                  }
                }
              }
              if (done) { advancedTo = j; break = true }
          }
        }
        i = if (advancedTo >= 0) advancedTo + 1 else i + 1
      }
      (tokens, matches.toVector)
    }

    def matchBounds(text: String): Vector[MatchBounds] = {
      val (tokens, matches) = computeMatches(text)
      matches.map(m => MatchBounds(tokens(m.tokenPosition).start, m.matchLen))
    }

    /** match_interval_score (mod.rs:332-362): (unique ids, −distance,
      * ordered count). */
    private def matchIntervalScore(matches: Seq[Match]): (Int, Int, Int) = {
      val ids = mutable.ArrayBuffer.empty[Int]
      var orderScore = 0
      var distanceScore = 0
      var k = 0
      while (k < matches.length) {
        val m = matches(k)
        if (k + 1 < matches.length) {
          val next = matches(k + 1)
          if (next.ids.min > m.ids.min) orderScore += 1
          distanceScore -= math.min(next.wordPosition - m.wordPosition, 7)
        }
        ids ++= m.ids
        k += 1
      }
      val uniq = ids.distinct.size
      (uniq, distanceScore, orderScore)
    }

    /** find_best_match_interval (mod.rs:365-410). */
    private def findBestMatchInterval(matches: Vector[Match], cropSize: Int): Vector[Match] = {
      if (matches.length <= 1) return matches
      val ord = Ordering.Tuple3(Ordering.Int, Ordering.Int, Ordering.Int)
      var bestInterval = (0, 0)
      var bestScore = matchIntervalScore(matches.slice(0, 1))
      var intervalFirst = 0
      var intervalLast = 0
      var index = 1
      while (index < matches.length) {
        val nextMatch = matches(index)
        if (nextMatch.wordPosition - matches(intervalFirst).wordPosition >= cropSize) {
          val score = matchIntervalScore(matches.slice(intervalFirst, intervalLast + 1))
          if (ord.gt(score, bestScore)) {
            bestInterval = (intervalFirst, intervalLast)
            bestScore = score
          }
          while (nextMatch.wordPosition - matches(intervalFirst).wordPosition >= cropSize)
            intervalFirst += 1
        }
        intervalLast = index
        index += 1
      }
      val score = matchIntervalScore(matches.slice(intervalFirst, intervalLast + 1))
      if (ord.gt(score, bestScore)) bestInterval = (intervalFirst, intervalLast)
      matches.slice(bestInterval._1, bestInterval._2 + 1)
    }

    /** crop_bounds (mod.rs:239-330): grow the window on both sides around
      * the matches until it holds `cropSize` words, preferring the softer
      * separator side. Returns char bounds. */
    private def cropBounds(text: String, tokens: Vector[FmtToken],
        matches: Seq[Match], cropSize: Int): (Int, Int) = {
      val firstWp = matches.headOption.map(_.wordPosition).getOrElse(0)
      val firstTp = matches.headOption.map(_.tokenPosition).getOrElse(0)
      val lastWp = matches.lastOption.map(_.wordPosition).getOrElse(0)
      val lastTp = matches.lastOption.map(_.tokenPosition).getOrElse(0)

      var remaining = cropSize + firstWp - lastWp
      var before = firstTp - 1 // next index consumed leftward
      var after = lastTp       // next index consumed rightward

      var break = false
      while (remaining > 0 && !break) {
        val beforeKind = if (before >= 0) Some(tokens(before).separatorKind) else None
        val afterKind = if (after < tokens.length) Some(tokens(after).separatorKind) else None
        (beforeKind, afterKind) match {
          case (Some(bk), Some(ak)) =>
            (bk, ak) match {
              case (Some(bh), Some(ah)) =>
                if (bh == ah) {
                  before -= 1
                  if (remaining > 1) after += 1 // avoid ending sep before marker
                } else if (bh) after += 1 // before is hard: grow the soft side
                else before -= 1
              case (None, Some(_)) => before -= 1; remaining -= 1
              case (Some(_), None) => after += 1; remaining -= 1
              case (None, None) =>
                before -= 1; remaining -= 1
                if (remaining > 0) { after += 1; remaining -= 1 }
            }
          case (Some(bk), None) =>
            before -= 1
            if (bk.isEmpty) remaining -= 1
          case (None, Some(ak)) =>
            after += 1
            if (ak.isEmpty) remaining -= 1
          case (None, None) => break = true
        }
      }
      val cropStart = if (before >= 0) tokens(before).end else 0
      val cropEnd = if (after < tokens.length) tokens(after).start else text.length
      (cropStart, cropEnd)
    }

    /** format (mod.rs:412-492). */
    def format(text: String, options: FormatOptions): String = {
      if (!options.highlight && options.crop.isEmpty) return text
      val (tokens, allMatches) = computeMatches(text)
      val matches = options.crop match {
        case Some(cropSize) if cropSize > 0 => findBestMatchInterval(allMatches, cropSize)
        case _ => allMatches
      }
      val (charStart, charEnd) = options.crop match {
        case Some(cropSize) if cropSize > 0 => cropBounds(text, tokens, matches, cropSize)
        case _ => (0, text.length)
      }
      val sb = new java.lang.StringBuilder()
      if (charStart > 0 && cropMarker.nonEmpty) sb.append(cropMarker)
      var charIndex = charStart
      if (options.highlight) {
        matches.foreach { m =>
          val token = tokens(m.tokenPosition)
          if (charIndex < token.start) sb.append(text, charIndex, token.start)
          val highlightEnd = math.min(token.start + m.matchLen, token.end)
          sb.append(highlightPrefix)
            .append(text, token.start, highlightEnd)
            .append(highlightSuffix)
          if (highlightEnd < token.end) sb.append(text, highlightEnd, token.end)
          charIndex = token.end
        }
      }
      if (charIndex < charEnd) sb.append(text, charIndex, charEnd)
      if (charEnd < text.length && cropMarker.nonEmpty) sb.append(cropMarker)
      sb.toString
    }
  }

  // ------------------------------------------------- convenience wrappers

  /** Build MatchingWords for a raw query against an index's query context. */
  def matchingWordsFor(index: GraftIndex, query: String,
      authorizeTypos: Boolean = true): MatchingWords = {
    val parts = QueryTree.primitiveQuery(query, index.settings.stopWords)
    MatchingWords.fromQuery(index.queryContext, authorizeTypos, parts)
  }

  /** Highlight all matches in full text. */
  def highlight(text: String, words: MatchingWords,
      pre: String = DefaultHighlightPrefix, post: String = DefaultHighlightSuffix): String =
    new TextMatcher(words, highlightPrefix = pre, highlightSuffix = post)
      .format(text, FormatOptions(highlight = true))

  /** Crop to the best `cropSize`-word window and highlight. */
  def highlightCrop(text: String, words: MatchingWords, cropSize: Int): String =
    new TextMatcher(words).format(text,
      FormatOptions(highlight = true, crop = Some(cropSize)))
}
