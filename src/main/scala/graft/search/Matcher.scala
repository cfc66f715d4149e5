package graft.search

import graft.core.{Tokenizer, Typo}

/** Highlight / crop formatting of returned documents —
  * `/root/reference/milli/src/search/matches/` (MatchingWords matching at
  * :matching_words.rs, best-window crop at mod.rs:118-500).
  *
  * Matching rules per token: a query word matches a doc token if the token
  * is a typo-derivation of it (same DFA semantics as retrieval); a prefix
  * query word matches tokens it prefixes. Phrases must match consecutively.
  * Cropping picks the window of `cropSize` tokens containing the most
  * matched query words (ties → earliest), like the reference's
  * `find_best_match_interval`. Not rank-relevant — pure post-processing of
  * the returned page (runs as a map over the top-k rows only).
  */
object Matcher {

  final case class MatchSpan(start: Int, end: Int) // char offsets, [start, end)

  final case class Formatted(text: String, matches: Seq[MatchSpan])

  final case class QueryWord(word: String, prefix: Boolean, maxTypo: Int)

  def queryWords(parts: Seq[QueryTree.Part], settings: graft.index.IndexSettings): Seq[QueryWord] =
    parts.flatMap {
      case QueryTree.PWord(w, prefix) =>
        Seq(QueryWord(w, prefix, Typo.typoBudget(w.length,
          oneTypoLen = settings.minWordLenOneTypo, twoTypoLen = settings.minWordLenTwoTypos)))
      case QueryTree.PPhrase(ws) =>
        ws.flatten.map(w => QueryWord(w, prefix = false, maxTypo = 0))
    }

  private def tokenMatches(token: String, q: QueryWord): Boolean =
    Typo.derive(q.word, token, q.prefix, q.maxTypo).isDefined

  /** Char spans of matched tokens in `text`. */
  def matchSpans(text: String, words: Seq[QueryWord]): Seq[MatchSpan] = {
    val spans = Vector.newBuilder[MatchSpan]
    var i = 0
    val n = text.length
    while (i < n) {
      if (Character.isLetterOrDigit(text.charAt(i))) {
        val start = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
        val norm = Tokenizer.normalize(text.substring(start, i))
        if (words.exists(tokenMatches(norm, _))) spans += MatchSpan(start, i)
      } else i += 1
    }
    spans.result()
  }

  /** Wrap matches with tags (default `<em>`). */
  def highlight(text: String, words: Seq[QueryWord],
      pre: String = "<em>", post: String = "</em>"): String = {
    val spans = matchSpans(text, words)
    if (spans.isEmpty) return text
    val sb = new java.lang.StringBuilder()
    var last = 0
    spans.foreach { s =>
      sb.append(text, last, s.start).append(pre)
        .append(text, s.start, s.end).append(post)
      last = s.end
    }
    sb.append(text.substring(last)).toString
  }

  /** Crop to the `cropSize`-token window with the most DISTINCT matched
    * query words (ties → more total matches → earliest), reference
    * `find_best_match_interval` semantics. */
  def crop(text: String, words: Seq[QueryWord], cropSize: Int = 10): String = {
    // token spans + which query word each matches
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)] // start,end,qidx(-1)
    var i = 0
    val n = text.length
    while (i < n) {
      if (Character.isLetterOrDigit(text.charAt(i))) {
        val start = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
        val norm = Tokenizer.normalize(text.substring(start, i))
        val q = words.indexWhere(tokenMatches(norm, _))
        tokens += ((start, i, q))
      } else i += 1
    }
    if (tokens.isEmpty) return text.take(cropSize * 8)
    var bestStart = 0
    var bestScore = (-1, -1)
    var w = 0
    while (w + 1 <= tokens.length) {
      val windowEnd = math.min(w + cropSize, tokens.length)
      val window = tokens.slice(w, windowEnd)
      val distinct = window.map(_._3).filter(_ >= 0).distinct.size
      val total = window.count(_._3 >= 0)
      if (distinct > bestScore._1 ||
          (distinct == bestScore._1 && total > bestScore._2)) {
        bestScore = (distinct, total); bestStart = w
      }
      w += 1
    }
    val end = math.min(bestStart + cropSize, tokens.length)
    val from = tokens(bestStart)._1
    val to = tokens(end - 1)._2
    (if (bestStart > 0) "…" else "") + text.substring(from, to) +
      (if (end < tokens.length) "…" else "")
  }
}
