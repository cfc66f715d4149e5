package graft.search

import graft.core.Typo

/** Query-tree IR + builder — faithful re-expression of
  * `/root/reference/milli/src/search/query_tree.rs` (Operation at :21-29,
  * `create_query_tree` at :360-545, primitive query at :780-840).
  *
  * Built driver-side (tiny data); the only index probes it performs —
  * word pair frequencies for word-splitting and the term dictionary for
  * derivations — are supplied by the caller through [[QueryContext]],
  * backed by Spark lookups in [[GraftIndex]].
  */
object QueryTree {

  sealed trait QueryKind {
    def word: String
    def typo: Int
  }
  /** Exact with the number of typos of the derivation that produced it. */
  final case class Exact(word: String, originalTypo: Int = 0) extends QueryKind {
    def typo: Int = originalTypo
  }
  /** Typo-tolerant up to `typo` typos. */
  final case class Tolerant(word: String, typoBudget: Int) extends QueryKind {
    def typo: Int = typoBudget
  }

  sealed trait Op
  final case class And(children: Seq[Op]) extends Op
  /** `consumable` mirrors Or(true, …): branches produced by the
    * matching-strategy word-removal (the Words criterion pops them). */
  final case class Or(consumable: Boolean, children: Seq[Op]) extends Op
  /** None entries are stop-word holes (`query_tree.rs:285-292`). */
  final case class Phrase(words: Seq[Option[String]]) extends Op
  final case class Query(prefix: Boolean, kind: QueryKind) extends Op

  /** True when the subtree contains a Phrase (positions needed — bitmap
    * resolution and the cell drain don't apply). */
  def hasPhrase(op: Op): Boolean = op match {
    case And(cs)   => cs.exists(hasPhrase)
    case Or(_, cs) => cs.exists(hasPhrase)
    case _: Phrase => true
    case _: Query  => false
  }

  object Op {
    /** `Operation::or`: single child collapses; nested Ors with the same
      * word-branch flag flatten (query_tree.rs:112-129). */
    def or(consumable: Boolean, children: Seq[Op]): Op =
      if (children.size == 1) children.head
      else Or(consumable, children.flatMap {
        case Or(c, cs) if c == consumable => cs
        case op => Seq(op)
      })
    def and(children: Seq[Op]): Op =
      if (children.size == 1) children.head else And(children)
    def phrase(words: Seq[Option[String]]): Op = {
      val defined = words.flatten
      if (defined.size == 1 && words.size == 1) Query(prefix = false, Exact(defined.head))
      else Phrase(words)
    }
  }

  /** A primitive query part (`query_tree.rs:746-778`). */
  sealed trait Part { def isPhrase: Boolean }
  final case class PWord(word: String, prefix: Boolean) extends Part {
    def isPhrase = false
  }
  final case class PPhrase(words: Seq[Option[String]]) extends Part {
    def isPhrase = true
  }

  sealed trait MatchingStrategy
  object MatchingStrategy {
    case object Last extends MatchingStrategy
    case object All extends MatchingStrategy
    case object Any extends MatchingStrategy
    case object First extends MatchingStrategy
    case object Size extends MatchingStrategy
    case object Frequency extends MatchingStrategy
  }

  /** Index probes the builder needs (query_tree.rs:155-173). */
  trait QueryContext {
    /** one-way synonyms for a (possibly multi-word) key, each a word seq */
    def synonyms(words: Seq[String]): Seq[Seq[String]]
    /** docs containing left immediately followed by right (prox 1) */
    def wordPairFrequency(left: String, right: String): Long
    def wordDocumentsCount(word: String): Long
    def exactWords: Set[String]
    def minWordLenOneTypo: Int
    def minWordLenTwoTypos: Int
  }

  /** Tokenize the query into primitive parts — faithful port of
    * `create_primitive_query` (query_tree.rs:780-846):
    *  - at most `wordsLimit` parts (Search default 10, mod.rs:68);
    *  - quoted spans become phrases with stop words as None holes; a hard
    *    separator OR any quote closes an in-progress phrase;
    *  - the last token of the query is a prefix word even when it is a
    *    stop word; non-final stop words are dropped outside phrases;
    *  - an unterminated quote keeps the query tail as a phrase. */
  def primitiveQuery(query: String, stopWords: Set[String],
      wordsLimit: Int = 10): Seq[Part] = {
    // token stream: word runs and separator runs (raw text kept for quotes);
    // word runs are split by code point so supplementary-plane ideographs
    // stay word characters, and hard separators come from the shared
    // tokenizer set (CJK fullwidth punctuation included)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)] // (text, isWord)
    var i = 0
    val n = query.length
    while (i < n) {
      val start = i
      val isWord = graft.core.Tokenizer.isWordChar(query.codePointAt(i))
      while (i < n && graft.core.Tokenizer.isWordChar(query.codePointAt(i)) == isWord)
        i += Character.charCount(query.codePointAt(i))
      tokens += ((query.substring(start, i), isWord))
    }

    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    var phrase = Vector.newBuilder[Option[String]]
    var quoted = false
    var k = 0
    var break = false
    while (k < tokens.length && !break) {
      if (parts.length >= wordsLimit) break = true
      else {
        val (text, isWord) = tokens(k)
        if (isWord) {
          // script-aware segmentation — the SAME function the indexer uses,
          // so a CJK query run expands into exactly the tokens the index
          // stores (Han unigrams, kana/hangul/thai segments, Latin words)
          val segs = graft.core.Tokenizer.segmentRun(text).filter(_.nonEmpty)
          segs.zipWithIndex.foreach { case (w, si) =>
            if (quoted) {
              phrase += (if (stopWords.contains(w)) None else Some(w))
            } else if (k + 1 < tokens.length || si + 1 < segs.length) {
              if (!stopWords.contains(w)) parts += PWord(w, prefix = false)
            } else {
              // last token of the query: prefix word, stop word or not
              parts += PWord(w, prefix = true)
            }
          }
        } else {
          val quoteCount = text.count(_ == '"')
          if (quoteCount % 2 != 0) quoted = !quoted
          if (quoteCount > 0 || text.exists(graft.core.Tokenizer.isHardSep)) {
            // all-stop-word phrases are dropped, exactly like the reference
            // (query_tree.rs:832-835 `phrase.iter().any(|w| w.is_some())`)
            val p = phrase.result()
            if (p.exists(_.isDefined)) parts += PPhrase(p)
            phrase = Vector.newBuilder[Option[String]]
          }
        }
        k += 1
      }
    }
    // unterminated quote: keep the tail as a phrase
    if (!break) {
      val p = phrase.result()
      if (p.exists(_.isDefined)) parts += PPhrase(p)
    }
    parts.toSeq
  }

  /** Best split of a word into two indexed words by pair frequency
    * (`split_best_frequency`, query_tree.rs:293-311). */
  def splitBestFrequency(ctx: QueryContext, word: String): Option[(String, String)] = {
    var best: Option[(Long, String, String)] = None
    var i = 1
    while (i < word.length) {
      val (l, r) = word.splitAt(i)
      val freq = ctx.wordPairFrequency(l, r)
      if (freq > 0 && best.forall(_._1 < freq)) best = Some((freq, l, r))
      i += 1
    }
    best.map { case (_, l, r) => (l, r) }
  }

  private def typoKind(ctx: QueryContext, word: String, authorizeTypos: Boolean,
      maxTypos: Int): QueryKind = {
    // `typos` fn, query_tree.rs:322-336
    if (authorizeTypos && !ctx.exactWords.contains(word)) {
      val count = word.length
      if (count < ctx.minWordLenOneTypo) Exact(word)
      else if (count < ctx.minWordLenTwoTypos) Tolerant(word, math.min(1, maxTypos))
      else Tolerant(word, math.min(2, maxTypos))
    } else Exact(word)
  }

  private def synonymOps(ctx: QueryContext, words: Seq[String]): Seq[Op] =
    ctx.synonyms(words).map { syn =>
      if (syn.size == 1) Query(prefix = false, Exact(syn.head))
      else Phrase(syn.map(Some(_)))
    }

  /** `create_query_tree` (query_tree.rs:360-545). */
  def build(
      ctx: QueryContext,
      strategy: MatchingStrategy,
      authorizeTypos: Boolean,
      parts: Seq[Part]): Option[Op] = {
    if (parts.isEmpty) return None

    def resolveWord(word: String, prefix: Boolean): Op = {
      val children = Vector.newBuilder[Op]
      children ++= synonymOps(ctx, Seq(word))
      splitBestFrequency(ctx, word).foreach { case (l, r) =>
        children += Phrase(Seq(Some(l), Some(r)))
      }
      children += Query(prefix, typoKind(ctx, word, authorizeTypos, maxTypos = 2))
      Op.or(consumable = false, children.result())
    }

    def ngrams(query: Seq[Part], anyWords: Boolean): Op = {
      val MaxNgram = 3
      val opChildren = Vector.newBuilder[Op]
      // linear_group_by: split at phrase boundaries
      val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[Part]]
      var cur = Vector.newBuilder[Part]
      var curNonEmpty = false
      query.foreach { p =>
        if (curNonEmpty && (p.isPhrase || cur.result().last.isPhrase)) {
          groups += cur.result(); cur = Vector.newBuilder[Part]; curNonEmpty = false
        }
        cur += p; curNonEmpty = true
      }
      if (curNonEmpty) groups += cur.result()

      groups.foreach { sub =>
        val orOpChildren = Vector.newBuilder[Op]
        for (ngram <- 1 to math.min(MaxNgram, sub.length)) {
          val group = sub.take(ngram)
          val tail = sub.drop(ngram)
          val isLast = tail.isEmpty
          val andOpChildren = Vector.newBuilder[Op]
          group match {
            case Seq(PWord(w, prefix)) =>
              andOpChildren += resolveWord(w, prefix)
            case Seq(PPhrase(ws)) =>
              andOpChildren += Op.phrase(ws)
            case words =>
              val isPrefix = words.last match {
                case PWord(_, p) => p
                case _           => false
              }
              val ws = words.collect { case PWord(w, _) => w }
              val ops = Vector.newBuilder[Op]
              ops ++= synonymOps(ctx, ws)
              val concat = ws.mkString
              ops += Query(isPrefix, typoKind(ctx, concat, authorizeTypos, maxTypos = 1))
              andOpChildren += Op.or(consumable = false, ops.result())
          }
          if (!isLast) andOpChildren += ngrams(tail, anyWords)
          if (anyWords) orOpChildren += Op.or(consumable = false, andOpChildren.result())
          else orOpChildren += Op.and(andOpChildren.result())
        }
        opChildren += Op.or(consumable = false, orOpChildren.result())
      }
      if (anyWords) Op.or(consumable = false, opChildren.result())
      else Op.and(opChildren.result())
    }

    import MatchingStrategy._
    val numberPhrases = parts.count(_.isPhrase)
    val removeCount = parts.length - math.max(numberPhrases, 1)
    if (removeCount == 0 || strategy == All)
      return Some(ngrams(parts, anyWords = false))
    if (strategy == Any)
      return Some(Or(consumable = true, Seq(
        ngrams(parts, anyWords = true),
        ngrams(parts, anyWords = false))))

    var query = parts.toVector
    val branches = scala.collection.mutable.ArrayBuffer.empty[Op]
    var continue = true
    var iter = 0
    while (iter <= removeCount && continue) {
      val pos: Option[Int] = strategy match {
        case Last =>
          query.zipWithIndex.filterNot(_._1.isPhrase).lastOption.map(_._2)
        case First =>
          query.zipWithIndex.find(!_._1.isPhrase).map(_._2)
        case Size =>
          query.zipWithIndex.filterNot(_._1.isPhrase)
            .minByOption { case (p, _) => p.asInstanceOf[PWord].word.length }.map(_._2)
        case Frequency =>
          query.zipWithIndex.filterNot(_._1.isPhrase)
            .maxByOption { case (p, _) =>
              val c = ctx.wordDocumentsCount(p.asInstanceOf[PWord].word)
              if (c == 0) Long.MaxValue else c
            }.map(_._2)
        case _ => None
      }
      branches.insert(0, ngrams(query, anyWords = false))
      pos match {
        case Some(i) => query = query.patch(i, Nil, 1)
        case None    => continue = false
      }
      iter += 1
    }
    Some(Or(consumable = true, branches.toSeq))
  }

  /** The `Or(true, …)` branch list in drain order (most words first == the
    * words-criterion bucket order, `criteria/words.rs:31-106`). */
  def wordsBranches(tree: Op): Seq[Op] = tree match {
    case Or(true, children) => children.reverse // Vec::pop drains from the end
    case other              => Seq(other)
  }

  /** Max typos reachable in a tree (`maximum_typo`, criteria/mod.rs). */
  def maximumTypo(op: Op): Int = op match {
    case And(cs)    => cs.map(maximumTypo).sum
    case Or(_, cs)  => if (cs.isEmpty) 0 else cs.map(maximumTypo).max
    case Phrase(_)  => 0
    case Query(_, k) => k.typo
  }
}
