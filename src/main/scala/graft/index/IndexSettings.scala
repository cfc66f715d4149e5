package graft.index

/** Index configuration — the Spark-side equivalent of milli's settings
  * stored in the `main` poly-database
  * (`/root/reference/milli/src/index.rs:32-65`, update path
  * `/root/reference/milli/src/update/settings.rs`).
  *
  * `searchableFields` is ordered: its position is the attribute's FieldId
  * and therefore its ranking weight (attribute criterion).
  */
final case class IndexSettings(
    searchableFields: Seq[String],
    filterableFields: Set[String] = Set.empty,
    sortableFields: Set[String] = Set.empty,
    /** multi-word keys joined by space; values = list of replacements
      * (each possibly multi-word → phrase). */
    synonyms: Map[String, Seq[String]] = Map.empty,
    stopWords: Set[String] = Set.empty,
    /** Ranking rules, default `milli/src/criterion.rs:82-91`. */
    criteria: Seq[String] =
      Seq("words", "typo", "proximity", "attribute", "sort", "exactness"),
    distinctField: Option[String] = None,
    exactWords: Set[String] = Set.empty,
    exactAttributes: Set[String] = Set.empty,
    minWordLenOneTypo: Int = 5,
    minWordLenTwoTypos: Int = 9,
    authorizeTypos: Boolean = true,
    /** prefix posting tables: min words per prefix / max prefix length
      * (`/root/reference/milli/src/update/words_prefixes_fst.rs:20`). */
    prefixThreshold: Int = 100,
    maxPrefixLength: Int = 4,
    primaryKey: String = "id")

object IndexSettings {
  /** Table (file) names under an index directory — one per reference LMDB
    * database (`/root/reference/milli/src/index.rs:67-86`). */
  object T {
    val Documents = "documents"
    val DocWordPositions = "doc_word_positions"
    val WordDocids = "word_docids"
    val ExactWordDocids = "exact_word_docids"
    val WordPrefixDocids = "word_prefix_docids"
    val ExactWordPrefixDocids = "exact_word_prefix_docids"
    val WordPositionDocids = "word_position_docids"
    val WordPrefixPositionDocids = "word_prefix_position_docids"
    val FidWordCountDocids = "fid_word_count_docids"
    val DocFidWordCounts = "doc_fid_word_counts"
    val WordPairProximityDocids = "word_pair_proximity_docids"
    val WordPrefixPairProximityDocids = "word_prefix_pair_proximity_docids"
    val PrefixWordPairProximityDocids = "prefix_word_pair_proximity_docids"
    val FacetStringLevels = "facet_string_levels"
    val TermDict = "term_dict"
    val PrefixDict = "prefix_dict"
    val DocFacetNumbers = "doc_facet_numbers"
    val DocFacetStrings = "doc_facet_strings"
    val FacetExistsDocids = "facet_exists_docids"
    val FacetNumberLevels = "facet_number_levels"
    val DocStats = "doc_stats"
    val GeoCells = "geo_cells"
    val PostingBlocks = "posting_blocks"
    val DeletedDocids = "deleted_docids"

    /** Every table the full build writes (NOT DeletedDocids — that is an
      * updates-side table). Used by the resume fast path. */
    val buildStages: Seq[String] = Seq(Documents, DocWordPositions,
      WordDocids, ExactWordDocids, WordPrefixDocids, ExactWordPrefixDocids,
      WordPositionDocids, WordPrefixPositionDocids, FidWordCountDocids,
      DocFidWordCounts, WordPairProximityDocids,
      WordPrefixPairProximityDocids, PrefixWordPairProximityDocids,
      FacetStringLevels, TermDict, PrefixDict, DocFacetNumbers,
      DocFacetStrings, FacetExistsDocids, FacetNumberLevels, DocStats,
      GeoCells, PostingBlocks)
  }
}
