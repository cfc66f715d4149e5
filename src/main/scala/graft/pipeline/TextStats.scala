package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language id, quality scoring,
  * token counting, fingerprinting. All declarative (codegen'd) except where
  * noted; conventions match the DuckDB-checked oracles. */
object TextStats {

  /** Marker-token profiles per language (tiny n-gram/stopword heuristic). */
  val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den"),
    "es" -> Set("el", "la", "los", "de", "y", "que", "es", "un", "una", "por"))

  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), w => w =!= "")

  /** Per-doc language guess: argmax of marker-token hits (ties → unknown
    * unless a margin of ≥2 hits). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // marker hits are map-side array filters over the tokenized text (one
    // count per language) — the exploded-token groupBy shuffled every
    // token occurrence for four integer counters per doc
    val hits = Profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      size(filter(toks(col(textCol)),
        w => w.isin(words.toSeq.map(lit): _*))).as(s"hits_$lang")
    }
    val scored = docs
      .where(size(toks(col(textCol))) > 0) // token-less docs absent, as before
      .select(col(idCol).as("docid") +: hits: _*)
    val langs = Profiles.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"hits_$l").as("hits"), lit(l).as("lang")))
    val outCols = Seq(col("docid"), col("pred")) ++ langs.map(l => col(s"hits_$l"))
    scored.withColumn("best", greatest(best: _*))
      .withColumn("pred",
        when(col("best.hits") >= 2, col("best.lang")).otherwise(lit("unknown")))
      .select(outCols: _*)
  }

  /** Quality features + a composite score in [0,1]:
    * length band, stop-word ratio band, mean token length band. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      stopWords: Set[String] = Profiles("en")): DataFrame = {
    val t = docs.select(col(idCol).as("docid"), col(textCol).as("text"),
      toks(col(textCol)).as("toks"))
    t.select(col("docid"),
        size(col("toks")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        (size(filter(col("toks"), w => w.isin(stopWords.toSeq.map(lit): _*)))
          .cast("double") / greatest(size(col("toks")), lit(1))).as("stop_ratio"),
        (aggregate(transform(col("toks"), w => length(w)), lit(0),
          (acc, x) => acc + x).cast("double") /
          greatest(size(col("toks")), lit(1))).as("avg_token_len"))
      .withColumn("score",
        (when(col("n_tokens").between(20, 2000), 0.4).otherwise(0.0)) +
          (when(col("stop_ratio").between(0.05, 0.6), 0.3).otherwise(0.0)) +
          (when(col("avg_token_len").between(2.5, 12.0), 0.3).otherwise(0.0)))
  }

  /** Whitespace-token and alnum-run-token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("docid"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("ws_tokens"),
      size(toks(col(textCol))).cast("long").as("re_tokens"))

  /** Order-sensitive 60-bit document fingerprint: xor of position-salted
    * token hashes (content-defined identity that survives re-partitioning). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // map-side xor fold over the token array (xor is order-independent,
    // so the value matches the old shuffled bit_xor exactly)
    docs.where(size(toks(col(textCol))) > 0)
      .select(col(idCol).as("docid"),
        aggregate(
          transform(toks(col(textCol)), (w, i) =>
            Dedup.md5long(concat(w, lit("@"), (i + 1).cast("string")))),
          lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp"))
}
