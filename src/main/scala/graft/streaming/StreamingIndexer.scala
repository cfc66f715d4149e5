package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexSettings, Updates}

/** Structured-Streaming front door for the indexer.
  *
  * The reference ingests batches transactionally
  * (`IndexDocuments::execute`, `index_documents/mod.rs:169-200`); the
  * streaming equivalent is `foreachBatch` → [[Updates.addDocuments]]: each
  * micro-batch is one atomic incremental index merge, checkpointed by the
  * streaming engine (exactly-once per batch id).
  *
  * [[wordCountStream]] is the watermarked windowed-aggregation shape
  * (readStream → event-time window → writeStream) over incoming documents —
  * live df deltas per (window, word).
  */
class StreamingIndexer(spark: SparkSession, settings: IndexSettings) {

  /** Incrementally index a stream of document batches into `indexDir`. */
  def start(
      docsStream: DataFrame,
      indexDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val updates = new Updates(spark, settings)
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) updates.addDocuments(indexDir, batch)
        ()
      }
      .start()
  }

  /** Watermarked per-window word document-frequency deltas:
    * docs(ts, docid, text) → (window, word, df). */
  def wordCountStream(
      docsStream: DataFrame,
      tsCol: String = "warc_ts",
      watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame = {
    val tokenize = udf((text: String) =>
      graft.core.Tokenizer.tokenize(Option(text).getOrElse(""))
        .map(_.word).distinct)
    docsStream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(tokenize(col("text"))).as("word"))
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("word"))
      .agg(count(lit(1)).as("df"))
  }
}
