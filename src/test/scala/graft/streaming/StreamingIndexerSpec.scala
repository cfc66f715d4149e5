package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.index.IndexSettings
import graft.search.{GraftIndex, Search, SearchRequest}
import graft.webgen.{WebPage, WebPages}

/** Streaming ingestion: two micro-batches through foreachBatch →
  * incremental merges → searchable index with both batches' docs. */
class StreamingIndexerSpec extends AnyFunSuite with Matchers {

  test("foreachBatch incremental indexing across micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val settings = IndexSettings(searchableFields = Seq("text"), primaryKey = "url")
    val dir = graft.TestSpark.tempDir("graft-stream")
    val ckpt = graft.TestSpark.tempDir("graft-ckpt")

    val all = WebPages.generate(spark, 120).cache()
    val batch1 = all.where($"docid" < 60).collect()
    val batch2 = all.where($"docid" >= 60).collect()

    val stream = MemoryStream[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
    def toTuples(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[String]("url"), r.getAs[java.sql.Timestamp]("warc_ts"),
        r.getAs[Array[Byte]]("html"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[Int]("docid"))
    }
    val indexer = new StreamingIndexer(spark, settings)
    val docsStream = stream.toDF()
      .toDF("url", "warc_ts", "html", "text", "lang", "docid")

    stream.addData(toTuples(batch1).toIndexedSeq)
    val q1 = indexer.start(docsStream, dir, ckpt)
    q1.awaitTermination()

    stream.addData(toTuples(batch2).toIndexedSeq)
    val q2 = indexer.start(docsStream, dir, ckpt)
    q2.awaitTermination()

    val index = GraftIndex(spark, dir, settings)
    index.numberOfDocuments shouldBe 120
    val r = new Search(index).execute(SearchRequest(query = Some("w1 "), limit = 200))
    // docs from BOTH halves must be present
    r.documentsIds.exists(_ < 60) shouldBe true
    r.documentsIds.exists(_ >= 60) shouldBe true
  }

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val settings = IndexSettings(searchableFields = Seq("text"))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two sessions separated by > 30 min; user 2: one session
    stream.addData(
      (1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:10:00")),
      (1L, ts("2026-01-01 11:30:00")),
      (2L, ts("2026-01-01 09:00:00")))
    val df = new StreamingIndexer(spark, settings)
      .sessionStream(stream.toDF().toDF("user_id", "ts"), gapSeconds = 1800)
    val q = df.writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .start()
    // processing-time timeouts keep the query alive — drain then stop
    q.processAllAvailable()
    q.stop()
    // the first session of user 1 closed when the 11:30 event arrived
    val rows = spark.sql("select user_id, n_events from sess")
      .as[(Long, Long)].collect()
    rows should contain((1L, 2L))
  }

  test("watermarked windowed word-df stream") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val settings = IndexSettings(searchableFields = Seq("text"))
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val df = new StreamingIndexer(spark, settings)
      .wordCountStream(stream.toDF().toDF("warc_ts", "text"))
    stream.addData(
      (java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "hello world hello"),
      (java.sql.Timestamp.valueOf("2026-01-01 10:30:00"), "hello spark"))
    val q = df.writeStream.format("memory").queryName("wdf")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.sql("select word, df from wdf").as[(String, Long)].collect().toMap
    rows("hello") shouldBe 2 // distinct docs containing hello in the window
    rows("world") shouldBe 1
    rows("spark") shouldBe 1
  }
}
