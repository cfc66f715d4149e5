package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.index.{IndexBuilder, IndexSettings}

/** Microbench the word-pair-proximity stage in pieces: sweep-only,
  * sweep+groupBy-agg, full stage (agg + range repartition + write) — so
  * optimization targets the component that actually costs, not the stage
  * label. `runMain graft.tools.StageBench [threads] [docs]` */
object StageBench {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(16)
    val docs = args.lift(1).map(_.toLong).getOrElse(300000L)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-stage-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 4 << 20)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val F = graft.functions.GraftFunctions
    try {
      val corpus = graft.webgen.WebPages.generate(spark, docs)
      val settings = IndexSettings(searchableFields = Seq("text"))
      val builder = new IndexBuilder(spark, settings)
      val dwp = builder.extractDwp(corpus).persist(StorageLevel.MEMORY_AND_DISK)
      dwp.count()
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[sb] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n")
      }
      time("sweep-only (count)") {
        dwp.mapPartitions { it =>
          IndexBuilder.groupConsecutive(it).flatMap { case (docid, rows) =>
            IndexBuilder.pairProximities(rows).iterator.map {
              case ((w1, w2), prox) => (prox, w1, w2, docid)
            }
          }
        }.count()
      }
      val out = java.nio.file.Files.createTempDirectory("sb").toString
      time("sweep+agg+range+write") {
        dwp.mapPartitions { it =>
          IndexBuilder.groupConsecutive(it).flatMap { case (docid, rows) =>
            IndexBuilder.pairProximities(rows).iterator.map {
              case ((w1, w2), prox) => (prox, w1, w2, docid)
            }
          }
        }.toDF("prox", "w1", "w2", "docid")
          .groupBy($"prox", $"w1", $"w2")
          .agg(F.bitmap_or_agg($"docid").as("docids"))
          .repartitionByRange($"w1", $"w2", $"prox")
          .sortWithinPartitions("w1", "w2", "prox")
          .write.mode("overwrite").parquet(s"$out/wpp")
        spark.read.parquet(s"$out/wpp").count()
      }
      time("partials-only (count)") {
        dwp.mapPartitions(it => IndexBuilder.pairProximityPartials(it)).count()
      }
      time("partials+merge+write") {
        val partial = dwp.mapPartitions(it => IndexBuilder.pairProximityPartials(it))
          .toDF("w1", "w2", "prox", "partial")
          .persist(StorageLevel.MEMORY_AND_DISK)
        partial
          .repartitionByRange($"w1", $"w2", $"prox")
          .sortWithinPartitions("w1", "w2", "prox")
          .mapPartitions(it => IndexBuilder.mergePairPartialRuns(it))
          .toDF("prox", "w1", "w2", "docids")
          .write.mode("overwrite").parquet(s"$out/wpp2")
        spark.read.parquet(s"$out/wpp2").count()
      }
      dwp.unpersist()
    } finally spark.stop()
  }
}
