package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexSettings}

/** Optimization-round probe (guide §1): isolates the engine-gate
  * `IndexBuilder.build` that `q_engine_bm25` carries in the battery, prints
  * the per-stage manifest timings (wall + start offset + executor ms), and
  * optionally re-times battery queries with the noop sink. NOT part of the
  * frozen bench contract — numbers are cited in OPTIMIZATION_r06.md only.
  */
object BenchExtra {

  private def rmTree(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete()
    }
    rec(new java.io.File(path))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = args.headOption.getOrElse("build")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 4))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "build" =>
        // exactly the EngineQueries.index input shape
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .withColumn("docid", col("doc_id").cast("int"))
          .withColumn("_geo.lat", expr("((doc_id * 7919) % 12000) / 100.0 - 60.0"))
          .withColumn("_geo.lng", expr("((doc_id * 104729) % 34000) / 100.0 - 170.0"))
        val settings = IndexSettings(
          searchableFields = Seq("text"),
          filterableFields = Set("n_chars", "lang", "source", "_geo.lat", "_geo.lng"),
          sortableFields = Set("n_chars"))
        val n = args.drop(1).headOption.map(_.toInt).getOrElse(1)
        (0 until n).foreach { i =>
          val dir = java.nio.file.Files.createTempDirectory("graft-bx").toString
          val t0 = System.nanoTime()
          new IndexBuilder(spark, settings).build(docs, dir, resume = false)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[bx] engine build #$i: $sec%.3f s")
          if (i == n - 1) { // print the last manifest (per-stage lines)
            val mf = new java.io.File(s"$dir/_graft_manifest.jsonl")
            if (mf.exists())
              scala.io.Source.fromFile(mf).getLines().foreach(l => println(s"[mf] $l"))
            else println(s"[bx] no manifest at $mf")
          }
          rmTree(dir)
        }

      case "battery" =>
        // per-query noop-style timing, N repeats, bypassing nothing;
        // optional query-name filter after the repeat count
        val n = args.drop(1).headOption.map(_.toInt).getOrElse(2)
        val only = args.drop(2).toSet
        (0 until n).foreach { r =>
          graft.SparkEntry.queries.toSeq.sortBy(_._1)
            .filter(q => only.isEmpty || only(q._1))
            .foreach { case (name, fn) =>
              val t0 = System.nanoTime()
              try fn(spark, sfDir).count()
              catch { case e: Throwable => System.err.println(s"$name failed: $e") }
              println(f"[bx] run$r $name ${(System.nanoTime() - t0) / 1e9}%.3f")
            }
        }
      case "scalebuild" =>
        // webgen corpus build at the scaling-phase shape (local[N] comes
        // from SPARK_GRAFT_CPUS; docs from arg or 300k) + manifest print
        val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(300000L)
        val docs = graft.webgen.WebPages.generate(spark, nDocs)
        val settings = IndexSettings(searchableFields = Seq("text"))
        val dir = java.nio.file.Files.createTempDirectory("graft-bx-scale").toString
        val t0 = System.nanoTime()
        new IndexBuilder(spark, settings).build(docs, dir, resume = false)
        println(f"[bx] scale build $nDocs docs ${(System.nanoTime() - t0) / 1e9}%.3f s " +
          f"(${nDocs / ((System.nanoTime() - t0) / 1e9)}%.0f docs/s)")
        val mf = new java.io.File(s"$dir/_graft_manifest.jsonl")
        if (mf.exists())
          scala.io.Source.fromFile(mf).getLines().foreach(l => println(s"[mf] $l"))
        rmTree(dir)

      case "explain" =>
        // write .explain("formatted") per named query (or all non-engine
        // queries) to <outDir>/<query>_<tag>.txt — the plan evidence for
        // plans/r06/ (engine queries drive imperative search paths, not a
        // single DataFrame plan, so they are skipped unless named)
        val tag = args.drop(1).headOption.getOrElse("before")
        val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r06")
        new java.io.File(outDir).mkdirs()
        val names = args.drop(2) match {
          case Array() => graft.SparkEntry.queryMap.keys.toSeq.sorted
            .filterNot(_.startsWith("q_engine"))
          case named => named.toSeq
        }
        names.foreach { name =>
          val fn = graft.SparkEntry.queryMap(name)
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt")
            try w.println(plan) finally w.close()
            println(s"[bx] wrote $outDir/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[bx] $name explain failed: $e") }
        }
      case other =>
        System.err.println(s"unknown mode $other")
    }
    spark.stop()
  }
}
