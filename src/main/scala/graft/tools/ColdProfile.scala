package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSettings}
import graft.search.{GraftIndex, Search, SearchRequest}

/** Cold first-touch anatomy for the milli-rank serving path.
  *
  * Builds (or resumes) a fixed web-corpus index, then for each probe query
  * opens a FRESH handle (fresh driver caches), optionally prewarms, and
  * runs the query once COLD and once WARM — recording every Spark job the
  * cold run launches (description + duration) so the cold floor is
  * attributable to specific fetches instead of guessed at.
  *
  * Usage: runMain graft.tools.ColdProfile [docs] [warm|nowarm] [queries...]
  */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(300000L)
    val prewarm = args.lift(1).forall(_ == "warm")
    val queries =
      if (args.length > 2) args.drop(2).toSeq.map(_.replace('_', ' '))
      else Seq("w3 w17", "w200", "the w100 w2500")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cold-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft-coldprof-$nDocs"
    val settings = IndexSettings(searchableFields = Seq("text"))
    new IndexBuilder(spark, settings)
      .build(graft.webgen.WebPages.generate(spark, nDocs), dir)

    // job listener: description + wall per job, reset per query
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (d, System.nanoTime()))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (d, t0) =>
          jobs.add((d, (System.nanoTime() - t0) / 1000000))
        }
      }
    })

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }

    // JIT warmup on a throwaway handle (the bench's cold numbers sit after
    // its BM25 phase + a w1 w2 ranked query — measure fetch cost, not JIT)
    {
      val jit = GraftIndex(spark, dir, settings)
      val s = new Search(jit, maxLocalPostings = 1L << 18)
      (0 until 3).foreach { _ =>
        s.execute(SearchRequest(query = Some("w1 w2"), limit = 20, exhaustive = false))
        s.execute(SearchRequest(query = Some("w5 w31 w900"), limit = 20, exhaustive = false))
      }
    }

    queries.foreach { q =>
      val index = GraftIndex(spark, dir, settings)
      val (_, cacheMs) = timed { if (prewarm) index.warm() }
      val (_, warmMs) = timed { if (prewarm) index.warmServing() }
      println(f"[coldprof] warm()=${cacheMs / 1000}%.1fs warmServing()=${warmMs / 1000}%.1fs")
      val search = new Search(index, maxLocalPostings = 1L << 18)
      jobs.clear()
      val (r1, cold) = timed(search.execute(
        SearchRequest(query = Some(q), limit = 20, exhaustive = false)))
      val coldJobs = new java.util.ArrayList(jobs)
      jobs.clear()
      val (_, warm) = timed(search.execute(
        SearchRequest(query = Some(q), limit = 20, exhaustive = false)))
      val warmJobs = new java.util.ArrayList(jobs)
      Thread.sleep(2000) // let async dwp back-fills land before the 2nd warm
      jobs.clear()
      val (_, warm2) = timed(search.execute(
        SearchRequest(query = Some(q), limit = 20, exhaustive = false)))
      println(f"[coldprof] q='$q' prewarm=${warmMs / 1000}%.1fs cold=$cold%.1fms " +
        f"warm=$warm%.1fms warm2=$warm2%.1fms warm2Jobs=${jobs.size} " +
        f"candidates=${r1.candidates}")
      coldJobs.forEach { case (d, ms) => println(f"[coldprof]   cold job $ms%5d ms  $d") }
      warmJobs.forEach { case (d, ms) => println(f"[coldprof]   warm job $ms%5d ms  $d") }
      jobs.forEach { case (d, ms) => println(f"[coldprof]   wrm2 job $ms%5d ms  $d") }
    }
    spark.stop()
  }
}
