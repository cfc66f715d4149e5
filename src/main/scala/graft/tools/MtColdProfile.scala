package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSettings}
import graft.search.{GraftIndex, Search, SearchRequest}

/** Concurrency profile of the COLD serving path: N clients issue ranked
  * queries over DISJOINT never-seen rare-word ranges against one warmed
  * handle, so every query pays real cold work (leaf bitmap point reads +
  * restricted forward fetches on the direct decode pool) at the same time.
  * Answers NOTES_ROUND5 round-6 candidate 4 — does the fixed decode pool
  * (min(8, max(4, cores/4)) threads) queue one client's reads behind
  * another's — by comparing per-query latency quantiles at 1 client vs N.
  * Rerun with SPARK_GRAFT_DECODE_THREADS to measure a resized pool.
  *
  * Usage: runMain graft.tools.MtColdProfile [docs] [clients] [perClient]
  */
object MtColdProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(300000L)
    val clients = args.lift(1).map(_.toInt).getOrElse(8)
    val perClient = args.lift(2).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-mtcold-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft-coldprof-$nDocs" // shared with ColdProfile (resume)
    val settings = IndexSettings(searchableFields = Seq("text"))
    new IndexBuilder(spark, settings)
      .build(graft.webgen.WebPages.generate(spark, nDocs), dir)

    val index = GraftIndex(spark, dir, settings)
    index.warm()
    index.warmServing()
    val search = new Search(index, maxLocalPostings = 1L << 18)
    // JIT: drive the drain shapes once (same rationale as warmServing's
    // representative queries — measured C2 compile otherwise lands in the
    // first client's first samples)
    search.execute(SearchRequest(query = Some("w210 w411"), limit = 20))

    // disjoint rare ranges per (client, iteration): w5000.. has df ~1-30 at
    // 300k docs, so every query is a genuine cache miss with a restricted
    // forward fetch. Driver caches are fresh per process; the salt only
    // de-correlates word ranges ACROSS runs — and since the webgen vocab
    // is just 50k words, a rerun against the same resumed index CAN
    // overlap a prior run's OS page-cache footprint. Treat cross-run
    // absolutes as ±noise; the within-run queueing RATIO is the signal.
    // Bounds: max id = 5000 + 96·105 + (clients)·2500 + 23·73 + 13121
    // < 50000 at the default 8 clients (client id `clients` = baseline).
    val salt = (System.nanoTime() % 97).toInt * 105
    def query(c: Int, i: Int): String = {
      val base = 5000 + salt + c * 2500 + i * 73
      s"w$base w${base + 13121}"
    }

    def run(nClients: Int, firstClient: Int): Seq[Double] = {
      val times = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nClients)
      val futs = (0 until nClients).map { ci =>
        pool.submit(new Runnable {
          override def run(): Unit = (0 until perClient).foreach { i =>
            val q = query(firstClient + ci, i)
            val t0 = System.nanoTime()
            search.execute(SearchRequest(query = Some(q), limit = 20))
            times.add((System.nanoTime() - t0) / 1e6)
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      times.asScala.toSeq.sorted
    }
    def pct(xs: Seq[Double], p: Double): Double =
      xs(math.min(xs.length - 1, (p * xs.length).toInt))

    // single-client floor first — its client id sits BEYOND the mt range
    // (clients 0..N-1), so no mt sample replays a baseline-warmed word
    val single = run(1, firstClient = clients)
    val mt = run(clients, firstClient = 0)
    val reads = graft.search.DirectParquet.reads.get()
    val falls = graft.search.DirectParquet.fallbacks.get()
    println(f"[mtcold] docs=$nDocs decodeThreads=" +
      sys.env.getOrElse("SPARK_GRAFT_DECODE_THREADS", "(default)") +
      f" directReads=$reads fallbacks=$falls")
    println(f"[mtcold] 1 client : p50 ${pct(single, 0.5)}%8.1f ms  " +
      f"p95 ${pct(single, 0.95)}%8.1f ms  max ${single.last}%8.1f ms")
    println(f"[mtcold] $clients clients: p50 ${pct(mt, 0.5)}%8.1f ms  " +
      f"p95 ${pct(mt, 0.95)}%8.1f ms  max ${mt.last}%8.1f ms  " +
      f"(queueing x${pct(mt, 0.5) / math.max(0.01, pct(single, 0.5))}%.2f p50)")
    spark.stop()
  }
}
