package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexSettings, Manifest}

/** Scaling-diagnosis harness: replicate Bench's `buildAt` (identical
  * corpus, identical shuffle partitioning, only the thread count varies)
  * and print the per-stage timeline from the manifest — start offset,
  * duration, rows — so the non-scaling stages of the build DAG are
  * visible instead of inferred from two wall-clock totals.
  *
  *   runMain graft.tools.ScaleProfile <threads> [docs]
  */
object ScaleProfile {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(16)
    val docs = args.lift(1).map(_.toLong).getOrElse(300000L)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-scale-profile-$threads")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prof-$threads").toString
      val corpus = graft.webgen.WebPages.generate(spark, docs)
      val settings = IndexSettings(searchableFields = Seq("text"))
      val t0 = System.nanoTime()
      new IndexBuilder(spark, settings).build(corpus, dir, resume = false)
      val wall = (System.nanoTime() - t0) / 1e9
      val manifest = Manifest.load(dir)
      println(f"[profile] threads=$threads docs=$docs wall=$wall%.1fs (${docs / wall}%.0f docs/s)")
      // reconstruct the timeline from the raw jsonl (load drops `start`)
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dir/_graft_manifest.jsonl"))
      lines.forEach { line =>
        def f(k: String): String = {
          val i = line.indexOf(s""""$k":""")
          if (i < 0) "-"
          else line.substring(i + k.length + 3).dropWhile(_ == '"')
            .takeWhile(c => c != ',' && c != '}' && c != '"')
        }
        if (f("table") == "__stage__")
          println(f"[profile-exec] ${f("name")}%-36s executor_ms=${f("executor_ms")}%9s gc_ms=${f("gc_ms")}%8s tasks=${f("tasks")}%5s read=${f("records_read")}%10s")
        else if (f("table") != "-" && !f("table").startsWith("__"))
          println(f"[profile] ${f("table")}%-36s start=${f("start")}%8s dur=${f("seconds")}%8s rows=${f("rows")}%9s")
      }
    } finally spark.stop()
  }
}
