object ScaleOnly {
  def buildAt(threads: Int, docs: Long): Double = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]").appName(s"scale-$threads")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SCALE_PARTS", "32").toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val dir = java.nio.file.Files.createTempDirectory(s"scale-$threads").toString
      val d = graft.webgen.WebPages.generate(s, docs)
      val settings = graft.index.IndexSettings(searchableFields = Seq("text"))
      val t0 = System.nanoTime()
      new graft.index.IndexBuilder(s, settings).build(d, dir, resume = false)
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val lo = buildAt(8, n)
    val hi = buildAt(32, n)
    println(f"[scale] docs=$n low8=${lo}%.1f s (${n/lo}%.0f d/s) high32=${hi}%.1f s (${n/hi}%.0f d/s) eff=${(n/hi)/(4*(n/lo))}%.3f")
  }
}
