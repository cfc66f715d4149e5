package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object TestSpark {

  /** Tracked temp dir: deleted on JVM exit. Specs must use this instead of
    * Files.createTempDirectory directly — repeated full-suite runs leaked
    * thousands of /tmp/graft-* fixture dirs (~1 GB per run) otherwise. */
  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    cleanup.add(d)
    d.toString
  }

  private val cleanup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(); ()
    }
    cleanup.forEach(p => rec(p.toFile))
  }))
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
