package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-granular parquet table maintenance shared by [[Updates]] and the
  * derived-table refresh: atomic swap-in replaces, footer-stats touched-file
  * merges, and zero-job file appends. This is the Spark-file-level analogue
  * of milli writing only the touched LMDB keys per update
  * (`/root/reference/milli/src/update/index_documents/typed_chunk.rs:45-216`)
  * — a batch pays IO proportional to the keys it touches, never to the
  * table it lands in. */
object TableIO {

  /** Row-group byte cap for index-table writes. Parquet's 128 MB default
    * puts a whole output file in ONE row group, so footer min/max stats
    * can't prune INSIDE a file: a point read of one hot word (or a
    * docid-restricted rank fetch within a word's span) decodes the file's
    * every row. 4 MB groups keep each footer interval tight on the tables'
    * (key, docid) sort order — serving point reads and the cells' pair
    * bitmap fetches decode only the groups whose interval matches. */
  val RowGroupBytes: Int =
    sys.env.get("SPARK_GRAFT_ROW_GROUP_BYTES").map(_.toInt).getOrElse(4 << 20)

  /** Page-row cap for the forward index (doc_word_positions). The word
    * column is sorted + RLE'd so tiny that at the default page sizing one
    * PAGE spans a whole row group — parquet's column index then can't
    * prune inside a group and a direct point read of a few words decodes
    * every row. Capping pages at 1k rows makes the column index's
    * per-page word [min,max] the effective pruning unit: a word band
    * decodes ~1–2 pages (~1–2k rows) instead of ~400k. Costs ~0.4% file
    * size in page headers; full-scan throughput unchanged (measured). */
  val DwpPageRows: Int =
    sys.env.get("SPARK_GRAFT_DWP_PAGE_ROWS").map(_.toInt).getOrElse(1024)

  /** Marker file: present in a doc_word_positions dir whose files were
    * written under [[DwpPageRows]] — the serving direct point reader keys
    * off it (older coarse-paged dirs keep the Spark scan, where a direct
    * read would decode whole row groups). */
  val DwpPageMarker = "_graft_dwp_paged"

  /** Same treatment for the pair-proximity table: its w1 column is sorted
    * + RLE'd into one page per group at default sizing, so the cells'
    * cold pair-bitmap point read (a frequent word's fat band) decoded
    * whole 4 MB groups. 1k-row pages let the column index prune a left
    * word's rows to its own pages. */
  val PairPageMarker = "_graft_pair_paged"

  /** Page-row cap of dirs whose marker predates marker CONTENT (empty
    * `createNewFile` markers): those files were written while the default
    * was 1024 and no override path existed, so the value is known. */
  val LegacyPageRows = 1024L

  /** The page-row cap `dir`'s files were committed under. Absent marker →
    * None (dir is not fine-paged; direct point reads must not engage).
    * Present-but-empty / unparsable → [[LegacyPageRows]]. ONE helper on
    * purpose: three divergent inline parses previously disagreed on the
    * empty-marker case, under-pricing the serving volume gate. */
  def readPageMarker(dir: String, name: String): Option[Long] = {
    val f = new java.io.File(dir, name)
    if (!f.exists()) None
    else Some(scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
      .toOption.filter(_ > 0).getOrElse(LegacyPageRows))
  }

  /** Parquet write with the serving row-group cap (+ fine-grained pages
    * for the forward index and the pair table — see [[DwpPageRows]]). */
  def writeParquet(df: DataFrame, path: String): Unit = {
    // tmp side dirs ("<table>__tmp") from writeOver/merge/compact must
    // keep their table's options — the dir is renamed in wholesale
    val base = path.stripSuffix("/").stripSuffix("__tmp")
    val dwp = base.endsWith("/" + IndexSettings.T.DocWordPositions)
    val pair = base.endsWith("/" + IndexSettings.T.WordPairProximityDocids)
    val w = df.write.mode("overwrite")
      .option("parquet.block.size", RowGroupBytes.toString)
    (if (dwp || pair)
       w.option("parquet.page.row.count.limit", DwpPageRows.toString)
     else w).parquet(path)
    // the marker CONTENT records the page-row cap the files were written
    // under: the serving volume gate prices page-bounded decodes with it,
    // and the build-time value (env-overridable) need not match the
    // serve-time one. Empty/older markers fall back to the serve default.
    def mark(name: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path, name),
        DwpPageRows.toString.getBytes("UTF-8"))
    if (dwp) mark(DwpPageMarker)
    if (pair) mark(PairPageMarker)
  }

  /** Atomic-ish table replace: write to side dir then swap. */
  def writeOver(spark: SparkSession)(df: DataFrame, path: String): Unit = {
    val tmp = path + "__tmp"
    writeParquet(df, tmp)
    swapIn(tmp, path)
    invalidate(spark, path)
  }

  /** Drop any cached plan over `path` — an open handle's `.cache()` (e.g.
    * GraftIndex pins term_dict) would otherwise silently serve the
    * PRE-mutation data to every later read of the same path in this
    * session, including maintenance steps that chain table rewrites
    * (hardDelete recounts prefix_dict FROM the just-rewritten term_dict). */
  private def invalidate(spark: SparkSession, path: String): Unit =
    spark.catalog.refreshByPath(path)

  /** Table replace that can never leave the table missing: the live dir is
    * first renamed ASIDE (atomic, same filesystem), the tmp dir renamed in,
    * and only then is the old copy deleted. If the rename-in fails the old
    * dir is restored; every rename's result is checked, so a cross-device
    * tmp or an open-handle failure raises instead of silently dropping the
    * table. */
  def swapIn(tmp: String, path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      if (!f.delete() && f.exists())
        throw new java.io.IOException(s"swapIn: failed to delete ${f.getPath}")
    }
    val target = Paths.get(path)
    val old = Paths.get(path + "__old")
    if (Files.exists(old)) rec(old.toFile) // leftover from a crashed swap
    val hadLive = Files.exists(target)
    if (hadLive) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        if (hadLive) Files.move(old, target, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    if (hadLive) rec(old.toFile)
  }

  /** UTF-8 byte comparison — the order parquet binary stats and Spark's
    * UTF8String use (code-point order), so interval tests agree exactly
    * with the per-file footer stats. */
  def utf8Cmp(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Per-file `[min, max]` byte intervals of `keyCol` read from the
    * parquet FOOTERS — zero data IO, no Spark plan (a plan-based read can
    * be silently substituted by a cached InMemoryRelation whose
    * `input_file_name` is empty, and the stats must reflect the files on
    * DISK, not a handle's cache). None = no usable stats: treated as
    * touched (conservative). Truncated footer stats only widen intervals,
    * also conservative. Iceberg manifests carry the same intervals on a
    * lakehouse deployment. */
  def fileKeyIntervals(spark: SparkSession, path: String, keyCol: String)
      : Array[(String, Option[(Array[Byte], Array[Byte])])] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    files.map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        var lo: Array[Byte] = null
        var hi: Array[Byte] = null
        var ok = true
        reader.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == keyCol) match {
            case Some(cc) =>
              val st = cc.getStatistics
              if (st == null || !st.hasNonNullValue) ok = false
              else {
                val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                if (lo == null || utf8Cmp(mn, lo) < 0) lo = mn
                if (hi == null || utf8Cmp(mx, hi) > 0) hi = mx
              }
            case None => ok = false
          }
        }
        (f.getAbsolutePath,
          if (ok && lo != null) Some((lo, hi)) else None)
      } finally reader.close()
    }
  }

  /** Merge `deltaDf` into the key-sorted parquet table at `oldPath`
    * touching only the files whose `[min, max]` interval of `keyCol`
    * intersects the delta's key set — O(touched + delta) instead of
    * O(table) per batch. Untouched files carry over byte-for-byte into the
    * swapped-in directory. No-op when the delta has no keys. */
  def mergeTouchedFiles(spark: SparkSession,
      oldPath: String, deltaDf: DataFrame, keyCol: String)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    import spark.implicits._
    val keyB: Array[Array[Byte]] = deltaDf
      .select(col(keyCol).cast("string")).distinct().as[String].collect()
      .map(_.getBytes(UTF_8)).sortWith(utf8Cmp(_, _) < 0)
    if (keyB.isEmpty) return
    val stats = fileKeyIntervals(spark, oldPath, keyCol)
    def touched(iv: Option[(Array[Byte], Array[Byte])]): Boolean = iv match {
      case None => true // no stats: must assume the file holds delta keys
      case Some((loB, hiB)) =>
        // first delta key ≥ lo, then ≤ hi ⇒ the intervals intersect
        var a = 0; var b = keyB.length
        while (a < b) {
          val m = (a + b) >>> 1
          if (utf8Cmp(keyB(m), loB) < 0) a = m + 1 else b = m
        }
        a < keyB.length && utf8Cmp(keyB(a), hiB) <= 0
    }
    val (touchedF, keepF) = stats.partition(s => touched(s._2))
    val tmp = oldPath + "__tmp"
    val touchedDf =
      if (touchedF.isEmpty) spark.read.parquet(oldPath).limit(0)
      else spark.read.parquet(touchedF.map(_._1): _*)
    writeParquet(merge(touchedDf, deltaDf), tmp)
    // untouched files carry over byte-for-byte, so the fresh marker
    // writeParquet just wrote can misdescribe them two ways: (a) the old
    // dir had NO marker (pre-marker coarse pages spanning whole row
    // groups) — a marker appearing now would turn direct point reads ON
    // over those files, the exact regression the gate exists to prevent,
    // so drop it unless every old file was rewritten; (b) the old files
    // used a LARGER cap — keep the max so the volume gate never
    // under-prices them.
    Seq(DwpPageMarker, PairPageMarker).foreach { m =>
      val newF = new java.io.File(tmp, m)
      (readPageMarker(oldPath, m), readPageMarker(tmp, m)) match {
        case (None, Some(_)) if keepF.nonEmpty => newF.delete()
        case (Some(o), Some(n)) if o > n =>
          java.nio.file.Files.write(newF.toPath, o.toString.getBytes("UTF-8"))
        case _ => ()
      }
    }
    keepF.foreach { case (f, _) =>
      val src = java.nio.file.Paths.get(f)
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(tmp, src.getFileName.toString),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    swapIn(tmp, oldPath)
    invalidate(spark, oldPath)
  }

  /** File-level append for tables that only gain rows: move the delta's
    * parquet files into the live dir under unique names — zero Spark jobs,
    * O(batch) IO. Returns false (caller falls back to a reconciling union
    * rewrite) when the schemas differ. */
  def appendFiles(spark: SparkSession, oldPath: String, newPath: String): Boolean = {
    if (spark.read.parquet(oldPath).schema != spark.read.parquet(newPath).schema)
      return false
    val files = new java.io.File(newPath).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val stamp = java.lang.Long.toHexString(System.nanoTime())
    files.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(oldPath, s"inc-$stamp-${f.getName}"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // page-marker content = the page-row cap the dir's files were written
    // under; after mixing in delta files written under a LARGER cap the
    // live marker must record the max, or the serving volume gate would
    // under-price page-bounded decodes on the new files. readPageMarker
    // maps legacy EMPTY markers to their known 1024, so an old empty
    // marker still loses to a raised delta cap. An old dir with NO marker
    // stays unmarked (its own coarse files must keep direct reads off).
    Seq(DwpPageMarker, PairPageMarker).foreach { m =>
      (readPageMarker(oldPath, m), readPageMarker(newPath, m)) match {
        case (Some(o), Some(n)) if n > o =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(oldPath, m), n.toString.getBytes("UTF-8"))
        case _ => ()
      }
    }
    invalidate(spark, oldPath)
    true
  }
}
