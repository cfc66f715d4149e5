package graft.webgen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One Common-Crawl-style page (BASELINE.json input_hint shape). */
final case class WebPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic web corpus (FIXTURES.md §2): seeded zipfian
  * vocabulary + stop-word layer (hot-term skew), lognormal doc lengths,
  * html wrapper whose text extraction round-trips byte-identically.
  *
  * Every page is a pure function of (seed, i): `spark.range(n).map(gen)`
  * produces the identical corpus at any parallelism — the determinism the
  * north rule requires for N-vs-4N runs.
  */
object WebPages {

  final val Seed = 42L
  final val VocabSize = 50000
  final val ZipfS = 1.07

  /** Cumulative zipf distribution, built once and broadcast. */
  private def zipfCdf(): Array[Double] = {
    val w = new Array[Double](VocabSize)
    var sum = 0.0
    var k = 0
    while (k < VocabSize) { w(k) = 1.0 / math.pow(k + 1, ZipfS); sum += w(k); k += 1 }
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    k = 0
    while (k < VocabSize) { acc += w(k) / sum; cdf(k) = acc; k += 1 }
    cdf(VocabSize - 1) = 1.0
    cdf
  }

  private val StopWords = Array("the", "of", "and", "to", "in", "a", "is",
    "that", "for", "it", "as", "was", "with", "be", "by")

  /** Strip tags + collapse whitespace — the extraction invariant:
    * `extractText(makeHtml(text)) == text` byte-identically. */
  def extractText(html: String): String = {
    val noTags = html.replaceAll("<[^>]*>", " ")
    noTags.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  def makeHtml(title: String, paras: Seq[String]): String =
    s"<html><head><title>$title</title></head><body>" +
      paras.map(p => s"<p>$p</p>").mkString + "</body></html>"

  /** Generate page i. Deterministic: a SplittableRandom seeded by (Seed, i). */
  def gen(i: Long, cdf: Array[Double]): WebPage = {
    val rng = new java.util.SplittableRandom(Seed ^ (i * 0x9e3779b97f4a7c15L))
    def zipfWord(): String = {
      val u = rng.nextDouble()
      var lo = 0; var hi = cdf.length - 1
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (cdf(mid) < u) lo = mid + 1 else hi = mid }
      "w" + lo
    }
    def word(): String =
      if (rng.nextDouble() < 0.35) StopWords(rng.nextInt(StopWords.length))
      else zipfWord()
    val len = math.max(8, math.exp(5.6 + 0.6 * rng.nextGaussian()) / 5.6).toInt.min(2000)
    val titleLen = 3 + rng.nextInt(6)
    val title = Seq.fill(titleLen)(word()).mkString(" ")
    val nParas = 1 + rng.nextInt(4)
    val body = Seq.fill(len)(word())
    val paras = body.grouped(math.max(1, len / nParas)).map(_.mkString(" ")).toSeq
    val html = makeHtml(title, paras)
    val text = extractText(html)
    val langs = Array("fr", "de", "es", "zh")
    val lang = if (rng.nextDouble() < 0.9) "en" else langs(rng.nextInt(4))
    WebPage(
      url = s"https://host-${i % 1000}.example/page-$i",
      warc_ts = new java.sql.Timestamp(1600000000000L + (i % 86400000L)),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = lang)
  }

  /** The corpus as a Dataset — docid = i (deterministic, dense). */
  def generate(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val cdf = zipfCdf()
    val bcdf = spark.sparkContext.broadcast(cdf)
    spark.range(n).map(i => gen(i, bcdf.value)).toDF()
      .withColumn("docid",
        org.apache.spark.sql.functions.expr("cast(substring_index(url, '-', -1) as int)"))
  }
}
