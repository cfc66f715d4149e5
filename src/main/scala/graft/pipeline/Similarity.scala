package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine is the exact baseline (one scan + TakeOrdered);
  * random-hyperplane LSH buckets are the scale path: bucket once (cheap,
  * deterministic), then brute-force only inside the query's bucket ring.
  * Hyperplane components are md5-derived ±1 — reproducible everywhere,
  * no RNG state to ship.
  */
class Similarity(spark: SparkSession, numPlanes: Int = 16, dims: Int = 64) extends Serializable {
  import spark.implicits._

  val planes: Array[Array[Double]] = {
    Array.tabulate(numPlanes, dims) { (j, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
      if ((java.lang.Long.parseLong(hex.take(15), 16) & 1L) == 1L) 1.0 else -1.0
    }
  }

  @inline private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  def bucketOf(v: Array[Double]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      var s = 0.0; var d = 0; while (d < v.length) { s += v(d) * planes(j)(d); d += 1 }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  private def asDouble(df: DataFrame, vecCol: String) =
    df.withColumn("__v", transform(col(vecCol), x => x.cast("double")))

  /** Exact top-k by cosine: one scan, partial top-k per partition
    * (TakeOrderedAndProject). */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val bq = spark.sparkContext.broadcast(query)
    val cos = udf((v: Seq[Double]) => cosine(v.toArray, bq.value))
    asDouble(embeddings, vecCol)
      .select(col(idCol), cos(col("__v")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Assign every vector its LSH bucket (materialize once, reuse per query). */
  def bucketize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val bf = udf((v: Seq[Double]) => bucketOf(v.toArray))
    asDouble(embeddings, vecCol)
      .select(col(idCol), col(vecCol), bf(col("__v")).as("bucket"))
  }

  /** Approximate top-k: score only vectors whose bucket is within
    * `maxHamming` sign-bits of the query's bucket (bucket ring probe).
    * maxHamming = numPlanes degrades to exact brute force. */
  def annTopK(bucketized: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, maxHamming: Int = 2): DataFrame = {
    val qb = bucketOf(query)
    val bq = spark.sparkContext.broadcast(query)
    val cos = udf((v: Seq[Double]) => cosine(v.toArray.map(_.toDouble), bq.value))
    bucketized
      .where(bit_count(col("bucket").bitwiseXOR(lit(qb))) <= maxHamming)
      .withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .select(col(idCol), cos(col("__v")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }
}
