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

  // ------------------------------------------------------------- IVF

  /** Deterministic IVF coarse quantizer: centroids = the embeddings of a
    * seeded id sample, refined with a few Lloyd iterations computed as
    * DataFrame aggregations. The mean update is `posexplode` →
    * `groupBy(cluster, dim).avg` — per-(cluster,dim) scalar partials with
    * map-side combine, so no executor or driver ever holds a cluster's
    * vectors (a `collect_list` of whole vectors per cluster would OOM at
    * web scale). `trainSampleMod > 1` trains on a deterministic 1/mod
    * hash-slice of the corpus — sampling is how IVF quantizers are trained
    * at billion-vector scale anyway. */
  def trainIvf(embeddings: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, iterations: Int = 3, seed: Long = 42L,
      trainSampleMod: Int = 1): Array[Array[Double]] = {
    val all = asDouble(embeddings, vecCol).select(col("__v"))
    val ds =
      if (trainSampleMod <= 1) all
      else all.where(pmod(xxhash64(col("__v").cast("string"), lit(seed)),
        lit(trainSampleMod)) === 0)
    var centroids: Array[Array[Double]] = ds
      .orderBy(abs(hash(col("__v").cast("string")) + lit(seed)))
      .limit(nLists)
      .collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iterations) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assign = udf((v: Seq[Double]) => Similarity.nearestCentroid(v.toArray, bc.value))
      val rows = ds.withColumn("c", assign(col("__v")))
        .select(col("c"), posexplode(col("__v")).as(Seq("d", "x")))
        .groupBy("c", "d").agg(avg("x").as("m"))
        .collect() // nLists × dims scalars — the only driver materialization
      val updated = rows.groupBy(_.getInt(0)).map { case (cidx, rs) =>
        val arr = new Array[Double](dims)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        cidx -> arr
      }
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Assign each vector to its IVF list (materialize once, reuse). */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val bc = spark.sparkContext.broadcast(centroids)
    val assign = udf((v: Seq[Double]) => Similarity.nearestCentroid(v.toArray, bc.value))
    asDouble(embeddings, vecCol)
      .select(col(idCol), col(vecCol), assign(col("__v")).as("list"))
  }

  /** IVF search: scan only the `nprobe` lists nearest the query. Exact
    * within the probed lists; recall grows with nprobe (nprobe = nLists →
    * exact). The probed-list filter pushes down to the parquet scan when
    * the assignment table is partitioned by `list`. */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], query: Array[Double], k: Int,
      nprobe: Int = 4): DataFrame = {
    val probed = centroids.zipWithIndex
      .sortBy { case (c, _) => -cosine(c, query) }
      .take(nprobe).map(_._2)
    val bq = spark.sparkContext.broadcast(query)
    val cos = udf((v: Seq[Double]) => cosine(v.toArray.map(_.toDouble), bq.value))
    assigned.where(col("list").isin(probed.map(Integer.valueOf): _*))
      .withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .select(col(idCol), cos(col("__v")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
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

object Similarity extends Serializable {
  def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var d = 0.0; var j = 0
      while (j < v.length) { val x = v(j) - c(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

}
