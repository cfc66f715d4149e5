package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{GraftFunctions => F}

/** Value-level incremental facet level-tree maintenance — the Spark
  * set-based re-expression of the reference's `FacetsUpdateIncremental`
  * (`/root/reference/milli/src/update/facet/incremental.rs`). The reference
  * walks LMDB per inserted value (union into the containing group at every
  * level, split groups over `max_group_size`, lower the leftmost bound for
  * new minima); a parquet engine can't point-write, so each level instead
  * merges its whole batch DELTA in one distributed pass:
  *
  *  1. level 0: full-outer join on (field, bound) — existing values union
  *     their bitmaps, new values insert rows;
  *  2. every delta bound is assigned to its containing group per level
  *     (the greatest left_bound ≤ bound — `find_insertion_key_value`,
  *     incremental.rs:107-154) with a two-pass range-partition + sorted
  *     merge scan (no window, no driver-side group enumeration: the same
  *     prefix-carry trick as docid assignment), bounds below the field
  *     minimum lowering the leftmost group's bound;
  *  3. touched groups union the assigned delta docids (distributed — group
  *     bitmaps never reach the driver) and `group_size` counts newly
  *     inserted child keys;
  *  4. groups exceeding [[MaxGroupSize]] split in half by child bound
  *     (incremental.rs:281-347): split METADATA (bounds, counts) is
  *     driver-side — bounded by the batch — while the two halves' bitmaps
  *     aggregate distributed from the already-merged level below; the new
  *     key feeds the next level's size increments;
  *  5. a field whose TOP level reaches GroupSize·MinLevelSize groups needs
  *     a new level — that (rare, amortized-logarithmic) case falls back to
  *     the bulk field rebuild, as do fields whose delta exceeds
  *     [[boundCap]] or 1/50 of their size (the reference's own
  *     bulk-vs-incremental criterion, update/facet/mod.rs:137).
  *
  * The merged tree's SHAPE can drift from a bulk build (groups of 4..8,
  * exactly like the reference's incremental trees differ from its bulk
  * ones); the reader only relies on the interval invariant — a parent's
  * bitmap equals the union of the level-0 values in [left, nextLeft) —
  * which FacetIncrementalSpec pins together with range-query parity.
  */
object FacetIncremental {

  final val GroupSize = 4
  final val MinLevelSize = 5
  /** incremental split threshold (reference default max_group_size). */
  final val MaxGroupSize = 8

  /** Result: merged rows (untouched fields carried over + incrementally
    * merged fields) and the fields the caller must bulk-rebuild instead. */
  final case class Merged(rows: DataFrame, rebuildFields: Seq[String])

  /** code-point / numeric order — matches the builder's UTF-8 sort. */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) =>
      var i = 0; var j = 0
      while (i < x.length && j < y.length) {
        val ca = x.codePointAt(i); val cb = y.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(x.length - i, y.length - j)
    case _ => throw new IllegalArgumentException(s"unorderable bound: $a")
  }

  /** Merge the value-grain delta (field, bound, docid) into the current
    * level table rows. Fields whose delta is too large (≥ 1/50 of the
    * field per the reference criterion, or > boundCap distinct bounds),
    * fields new to the table, and fields whose top level must grow are
    * returned in `rebuildFields` (bulk path). */
  def merge(spark: SparkSession, old: DataFrame, deltaBase: DataFrame,
      boundCap: Int = 4096): Merged = {
    import spark.implicits._

    val delta0 = deltaBase.groupBy(col("field"), col("bound"))
      .agg(F.bitmap_or_agg(col("docid")).as("ddocids"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oldKeys = old.select(col("field"), col("level"), col("bound"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deltaCounts: Map[String, Long] = delta0.groupBy(col("field")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oldStats: Map[String, (Int, Long)] = oldKeys.groupBy(col("field"))
        .agg(max(col("level")).as("m"),
          sum(when(col("level") === 0, 1).otherwise(0)).as("n0"))
        .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap

      // the reference's bulk-vs-incremental criterion (mod.rs:137) + a hard
      // driver cap on the per-field delta-bound metadata we orchestrate
      val rebuild0 = deltaCounts.collect {
        case (f, c) if !oldStats.contains(f) => f
        case (f, c) if c > boundCap => f
        case (f, c) if c >= math.max(1L, oldStats(f)._2 / 50) => f
      }.toSeq.distinct.sorted
      val incFields = deltaCounts.keys.filterNot(rebuild0.contains).toSeq.sorted
      val untouched = old.where(!col("field").isin((incFields ++ rebuild0): _*))
      if (incFields.isEmpty) return Merged(untouched, rebuild0)

      val dInc = delta0.where(col("field").isin(incFields: _*))
      val old0 = old.where(col("level") === 0 && col("field").isin(incFields: _*))

      // new level-0 keys → their level-1 group's size increments
      val insertedL0: Map[String, Seq[Any]] = dInc
        .join(old0.select(col("field"), col("bound")), Seq("field", "bound"), "left_anti")
        .select(col("field"), col("bound")).collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.get(1)).toSeq).toMap

      // ---- level 0: distributed full-outer union merge
      val merged0 = old0.select(col("field"), col("bound"), col("docids"))
        .join(dInc, Seq("field", "bound"), "full_outer")
        .select(col("field"), col("bound"),
          when(col("docids").isNull, col("ddocids"))
            .when(col("ddocids").isNull, col("docids"))
            .otherwise(F.bitmap_or(col("docids"), col("ddocids"))).as("docids"),
          lit(0).as("level"), lit(1).as("group_size"))

      // per-field delta bound metadata (bounded by boundCap per field)
      val deltaBounds: Map[String, Seq[Any]] = dInc.select(col("field"), col("bound"))
        .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.get(1)).toSeq).toMap

      var outLevels: Vector[DataFrame] = Vector(merged0)
      var mergedPrev: DataFrame =
        merged0.persist(StorageLevel.MEMORY_AND_DISK)
      // keys newly created at the level BELOW the one being processed
      // (level 0 inserts, then split second-halves)
      var insertedBelow: Map[String, Seq[Any]] = insertedL0
      val maxAll = incFields.map(f => oldStats(f)._1).max

      for (level <- 1 to maxAll) {
        val fs = incFields.filter(f => oldStats(f)._1 >= level)
        if (fs.nonEmpty) {
          val rowsN = old.where(col("level") === level && col("field").isin(fs: _*))
            .persist(StorageLevel.MEMORY_AND_DISK)
          rowsN.count()
          // assignment input: delta bounds (docids ride up) + new child keys
          val assignKeys: Seq[(String, Any)] =
            fs.flatMap(f => (deltaBounds.getOrElse(f, Nil) ++
              insertedBelow.getOrElse(f, Nil)).distinct.map(b => (f, b)))
          val assigned: Map[(String, Any), Any] =
            assignGroups(spark, rowsN.select(col("field"), col("bound")), assignKeys)
          // min group per field (bounds below it lower its left bound)
          val minGroup: Map[String, Any] = rowsN.groupBy(col("field"))
            .agg(min(col("bound"))).collect()
            .map(r => r.getString(0) -> r.get(1)).toMap
          def groupOf(f: String, b: Any): Any =
            assigned.getOrElse((f, b), minGroup(f))

          // per-group metadata: size increments + lowered left bound
          val sizeInc = scala.collection.mutable.HashMap.empty[(String, Any), Int]
          insertedBelow.foreach { case (f, bs) =>
            bs.foreach { b =>
              val g = groupOf(f, b)
              sizeInc((f, g)) = sizeInc.getOrElse((f, g), 0) + 1
            }
          }
          val newLeft = scala.collection.mutable.HashMap.empty[(String, Any), Any]
          deltaBounds.view.filterKeys(fs.contains).foreach { case (f, bs) =>
            bs.foreach { b =>
              if (minGroup.contains(f) && cmpAny(b, minGroup(f)) < 0) {
                val g = minGroup(f)
                val cur = newLeft.getOrElse((f, g), g)
                if (cmpAny(b, cur) < 0) newLeft((f, g)) = b
              }
            }
          }

          // per-group delta docids, distributed (assignment map is small)
          val assignRows: Seq[(String, Any, Any)] = fs.flatMap { f =>
            deltaBounds.getOrElse(f, Nil).map(b => (f, b, groupOf(f, b)))
          }
          val gdelta =
            if (assignRows.isEmpty) null
            else {
              val schema = org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("field",
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("bound",
                  rowsN.schema("bound").dataType),
                org.apache.spark.sql.types.StructField("gbound",
                  rowsN.schema("bound").dataType)))
              val adf = spark.createDataFrame(
                spark.sparkContext.parallelize(assignRows.map(t =>
                  org.apache.spark.sql.Row(t._1, t._2, t._3)), 1), schema)
              dInc.join(broadcast(adf), Seq("field", "bound"))
                .groupBy(col("field"), col("gbound"))
                .agg(F.bitmap_union_agg(col("ddocids")).as("gdocids"))
            }
          // per-group size/bound metadata as a small broadcast frame
          val metaKeys = (sizeInc.keys ++ newLeft.keys).toSeq.distinct
          val metaDf =
            if (metaKeys.isEmpty) null
            else {
              val schema = org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("field",
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("gbound",
                  rowsN.schema("bound").dataType),
                org.apache.spark.sql.types.StructField("size_inc",
                  org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("new_left",
                  rowsN.schema("bound").dataType)))
              spark.createDataFrame(
                spark.sparkContext.parallelize(metaKeys.map { case (f, g) =>
                  org.apache.spark.sql.Row(f, g,
                    Integer.valueOf(sizeInc.getOrElse((f, g), 0)),
                    newLeft.get((f, g)).orNull)
                }, 1), schema)
            }

          var mergedN = rowsN
          if (gdelta != null)
            mergedN = mergedN
              .join(gdelta.withColumnRenamed("gbound", "bound"),
                Seq("field", "bound"), "left")
              .withColumn("docids",
                when(col("gdocids").isNull, col("docids"))
                  .otherwise(F.bitmap_or(col("docids"), col("gdocids"))))
              .drop("gdocids")
          if (metaDf != null)
            mergedN = mergedN
              .join(broadcast(metaDf.withColumnRenamed("gbound", "bound")),
                Seq("field", "bound"), "left")
              .withColumn("group_size",
                col("group_size") + coalesce(col("size_inc"), lit(0)))
              .withColumn("bound", coalesce(col("new_left"), col("bound")))
              .drop("size_inc", "new_left")
          mergedN = mergedN
            .select(col("field"), col("bound"), col("docids"),
              lit(level).as("level"), col("group_size"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          mergedN.count()

          // ---- splits: groups over MaxGroupSize halve by child bound
          // (candidates ⊆ size-incremented groups — bounded metadata)
          val overKeys: Seq[(String, Any)] = sizeInc.keys.toSeq
          val splitMeta: Seq[(String, Any, Int)] =
            if (overKeys.isEmpty) Nil
            else mergedN
              .where(col("group_size") > MaxGroupSize)
              .select(col("field"), col("bound"), col("group_size"))
              .collect().map(r => (r.getString(0), r.get(1), r.getInt(2))).toSeq
          val newKeys = Vector.newBuilder[(String, Any)]
          splitMeta.foreach { case (f, left0, _) =>
            // interval end = next group bound at this level (+∞ for last)
            val endRow = mergedN.where(col("field") === f && col("bound") > lit(left0))
              .agg(min(col("bound"))).collect()(0)
            val end: Option[Any] = if (endRow.isNullAt(0)) None else Some(endRow.get(0))
            // children keys (metadata only, ≤ 2·MaxGroupSize)
            val bandPred = end.fold(col("bound") >= lit(left0))(e =>
              col("bound") >= lit(left0) && col("bound") < lit(e))
            val childBounds = mergedPrev.where(col("field") === f && bandPred)
              .select(col("bound")).collect().map(_.get(0))
              .sortWith(cmpAny(_, _) < 0).toSeq
            if (childBounds.length > MaxGroupSize) {
              val mid = childBounds(childBounds.length / 2)
              // two halves, bitmaps aggregated distributed from level below
              val halves = mergedPrev.where(col("field") === f && bandPred)
                .withColumn("half__", when(col("bound") < lit(mid), 0).otherwise(1))
                .groupBy(col("half__"))
                .agg(F.bitmap_union_agg(col("docids")).as("docids"),
                  count(lit(1)).cast("int").as("group_size"))
                .select(lit(f).as("field"),
                  when(col("half__") === 0, lit(left0)).otherwise(lit(mid)).as("bound"),
                  col("docids"), lit(level).as("level"), col("group_size"))
              mergedN = mergedN
                .where(!(col("field") === f && col("bound") === lit(left0)))
                .unionByName(halves)
              newKeys += ((f, mid))
            }
          }
          if (splitMeta.nonEmpty) {
            mergedN = mergedN.persist(StorageLevel.MEMORY_AND_DISK)
            mergedN.count()
          }
          insertedBelow = newKeys.result().groupBy(_._1)
            .view.mapValues(_.map(_._2).toSeq).toMap
          outLevels :+= mergedN
          mergedPrev = mergedN
          rowsN.unpersist(false)
        } else insertedBelow = Map.empty
      }

      // ---- top-level growth: a field whose top level reached
      // GroupSize·MinLevelSize groups needs a level above — rare
      // (amortized logarithmic), handled by the bulk rebuild path
      val grew: Seq[String] = {
        val tops = incFields.map(f => (f, oldStats(f)._1))
        val merged = outLevels.reduce(_ unionByName _)
        tops.filter { case (f, m) =>
          merged.where(col("field") === f && col("level") === m).count() >=
            GroupSize.toLong * MinLevelSize
        }.map(_._1)
      }
      val keptRows = outLevels.reduce(_ unionByName _)
        .where(!col("field").isin(grew: _*))
      Merged(untouched.unionByName(keptRows), (rebuild0 ++ grew).sorted)
    } finally {
      delta0.unpersist(false)
      oldKeys.unpersist(false)
    }
  }

  /** Greatest group bound ≤ key, per (field, key) — two-pass range-sorted
    * merge scan with per-partition prefix carry (the window-free pattern of
    * assignDocids): group and key rows interleave in one global
    * (field, bound, tag) order; pass 1 records each partition's last group
    * bound per field, pass 2 resolves keys against the running group bound
    * seeded by the carry. Keys below their field's minimum are ABSENT from
    * the result (caller assigns them to the min group). */
  private def assignGroups(spark: SparkSession, groupKeys: DataFrame,
      keys: Seq[(String, Any)]): Map[(String, Any), Any] = {
    if (keys.isEmpty) return Map.empty
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("field",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bound",
        groupKeys.schema("bound").dataType)))
    val keyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k =>
        org.apache.spark.sql.Row(k._1, k._2)), 1), schema)
    val u = groupKeys.select(col("field"), col("bound"), lit(0).as("tag"))
      .unionByName(keyDf.select(col("field"), col("bound"), lit(1).as("tag")))
    val sorted = u.repartitionByRange(col("field"), col("bound"), col("tag"))
      .sortWithinPartitions("field", "bound", "tag")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val lastG: Array[(Int, Map[String, Any])] =
        sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
          val m = scala.collection.mutable.HashMap.empty[String, Any]
          it.foreach(r => if (r.getInt(2) == 0) m(r.getString(0)) = r.get(1))
          Iterator.single((pi, m.toMap))
        }.collect()
      val nParts = lastG.map(_._1).foldLeft(-1)(math.max) + 1
      val carries = new Array[Map[String, Any]](nParts + 1)
      carries(0) = Map.empty
      val byPart = lastG.toMap
      (0 until nParts).foreach { p =>
        carries(p + 1) = carries(p) ++ byPart.getOrElse(p, Map.empty)
      }
      val bCarries = spark.sparkContext.broadcast(carries.toVector)
      sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
        val cur = scala.collection.mutable.HashMap.empty[String, Any]
        cur ++= bCarries.value(pi)
        it.flatMap { r =>
          val f = r.getString(0)
          if (r.getInt(2) == 0) { cur(f) = r.get(1); Iterator.empty }
          else cur.get(f).map(g => ((f, r.get(1)), g)).iterator
        }
      }.collect().toMap
    } finally sorted.unpersist(false)
  }
}
