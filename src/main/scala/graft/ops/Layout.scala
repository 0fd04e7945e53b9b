package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side data layout — at 100 TB, HOW a table is written decides
  * what every later read costs:
  *
  *  - **Hive partitioning** (`partitionBy` directories) turns equality /
  *    range predicates on the partition column into directory pruning —
  *    the scan never opens non-matching files.
  *  - **Range-clustered files** (repartitionByRange + sortWithinPartitions)
  *    give each parquet file a tight min/max on the cluster column, so
  *    row-group / file skipping works for range predicates on
  *    high-cardinality columns where directory partitioning would
  *    explode into millions of dirs.
  *  - **Compaction** rewrites a directory of accumulated small files
  *    (streaming sinks, per-partition upserts) into target-sized files —
  *    small files are the classic scan-parallelism killer: task-per-file
  *    scheduling overhead dominates below ~10 MB.
  *
  * All three are plain DataFrame writes — no custom committer. They are
  * deliberately one-shot batch ops: idempotent rewrite into a fresh
  * directory, then swap, matching dv3f.Upsert's stage-then-swap story.
  */
object Layout {

  /** Write `df` Hive-partitioned by `partitionCol`. Reads with an
    * equality/IN/range filter on that column prune directories at
    * planning time (PartitionFilters in the scan, not a data filter).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Write `df` as `nFiles` range-clustered files sorted by `cluster`:
    * file k holds a contiguous, non-overlapping slice of the cluster
    * column's order, so parquet min/max statistics skip whole files for
    * range predicates. (The same layout is what makes a later merge
    * join / bucketed read cheap.)
    */
  def writeRangeClustered(df: DataFrame, path: String, cluster: Column,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, cluster)
      .sortWithinPartitions(cluster)
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) interleave of two pre-bucketed non-negative int
    * columns: bit i of `a` lands at output bit 2i, bit i of `b` at
    * 2i+1. Pure built-in bit ops (shift/and/or fold), so the whole
    * z-value stays in whole-stage codegen.
    */
  def zInterleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Equi-width bucket of a numeric column into [0, 2^bits): one global
    * min/max lookup, then a map-only projection. Production z-ordering
    * would use sampled quantile boundaries against skew (same swap as
    * repartitionByRange's sampler); equi-width keeps the op
    * deterministic for the oracle-style tests.
    */
  def equiWidthBucket(df: DataFrame, c: Column, bits: Int): Column = {
    val Array(lo, hi) = df.agg(min(c).cast("double"), max(c).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val n = (1L << bits) - 1
    if (hi == lo) lit(0L)
    else least(floor((c.cast("double") - lit(lo)) / lit(hi - lo) * (n + 1)), lit(n))
      .cast("long")
  }

  /** Write `df` as `nFiles` files clustered by the Z-order curve over
    * TWO columns. Range clustering on one column gives that column
    * tight per-file min/max but leaves every other column full-range in
    * every file; the Z-curve spends the bits evenly, so BOTH columns
    * get ~sqrt-factor-tighter per-file ranges and predicates on either
    * one (or both) skip most files. This is the multi-dimensional
    * locality trade Delta/Iceberg expose as OPTIMIZE ZORDER, expressed
    * as a plain repartitionByRange on the interleaved value.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      nFiles: Int, bits: Int = 12): Unit = {
    val z = zInterleave(equiWidthBucket(df, a, bits),
      equiWidthBucket(df, b, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Rewrite a parquet directory into ~`targetBytes`-sized files.
    * Returns (filesBefore, filesAfter). Uses the directory's on-disk
    * size to pick the file count — coalesce (no shuffle) since
    * compaction only merges, never redistributes.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hadoopPath).filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(_.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles)
  }

  /** EXACT quantile boundaries of a numeric column — the range-partition
    * planning primitive (`repartitionByRange` samples and is
    * nondeterministic across runs; a reproducible 100 TB layout wants
    * pinned boundaries). Returns one row per requested probability:
    * (p, boundary) where boundary is the smallest value v with
    * |{x : x ≤ v}| ≥ ⌈p·n⌉ — percentile_disc semantics, integer-exact.
    *
    * Scale shape — NO global sort and NO wide shuffle (a near-unique
    * numeric column would make even a (value, count) distribution as
    * big as the data): values are equi-width bucketed into ≤256 coarse
    * shards off one min/max lookup, per-shard COUNTS (256 rows,
    * map-side combined) are walked on the DRIVER to find each target
    * rank's owning shard, and only those ≤|probs| shards — ~0.4% of
    * rows — are re-scanned into a per-value cumulative window (local
    * ranks lifted to global by the driver prefix sum, the two-pass
    * rank of Curation.shuffleBatches restricted to shards that
    * matter). Cost: three narrow column scans + a window over a
    * 1/256-sized slice; the only exchanges carry ≤256 and ≤|slice|
    * rows.
    */
  def rangeBoundaries(df: DataFrame, column: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val vals = df.select(col(column).as("v")).filter(col("v").isNotNull)
    val bucket = equiWidthBucket(vals, col("v"), bits = 8)
    val sharded = vals.withColumn("shard", bucket)
    val shardTotals = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("sub")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val n = shardTotals.map(_._2).sum
    if (n == 0) {
      // empty or all-NULL column: no boundaries exist — return an empty
      // (p, boundary) frame instead of crashing on cumTotals.last
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("boundary",
            df.schema(column).dataType))))
    }
    // per-target owning shard, resolved on the DRIVER over the 256-row
    // subtotal table: the expensive part (a cumulative walk of every
    // distinct value) collapses to a window over ONLY the ~|probs|
    // shards that contain a boundary — at 100 TB that is <2% of the
    // distribution instead of all of it
    val cumTotals = shardTotals.scanLeft((0L, 0L)) {
      case ((_, acc), (s, c)) => (s, acc + c)
    }.drop(1) // (shard, cumulative-through-shard)
    val offsets = shardTotals.map(_._1)
      .zip(0L +: cumTotals.map(_._2).dropRight(1)) // (shard, count-before)
    val targets = probs.map(p => p -> math.ceil(p * n).toLong)
    val wantedShards = targets.map { case (_, t) =>
      cumTotals.find(_._2 >= t).map(_._1)
        .getOrElse(cumTotals.last._1)
    }.toSet
    val offsetDf = spark.createDataFrame(
      offsets.filter(o => wantedShards(o._1)).toSeq).toDF("shard", "offset")
    val wShard = Window.partitionBy(col("shard")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sharded.filter(col("shard").isin(wantedShards.toSeq: _*))
      .groupBy(col("shard"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("local", sum(col("cnt")).over(wShard))
      .join(broadcast(offsetDf), "shard")
      .select(col("v"), (col("offset") + col("local")).as("cum"))
    val probsDf = spark.createDataFrame(probs.map(Tuple1(_))).toDF("p")
    probsDf.join(cum, col("cum") >= ceil(col("p") * n))
      .groupBy(col("p")).agg(min(col("v")).as("boundary"))
  }
}
