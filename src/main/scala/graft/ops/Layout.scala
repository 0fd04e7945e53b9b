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
}
