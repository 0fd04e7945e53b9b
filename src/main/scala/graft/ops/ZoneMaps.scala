package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (data-skipping index): a tiny per-file
  * (min, max, rows) stats table over chosen columns, collected with one
  * scan and persisted as a maintenance artifact, then used to plan
  * point/range scans that OPEN ONLY THE FILES whose [min,max] envelope
  * intersects the predicate — the Delta/Iceberg file-skipping idea,
  * expressed over plain parquet directories.
  *
  * Why not rely on parquet row-group statistics alone? Spark's reader
  * does push min/max filters into row-group selection, but it still
  * LISTS and OPENS every file (footer read per file per query). At
  * 100 TB a date-ranged query over a range-clustered table should touch
  * the ~0.1% of files that overlap the range; with the stats table the
  * driver prunes the file list BEFORE any footer I/O, turning a
  * 100k-file listing storm into a metadata lookup — the same reason
  * lakehouse formats carry stats in the commit log rather than only in
  * the data files.
  *
  * Correctness: pruning is sound for files the stats table covers
  * (envelope check is conservative); `prunedScan` re-applies the
  * predicate as a residual filter, so in-file false positives are
  * removed and the result equals the full-scan filter exactly — the
  * q_zonemap_scan oracle row pins that, and LayoutSpec pins that the
  * pruned plan's file count actually shrinks. Stats are keyed by file
  * path: appending new files without refreshing stats makes them
  * invisible to pruned reads (same contract as a lakehouse manifest —
  * collect() runs per commit, not per query).
  */
object ZoneMaps {

  /** One-scan stats collection: per input file, (path, rows, min, max)
    * for `column`. `_metadata.file_path` is constant-folded per split —
    * the group-by state is #files rows, never data-sized.
    */
  def collect(spark: SparkSession, path: String, column: String): DataFrame =
    spark.read.parquet(path)
      .select(col(column), col("_metadata.file_path").as("file_path"))
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("rows"),
        min(col(column)).as("min_v"),
        max(col(column)).as("max_v"))

  /** One-scan stats for SEVERAL columns: (file_path, rows, min_<c>,
    * max_<c> per column). Collecting per-column would re-scan the table
    * once per column; a commit-path stats refresh wants one pass.
    */
  def collectMany(spark: SparkSession, path: String,
      columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "collectMany needs at least one column")
    spark.read.parquet(path)
      .select((columns.map(col) :+ col("_metadata.file_path").as("file_path")): _*)
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("rows"),
        columns.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
  }

  /** Files whose envelope intersects [lo, hi] (inclusive). The stats
    * relation is #files-sized — collecting it to the driver is the
    * metadata lookup, not a data collect.
    */
  def candidateFiles(stats: DataFrame, lo: Any, hi: Any): Seq[String] =
    stats.filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select("file_path").collect().map(_.getString(0)).toSeq

  /** Range scan through the zone maps: prune the file list, read only
    * survivors, re-apply the residual predicate. Returns an empty
    * relation (correct schema) when no file overlaps.
    */
  def prunedScan(spark: SparkSession, path: String, stats: DataFrame,
      column: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(stats, lo, hi)
    val all = spark.read.parquet(path)
    val src = if (files.isEmpty) all.limit(0)
              else spark.read.schema(all.schema).parquet(files: _*)
    src.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
