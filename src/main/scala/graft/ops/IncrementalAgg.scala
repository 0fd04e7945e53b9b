package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregate maintenance: keep a small per-key state table
  * of MERGEABLE partials (count / exact-decimal sum / min / max) and
  * fold delta batches into it, so a dashboard aggregate over a 100 TB
  * fact table is served by merging yesterday's state with today's
  * GB-scale delta instead of rescanning history. The reference recomputes
  * its dashboard aggregates from the full staging table on every run
  * (`evidence-workspace/pages/index.md:16-97`); this is the
  * incremental-view-maintenance upgrade of that surface.
  *
  * Algebra: state rows are (keys, cnt, sum, min, max) per measure.
  *   - `partial(batch)` map-side-combines a batch into state shape;
  *   - `merge(a, b)` unions state tables and re-combines (cnt/sum add,
  *     min/max fold) — associative and commutative, so batches can land
  *     in any order and partials can themselves be pre-merged;
  *   - `merge(partial(b1), partial(b2), ...)` ≡ `partial(b1 ∪ b2 ∪ ...)`
  *     exactly, because sums run in DECIMAL(18,2): decimal addition is
  *     associative (no float re-ordering drift), so the maintained state
  *     hash-matches a from-scratch recompute — IncrementalAggSpec and
  *     the q_incr_agg oracle row both pin this.
  *
  * Retractions: `partialSigned` accepts a ±1 multiplicity column and
  * maintains cnt/sum under deletes (cnt = Σmult, sum = Σ x·mult) —
  * min/max are deliberately absent from the signed face (they are not
  * retractable without per-key value multisets; a delete-heavy pipeline
  * recomputes those from the survivor table instead).
  *
  * Scale: state cardinality is the GROUP BY key space, not the fact
  * row count — partial() is one map-side-combined shuffle over the
  * delta only, and merge() shuffles only two state tables.
  */
object IncrementalAgg {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Collapse one batch to state shape: (keys, n, sum_, min_, max_). */
  def partial(batch: DataFrame, keys: Seq[String], measure: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col(measure))).as("sum_"),
        min(col(measure)).as("min_"),
        max(col(measure)).as("max_"))

  /** Merge any number of state tables into one. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_")).as("sum_"),
        min(col("min_")).as("min_"),
        max(col("max_")).as("max_"))
  }

  /** Signed (retractable) partial: `multCol` is +1 for insert, -1 for
    * retraction. State is (keys, n, sum_).
    */
  def partialSigned(batch: DataFrame, keys: Seq[String], measure: String,
      multCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(sum(col(multCol).cast(LongType)).as("n"),
        sum(dec(col(measure)) * dec(col(multCol))).as("sum_"))

  /** Merge signed states; keys whose net count reaches zero vanish
    * (their state row would claim "0 rows" forever otherwise).
    */
  def mergeSigned(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeSigned needs at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_")).as("sum_"))
      .filter(col("n") =!= 0L)
  }

  // ------------------------------------------------ persisted state dir

  /** Persisted, EXACTLY-ONCE maintenance protocol. merge() itself is
    * NOT idempotent — folding the same delta twice double-counts — so
    * a maintained state table must never re-merge a replayed batch.
    * Instead of tracking applied-batch watermarks, the state dir holds
    * one partial per batch id (`batch=<id>/`): appendPartial OVERWRITES
    * its own batch dir, so an at-least-once delivery (retry, streaming
    * batch replay, backfill re-run) converges byte-identically, and
    * readState merges whatever partials exist. compactState folds the
    * accumulated partials into one (cost ∝ key space, run it on a
    * maintenance cadence) — reads between compactions pay a union of
    * #batches tiny tables, never a fact-table scan.
    */
  def appendPartial(batch: DataFrame, keys: Seq[String], measure: String,
      stateDir: String, batchId: Long): Unit =
    partial(batch, keys, measure)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"${stateDir.stripSuffix("/")}/batch=$batchId")

  /** Batch dirs that are NOT absorbed by a present compacted partial:
    * each compacted dir carries an `_absorbs` marker naming the dirs it
    * folded, and any named dir still on disk (a crash interrupted the
    * post-compaction deletes, or a replayed delivery recreated it) is
    * garbage whose content the absorber already holds — reading it too
    * would double-count. Chains are safe: if an absorber is itself
    * absorbed by a present dir, that dir transitively holds its content.
    */
  /** Dir names listed in `d`'s `_absorbs` marker (empty if none). */
  private def absorbsOf(fs: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path): List[String] = {
    val m = new org.apache.hadoop.fs.Path(d, "_absorbs")
    if (fs.exists(m)) {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    } else Nil
  }

  private def liveBatchPaths(fs: org.apache.hadoop.fs.FileSystem,
      dirs: Seq[org.apache.hadoop.fs.Path]): Seq[org.apache.hadoop.fs.Path] = {
    val absorbed = dirs.flatMap(absorbsOf(fs, _)).toSet
    dirs.filterNot(d => absorbed(d.getName))
  }

  private def batchDirs(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): (org.apache.hadoop.fs.FileSystem, Seq[org.apache.hadoop.fs.Path]) = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    (fs, dirs)
  }

  /** Current maintained aggregate: merge of every live batch partial
    * (absorbed-but-still-present dirs are skipped via their absorber's
    * `_absorbs` marker — see [[compactState]]).
    */
  def readState(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      keys: Seq[String]): DataFrame = {
    val (fs, dirs) = batchDirs(spark, stateDir)
    val live = liveBatchPaths(fs, dirs)
    require(live.nonEmpty, s"no batch partials under $stateDir")
    merge(live.map(p => spark.read.parquet(p.toString)), keys)
  }

  /** Fold all existing partials into a single one under `intoBatchId`
    * — a FRESH id no existing batch dir uses (enforced) — then drop the
    * absorbed dirs. Crash-durable at every point: the compacted partial
    * is staged outside the state dir, lands via one rename CARRYING an
    * `_absorbs` marker that names everything it folded, and only then
    * are the absorbed dirs deleted. A crash before the rename leaves
    * the originals; a crash mid-delete leaves the compacted partial
    * plus stragglers that readState skips via the marker — every crash
    * point reads to the same aggregate, no manual recovery. The marker
    * also hardens replay: an at-least-once delivery that recreates an
    * absorbed batch dir AFTER compaction is skipped, not double-counted.
    * Writers must still not append NEW batch ids concurrently with a
    * compaction that might fold a half-written partial — keep writes
    * and compaction on one maintenance cadence (the versioned Upsert is
    * the fully-concurrent alternative).
    */
  def compactState(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      keys: Seq[String], intoBatchId: Long): Unit = {
    val (fs, dirs) = batchDirs(spark, stateDir)
    require(!dirs.exists(_.getName == s"batch=$intoBatchId"),
      s"intoBatchId $intoBatchId collides with an existing batch dir")
    // An id named in any PRESENT dir's _absorbs marker is not fresh either:
    // compacting into a previously-absorbed id, then crashing mid-delete,
    // would leave two dirs each marking the other absorbed — liveBatchPaths
    // would see nothing live and readState would need manual recovery.
    require(!dirs.flatMap(absorbsOf(fs, _)).contains(s"batch=$intoBatchId"),
      s"intoBatchId $intoBatchId was previously absorbed by a compaction; " +
        "pick an id strictly greater than every id ever used")
    val folded = merge(
      liveBatchPaths(fs, dirs).map(p => spark.read.parquet(p.toString)), keys)
    val tmp = new org.apache.hadoop.fs.Path(s"${stateDir.stripSuffix("/")}.compact_tmp")
    folded.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp.toString)
    // the absorb intent rides INSIDE the compacted partial (underscore-
    // prefixed ⇒ invisible to parquet readers), so the rename below
    // publishes data + intent atomically
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_absorbs"), true)
    try out.write(dirs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename signals failure by RETURNING false on the HDFS-family API
    // (dest raced into existence, missing parent, cross-FS move) — deleting
    // the originals after a failed rename would be total state loss, so the
    // publish must be confirmed before any source dir is dropped
    val dest = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(stateDir), s"batch=$intoBatchId")
    require(fs.rename(tmp, dest),
      s"compaction publish failed: rename $tmp -> $dest returned false; " +
        "originals retained, compacted partial left at the tmp path")
    dirs.foreach(p => fs.delete(p, true))
    ()
  }
}
