package graft.dv3f

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed, name-based upsert — the Spark equivalent of the reference's
  * `INSERT OR REPLACE INTO <t> BY NAME` (reference:
  * scripts/extract_load.py:233-240). Last-writer-wins on the key columns;
  * incoming columns are matched BY NAME, missing declared columns are
  * NULL-filled, extra columns are dropped.
  *
  * TRANSACTIONAL VISIBILITY. DuckDB gives the reference an atomic
  * INSERT OR REPLACE; plain parquet has no MERGE and no atomic rewrite,
  * so the table is a sequence of immutable SNAPSHOTS with a commit
  * pointer, a miniature of the lakehouse-format protocol:
  *
  *   targetPath/
  *     _v_1/ _v_2/ ...        immutable data dirs (one per commit)
  *     _commit_1 _commit_2    commit markers; the HIGHEST one is live
  *
  *   - a commit writes its data dir fully, then publishes it by
  *     RENAMING a temp file to `_commit_<n>` — rename is atomic and
  *     fails if the marker exists, so of two racing writers exactly one
  *     wins (the loser throws; single-writer-per-table is the intended
  *     deployment, as it was for the reference's DuckDB file);
  *   - readers resolve max(`_commit_*`) once and then only touch that
  *     snapshot's files: a concurrent commit cannot tear their view —
  *     they keep reading the superseded snapshot (snapshot isolation);
  *   - a crash before the marker rename leaves a dangling `_v_` dir
  *     that no reader resolves and the next vacuum removes: the live
  *     table is never in a half-written state;
  *   - `vacuum` (run on every upsert) keeps the snapshots referenced by
  *     the last `keepCommits` markers, so an in-flight reader has a
  *     full commit's grace before its files disappear — same contract
  *     as lakehouse VACUUM, with the same caveat for very slow readers.
  *
  * The `_v_`/`_commit_` prefixes keep the protocol invisible to a naive
  * `spark.read.parquet(targetPath)`: underscore-prefixed paths are
  * hidden from Spark's file listing, so pre-protocol FLAT layouts (data
  * files directly under targetPath) still read correctly and are
  * treated as the version-0 snapshot by the first versioned commit.
  *
  * At 100 TB the unpartitioned rewrite is the scaling hazard;
  * mitigations built in:
  *   - [[upsertByNamePartitioned]] rewrites only the partitions present
  *     in the batch (each commit's dir holds just those; the marker
  *     maps every partition to the commit that last wrote it);
  *   - the anti-join broadcasts the NEW side when it is small (the
  *     common ingest shape: small delta vs huge target), so no shuffle
  *     of the target occurs;
  *   - with a lakehouse table format this whole object is a one-line
  *     MERGE INTO — the API is format-agnostic on purpose.
  */
object Upsert {

  private val VPrefix = "_v_"
  private val CPrefix = "_commit_"
  /** Snapshots kept by vacuum (current + grace for in-flight readers). */
  val keepCommits = 2

  /** Align `df` to the declared schema by name: missing → typed NULL,
    * extra dropped, order fixed (the BY NAME half of INSERT OR REPLACE).
    */
  def alignByName(df: DataFrame, table: StagingTable): DataFrame = {
    val present = df.columns.toSet
    df.select(table.schema.fields.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) =
    (FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration), new Path(path))

  private def commitNumbers(fs: FileSystem, target: Path): Seq[Long] =
    if (!fs.exists(target)) Seq.empty
    else fs.listStatus(target).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(CPrefix)).map(_.drop(CPrefix.length).toLong)

  /** The live commit number, if the path uses the versioned protocol. */
  def currentCommit(fs: FileSystem, target: Path): Option[Long] =
    commitNumbers(fs, target).sorted.lastOption

  private def readMarker(fs: FileSystem, target: Path, n: Long): String = {
    val in = fs.open(new Path(target, s"$CPrefix$n"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Publish commit `n`: write the marker aside, rename into place.
    * The rename is the atomic commit point; it fails if `n` was already
    * committed (a racing writer won), and content is never visible
    * half-written.
    */
  private[dv3f] def publish(fs: FileSystem, target: Path, n: Long, content: String): Unit = {
    val tmp = new Path(target, s".commit_tmp_${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(target, s"$CPrefix$n"))) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit $n at $target lost a race with a concurrent writer")
    }
  }

  private def hasFlatData(fs: FileSystem, target: Path): Boolean =
    fs.exists(target) && fs.listStatus(target).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }

  /** Snapshot map for a versioned path: partition value → data dir
    * (single entry keyed "" when unpartitioned). Partition values map
    * to the commit that last wrote them; value 0 means the pre-protocol
    * flat layout at the root.
    */
  def currentSnapshot(spark: SparkSession, targetPath: String): Option[Map[String, String]] = {
    val (fs, target) = fsFor(spark, targetPath)
    currentCommit(fs, target).map { n =>
      val content = readMarker(fs, target, n)
      def dirOf(v: Long) =
        if (v == 0) targetPath else s"${targetPath.stripSuffix("/")}/$VPrefix$v"
      if (content.isEmpty) Map("" -> dirOf(n))
      else content.linesIterator.filter(_.contains("=")).map { line =>
        val Array(pv, v) = line.split("=", 2)
        pv -> dirOf(v.toLong)
      }.toMap
    }
  }

  /** Read the LIVE snapshot of an upsert-managed table. Resolves the
    * commit pointer once; the returned frame only ever touches that
    * snapshot's immutable files, so it stays consistent under
    * concurrent upserts. Falls back to a plain read for pre-protocol
    * flat layouts.
    */
  def read(spark: SparkSession, targetPath: String): DataFrame =
    currentSnapshot(spark, targetPath) match {
      case None => spark.read.parquet(targetPath) // flat/legacy layout
      case Some(snap) if snap.keySet == Set("") =>
        spark.read.parquet(snap(""))
      case Some(snap) =>
        // one branch per DISTINCT commit (bounded by vacuum), each a
        // partition-pruned scan of the partitions that commit still
        // owns. allowMissingColumns: an adopted pre-protocol root (or a
        // snapshot from before a schema evolution) may carry fewer
        // columns than newer commits — those read back as NULL, the
        // same contract alignByName gives the merge path.
        if (snap.isEmpty) throw new IllegalStateException(
          s"marker at $targetPath maps no partitions — empty or corrupt commit")
        val pcol = partitionColOf(spark, targetPath)
        snap.groupBy(_._2).map { case (dir, parts) =>
          spark.read.parquet(dir)
            .filter(col(pcol).isin(parts.keys.toSeq: _*))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
    }

  private def partitionColOf(spark: SparkSession, targetPath: String): String = {
    val (fs, target) = fsFor(spark, targetPath)
    val n = currentCommit(fs, target).get
    readMarker(fs, target, n).linesIterator
      .find(_.startsWith("#partitionCol:")) match {
      case Some(l) => l.stripPrefix("#partitionCol:")
      case None => throw new IllegalStateException(
        s"marker $n at $targetPath has no partition column header")
    }
  }

  private def nextCommit(fs: FileSystem, target: Path): Long = {
    val dirVersions =
      if (!fs.exists(target)) Seq.empty
      else fs.listStatus(target).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(VPrefix)).map(_.drop(VPrefix.length).toLong)
    ((commitNumbers(fs, target) ++ dirVersions) :+ 0L).max + 1
  }

  /** Drop snapshots no longer reachable from the last [[keepCommits]]
    * markers: their data dirs and markers are deleted; dirs referenced
    * by a retained marker survive even if written long ago (a partition
    * untouched for many commits still lives in its original dir).
    * Dangling dirs from crashed commits (no marker) are removed too.
    */
  private def vacuum(fs: FileSystem, target: Path): Unit = {
    val commits = commitNumbers(fs, target).sorted
    if (commits.isEmpty) return
    val keep = commits.takeRight(keepCommits)
    val referenced: Set[Long] = keep.flatMap { n =>
      val c = readMarker(fs, target, n)
      if (c.isEmpty) Seq(n)
      else c.linesIterator.filter(_.contains("="))
        .map(_.split("=", 2)(1).toLong).toSeq :+ n
    }.toSet
    commits.dropRight(keepCommits)
      .filterNot(referenced)
      .foreach(n => fs.delete(new Path(target, s"$CPrefix$n"), false))
    fs.listStatus(target).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(VPrefix)).map(_.drop(VPrefix.length).toLong)
      .filter(v => v < keep.last && !referenced(v))
      .foreach(v => fs.delete(new Path(target, s"$VPrefix$v"), true))
    // a writer that crashed between creating its .commit_tmp_ and the
    // rename leaks the temp file — collect them here (a LIVE writer's
    // temp can only vanish if two writers race, which the marker rename
    // already makes a hard error for the loser)
    fs.listStatus(target).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(".commit_tmp_"))
      .foreach(n => fs.delete(new Path(target, n), false))
  }

  /** Upsert `incoming` into the versioned table at `targetPath` keyed
    * on `table.primaryKey`. Idempotent: re-running the same batch
    * converges (SURVEY.md §7.4.3); each run is one atomic commit.
    */
  def upsertByName(spark: SparkSession, targetPath: String,
      incoming: DataFrame, table: StagingTable): Unit = {
    val aligned = alignByName(incoming, table)
    val key = table.primaryKey
    val (fs, target) = fsFor(spark, targetPath)

    val existing = currentSnapshot(spark, targetPath) match {
      case Some(snap) => Some(spark.read.parquet(snap.getOrElse("",
        throw new IllegalStateException(s"$targetPath was committed by the " +
          "PARTITIONED upsert; use upsertByNamePartitioned/read on it"))))
      case None if hasFlatData(fs, target) =>
        Some(spark.read.parquet(targetPath)) // adopt flat layout as v0
      case None => None
    }
    val merged = existing match {
      case None => aligned
      case Some(e) =>
        // Align the EXISTING side to the declared schema as well: when
        // the table declaration evolves (the reference's API adds an
        // indicator column some year), rows written under the old
        // schema read back NULL in the new column and dropped columns
        // vanish — the declared schema is the contract, for both sides.
        // broadcast(new side) => no shuffle of the big target.
        alignByName(e, table)
          .join(broadcast(aligned.select(key)), Seq(key), "left_anti")
          .unionByName(aligned)
    }
    val n = nextCommit(fs, target)
    merged.write.mode(SaveMode.Overwrite)
      .parquet(s"${targetPath.stripSuffix("/")}/$VPrefix$n")
    publish(fs, target, n, "")
    vacuum(fs, target)
  }

  /** Partitioned upsert — the 100 TB shape. Only the partitions PRESENT
    * IN THE BATCH are read (partition-pruned scan), merged (anti-join
    * on the key) and committed; the marker maps every partition to the
    * commit that last wrote it, so untouched partitions are never read
    * nor written — upsert cost scales with the batch's partition
    * footprint, not the table size. Readers resolve one marker and see
    * either the whole previous snapshot or the whole new one.
    */
  def upsertByNamePartitioned(spark: SparkSession, targetPath: String,
      incoming: DataFrame, table: StagingTable, partitionCol: String): Unit = {
    val aligned = alignByName(incoming, table)
    val key = table.primaryKey
    val (fs, target) = fsFor(spark, targetPath)

    // previous snapshot: marker map, or the flat layout's partition
    // dirs adopted as version 0
    val prev: Map[String, String] = currentSnapshot(spark, targetPath)
      .getOrElse {
        if (!fs.exists(target)) Map.empty
        else fs.listStatus(target).toSeq.map(_.getPath.getName)
          .filter(_.startsWith(s"$partitionCol="))
          .map(_.stripPrefix(s"$partitionCol=") -> targetPath).toMap
      }
    val affectedRaw = aligned.select(partitionCol).distinct().collect()
    // the marker maps partition VALUES to commits — a null value has no
    // stable directory name (Hive's __HIVE_DEFAULT_PARTITION__ is a
    // write-side artifact), so reject it loudly instead of NPE-ing or
    // silently mis-routing rows
    require(!affectedRaw.exists(_.isNullAt(0)),
      s"upsertByNamePartitioned: batch contains NULL in partition column " +
        s"'$partitionCol' — partition keys must be non-null")
    val affected = affectedRaw.map(_.get(0).toString).toSeq
    if (affected.isEmpty) return // empty batch: nothing to commit

    val existingAffected = prev.filter(kv => affected.contains(kv._1))
      .groupBy(_._2).map { case (dir, parts) =>
        // partition-pruned: only the affected partition dirs are read.
        // Re-align: partition-dir values come back type-INFERRED (e.g.
        // annee=2019 reads as int), so cast back to the declared schema.
        alignByName(spark.read.parquet(dir)
          .filter(col(partitionCol).isin(parts.keys.toSeq: _*)), table)
      }.reduceOption(_ unionByName _)

    val merged = existingAffected match {
      case None => aligned
      case Some(e) =>
        e.join(broadcast(aligned.select(key)), Seq(key), "left_anti")
          .unionByName(aligned)
    }
    val n = nextCommit(fs, target)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
      .parquet(s"${targetPath.stripSuffix("/")}/$VPrefix$n")

    // commit-to-dir versions: prior owners keep theirs, affected move to n
    val prevVersions = prev.map { case (pv, dir) =>
      pv -> (if (dir == targetPath) 0L
        else dir.substring(dir.lastIndexOf(VPrefix) + VPrefix.length).toLong)
    }
    val newMap = prevVersions ++ affected.map(_ -> n)
    val content = s"#partitionCol:$partitionCol\n" +
      newMap.toSeq.sortBy(_._1).map { case (pv, v) => s"$pv=$v" }.mkString("\n")
    publish(fs, target, n, content)
    vacuum(fs, target)
  }
}
