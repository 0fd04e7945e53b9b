package graft.dv3f

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed, name-based upsert — the Spark equivalent of the reference's
  * `INSERT OR REPLACE INTO <t> BY NAME` (reference:
  * scripts/extract_load.py:233-240). Last-writer-wins on the key columns;
  * incoming columns are matched BY NAME, missing declared columns are
  * NULL-filled, extra columns are dropped.
  *
  * On plain parquet there is no MERGE, so the upsert is
  * anti-join(old, new, keys) ∪ new → rewrite. At 100 TB this rewrite is
  * the scaling hazard; mitigations built in:
  *   - the target is written partitioned (`partitionByCols`) so a real
  *     deployment can use dynamic partition overwrite and only rewrite
  *     partitions the batch touches;
  *   - the anti-join broadcasts the NEW side when it is small (the common
  *     ingest shape: small delta vs huge target), so no shuffle of the
  *     target occurs;
  *   - with a lakehouse table format this function is a one-line
  *     MERGE INTO — the API is format-agnostic on purpose.
  */
object Upsert {

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

  /** Upsert `incoming` into the parquet directory `targetPath` keyed on
    * `table.primaryKey`. Idempotent: re-running the same batch converges
    * (SURVEY.md §7.4.3). Stage-then-swap keeps the rewrite atomic enough
    * for a single writer: we write to a `_stage` dir and rename.
    */
  def upsertByName(spark: SparkSession, targetPath: String,
      incoming: DataFrame, table: StagingTable): Unit = {
    val aligned = alignByName(incoming, table)
    val key = table.primaryKey
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(targetPath), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(targetPath)

    val merged =
      if (!fs.exists(target)) aligned
      else {
        // Align the EXISTING side to the declared schema as well: when
        // the table declaration evolves (the reference's API adds an
        // indicator column some year), rows written under the old schema
        // read back NULL in the new column and dropped columns vanish —
        // the declared schema is the contract, for both sides.
        val existing = alignByName(spark.read.parquet(targetPath), table)
        // keep existing rows whose key is NOT in the batch, then add the
        // batch. broadcast(new side) => no shuffle of the big target.
        existing.join(broadcast(aligned.select(key)), Seq(key), "left_anti")
          .unionByName(aligned)
      }
    val stage = targetPath.stripSuffix("/") + "_stage"
    merged.write.mode(SaveMode.Overwrite).parquet(stage)
    // Swap via rename-aside (target -> _old, stage -> target, drop _old):
    // a crash mid-swap leaves the data at the live path or at _old —
    // never a window where the live path is simply missing, which the
    // delete-then-rename ordering had.
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "_old")
    fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(new org.apache.hadoop.fs.Path(stage), target)
    fs.delete(old, true)
  }

  /** Partitioned upsert — the 100 TB shape. The target is laid out
    * `partitionCol=.../part-*.parquet`; only the partitions PRESENT IN
    * THE BATCH are read (partition-pruned scan), merged (anti-join on
    * the key) and swapped in, dynamic-partition-overwrite style.
    * Untouched partitions are never read nor written — upsert cost
    * scales with the batch's partition footprint, not the table size.
    * (The unpartitioned variant above rewrites the whole table; fine for
    * small staging tables, not for a fact table.)
    *
    * The merge is written to a stage directory first and partition dirs
    * are swapped via rename — Spark (correctly) refuses plans that
    * overwrite a path they are still reading.
    */
  def upsertByNamePartitioned(spark: SparkSession, targetPath: String,
      incoming: DataFrame, table: StagingTable, partitionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val aligned = alignByName(incoming, table)
    val key = table.primaryKey
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(targetPath), spark.sparkContext.hadoopConfiguration)
    val target = new Path(targetPath)

    val merged =
      if (!fs.exists(target)) aligned
      else {
        val affected = aligned.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSeq
        // partition-pruned scan: the filter on the partition column means
        // only the affected partition directories are listed/read.
        // Re-align: partition-dir values come back type-INFERRED (e.g.
        // annee=2019 reads as int), so cast back to the declared schema.
        val existingAffected = alignByName(
          spark.read.parquet(targetPath)
            .filter(col(partitionCol).isin(affected: _*)), table)
        existingAffected
          .join(broadcast(aligned.select(key)), Seq(key), "left_anti")
          .unionByName(aligned)
      }
    val stage = new Path(targetPath.stripSuffix("/") + "_pstage")
    fs.delete(stage, true)
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(stage.toString)
    fs.mkdirs(target)
    // swap ONLY the partitions the batch touched
    val parts = Option(fs.listStatus(stage)).getOrElse(Array())
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    parts.foreach { p =>
      val dest = new Path(target, p.getPath.getName)
      fs.delete(dest, true)
      fs.rename(p.getPath, dest)
    }
    fs.delete(stage, true)
  }
}
