package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a batch of keyed I/U/D change rows
  * to a base relation with latest-wins semantics (the change with the
  * highest sequence number per key decides the row's fate).
  *
  * This is the MERGE INTO face the reference's keyed upsert lacks
  * (reference upserts are insert-or-replace only — `scripts/etl.py:13-70`
  * never deletes); a training-data warehouse needs deletes for takedown /
  * opt-out compliance sweeps, so the engine carries it as a first-class
  * operator.
  *
  * Semantics per key, over the UNION of change batches applied together:
  *   - take the change with the max `seqCol` (ties broken by `opCol`
  *     descending, so U beats I beats D at equal seq — deterministic,
  *     and a same-seq U+D pair resolves to the update, the conservative
  *     choice for data retention);
  *   - op D  → the key is absent from the result;
  *   - op I/U → the change row's payload replaces (or inserts) the row;
  *   - keys untouched by any change pass through from base unchanged.
  *
  * Folding batches one at a time (applyLatestWins per batch, in seq
  * order) equals applying their union in one call — CdcMergeSpec pins
  * this, so an hourly compaction of N micro-batches and a daily replay
  * of the whole change log produce byte-identical tables.
  *
  * Scale (100 TB base, GB-scale delta — the normal CDC regime): the
  * base relation is NEVER shuffled. The per-key latest-change window
  * runs on the delta only; the touched-key set (≤ |delta| rows, key
  * columns only) broadcasts into a storage-partition-preserving
  * left-anti join against base, and surviving upserts are unioned on.
  * `latest` has two consumers, so the DELTA is evaluated twice —
  * deliberately: the key-only consumer column-prunes to almost
  * nothing, and caching a delta to save one GB-scale re-read would
  * cost executor memory better spent elsewhere (PlanMetricsSpec pins
  * base-scanned-once / delta ≤ 2 / base-never-shuffled at runtime).
  * Set `broadcastTouched = false` only when the delta is itself huge
  * (backfill replay) — then the anti join becomes a shuffle join and
  * AQE sizes it.
  */
object CdcMerge {

  /** Apply `changes` (base's columns + `opCol` ∈ {I,U,D} + `seqCol`)
    * to `base`. Result has exactly base's schema.
    */
  def applyLatestWins(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op",
      broadcastTouched: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "CDC merge needs at least one key column")
    // final payload-hash tie-break: two changes with equal (key, seq, op)
    // but different payloads would otherwise get an arbitrary row_number
    // winner — stable within one run but not across runs/partitionings,
    // which would break replay convergence the moment a CDC source emits
    // such a tie. xxhash64 over the full row is deterministic everywhere.
    // NOTE: this clause is Spark-side only — the DuckDB oracle orders by
    // (seq DESC, op DESC) alone, so oracle parity additionally requires
    // the feed to be (key, seq, op)-tie-free. syntheticOrderChanges is,
    // by construction (MaintenanceSpec pins it); a production feed with
    // payload-differing ties still merges deterministically, it just has
    // no SQL-expressible oracle.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc,
        xxhash64(struct(changes.columns.map(col).toIndexedSeq: _*)).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val touchedKeys = latest.select(keys.map(col): _*)
    val touched = if (broadcastTouched) broadcast(touchedKeys) else touchedKeys
    val untouched = base.join(touched, keys, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    untouched.unionByName(upserts)
  }

  /** Deterministic synthetic change batch over `orders` for the driver
    * gate: deletes every key ≡3 (mod 10), updates every key ≡4 (mod 10)
    * in two waves (seq 1 adds 1000 to the price; seq 2 re-updates the
    * ≡4 (mod 20) half with +5000 — latest-wins must keep the second
    * wave), and inserts a fresh key (+10M offset) for every key ≡7
    * (mod 10). Mirrored 1:1 by the SQL oracle.
    */
  def syntheticOrderChanges(spark: SparkSession, orders: DataFrame): DataFrame = {
    val base = orders.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority")
    val deletes = base.filter(col("o_orderkey") % 10 === 3)
      .withColumn("op", lit("D")).withColumn("seq", lit(1L))
    val updates1 = base.filter(col("o_orderkey") % 10 === 4)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val updates2 = base.filter(col("o_orderkey") % 20 === 4)
      .withColumn("o_totalprice", col("o_totalprice") + 5000.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val inserts = base.filter(col("o_orderkey") % 10 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("op", lit("I")).withColumn("seq", lit(1L))
    deletes.unionByName(updates1).unionByName(updates2).unionByName(inserts)
  }
}
