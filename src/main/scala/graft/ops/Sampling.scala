package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic content-hash sampling — the sampling family a 100 TB
  * training-data pipeline actually uses. `df.sample()` draws from a
  * per-partition RNG: the sample changes with partitioning, retries and
  * cluster size, and a row's fate can't be reproduced after the fact.
  * Hashing a stable key instead gives samples that are
  *
  *  - reproducible across runs, partitionings and engines (the hash is
  *    md5-based, so the DuckDB oracle computes the same buckets);
  *  - consistent across tables: every table keyed by the same id
  *    samples the SAME entities, so joins between sampled tables stay
  *    complete (sample-then-join == join-then-sample);
  *  - map-only: a codegen'd filter on the scan, no shuffle, no state.
  *
  * Bucket = hash60(key) mod `buckets` (default 100, i.e. percent).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the string form of a key column.
    * hash60 is non-negative (60-bit), so mod == pmod.
    */
  def bucketOf(key: Column, buckets: Int = 100): Column =
    (Dedup.hash60(key.cast(StringType)) % buckets).cast(IntegerType)

  /** Keep rows whose key-bucket falls below `pct` of `buckets` — a
    * deterministic `pct/buckets` sample.
    */
  def hashSample(df: DataFrame, key: Column, pct: Int, buckets: Int = 100): DataFrame =
    df.filter(bucketOf(key, buckets) < pct)

  /** Deterministic train/val/test assignment by key hash: buckets
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val, rest →
    * test. The split column is computed, never stored state — any job
    * anywhere re-derives the same membership.
    */
  def assignSplit(df: DataFrame, key: Column,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = bucketOf(key)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified deterministic sample: per-stratum keep-percentages (e.g.
    * downsample boilerplate web text hard, keep rare languages whole).
    * The fraction table is a literal CASE chain — stays inside codegen,
    * no join, no shuffle; unknown strata fall back to `defaultPct`.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      pctByStratum: Map[String, Int], defaultPct: Int = 0,
      buckets: Int = 100): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, p).otherwise(acc)
    }
    df.filter(bucketOf(key, buckets) < pct)
  }

  /** Weight-proportional deterministic sample (e.g. sample documents
    * proportionally to length, so the TOKEN sample is uniform): keep a
    * row iff hash40(key) / 2^40 < targetN * weight / totalWeight — each
    * row kept independently with probability proportional to its
    * weight, expected sample size ≈ targetN.
    *
    * The comparison is exact integer arithmetic, cross-multiplied to
    * hash40(key) * totalWeight < weight * targetN * 2^40 and evaluated
    * in DECIMAL(38,0) so no float rounds and no int64 overflows at any
    * corpus size — the SAME rows are selected by any engine (the DuckDB
    * oracle runs it in HUGEINT). Float formulations break here: the
    * keep/drop boundary is a comparison, and a one-ulp disagreement
    * flips membership.
    *
    * Plan shape: the total-weight scalar rides a broadcast one-row
    * cross join; the filter itself is map-side codegen over the scan —
    * no shuffle of the data, no state, reproducible under retries.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      targetN: Int): DataFrame = {
    val dec = DecimalType(38, 0)
    val total = df.agg(
      sum(weight.cast(LongType)).cast(LongType).as("_tw"))
    df.crossJoin(broadcast(total))
      .filter(
        PortableSketches.hash40(key.cast(StringType))
          .cast(dec) * col("_tw").cast(dec) <
          weight.cast(dec) * lit(targetN).cast(dec) * lit(1L << 40).cast(dec))
      .drop("_tw")
  }

  /** Temperature-flattened group sample (the UniMax-style mixing move:
    * a dominant group — language, source domain — is downsampled toward
    * the smallest group instead of drowning it): keep a row of group g
    * with probability min(1, (n_min/n_g)^α) at temperature α = 1/2,
    * where n_g is g's row count and n_min the smallest group's. The
    * smallest group is kept whole; a group 4× its size keeps half.
    *
    * α = 1/2 makes the sqrt threshold EXACT-integer by squaring both
    * sides: keep iff hash40(key)² · n_g < n_min · 2^80, evaluated in
    * DECIMAL(38,0) (hash40² < 2^80 ≈ 1.2e24, so the product stays
    * inside 38 digits for any n_g up to ~10^12 rows per group — corpus
    * scale). No float ever touches the keep/drop boundary, so any
    * engine selects the SAME rows (the DuckDB oracle runs the identical
    * comparison in HUGEINT).
    *
    * Plan shape: the group-count relation is a tiny aggregate broadcast
    * back (groups, not rows); the n_min scalar rides a one-row
    * broadcast; the filter itself is map-side codegen over the scan —
    * no shuffle of the data, reproducible under retries and engines.
    */
  def temperatureSample(df: DataFrame, key: Column, group: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val n = df.groupBy(group.as("_g")).agg(count(lit(1)).as("_n_g"))
    val nMin = n.agg(min(col("_n_g")).as("_n_min"))
    val h = PortableSketches.hash40(key.cast(StringType)).cast(dec)
    df.join(broadcast(n), group === col("_g"))
      .crossJoin(broadcast(nMin))
      .filter(h * h * col("_n_g").cast(dec) <
        col("_n_min").cast(dec) * lit(BigDecimal(2).pow(80)).cast(dec))
      .drop("_g", "_n_g", "_n_min")
  }
}
