package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-portable deterministic sketches (cf. the approximate-aggregate
  * role of `Sketches`, but reproducible bit-for-bit across engines).
  *
  * Spark's built-in `approx_count_distinct` / `percentile_approx` give
  * engine-specific estimates: the sketch state depends on the engine's
  * private hash, so a Spark job and a DuckDB/Trino job sketching the
  * same data disagree, and a persisted sketch is readable only by the
  * engine that wrote it. At 100 TB that matters: sketches become stored
  * artifacts (per-partition distinct counts, corpus frequency summaries)
  * that MANY engines read back. Building them on md5 — stable, public,
  * identical everywhere — makes the sketch itself portable: any engine
  * can build, merge, or verify a register table.
  *
  * Three classic sketches, all with the same scale shape — O(sketch)
  * state per group, map-side partial aggregation, associative merge:
  *
  *  - HyperLogLog (m=256 registers): register = first byte of md5,
  *    rank = leading zeros of the next 32 bits. The harmonic sum uses
  *    only dyadic rationals 2^-r with r <= 33, so the 256-term sum is
  *    EXACT in double (a 41-bit window of the mantissa) — summation
  *    order can't drift, which is what makes the estimate hashable.
  *  - KMV (k minimum values): the k smallest distinct 40-bit hashes.
  *    40 bits (not 60) so the k-th min converts to double exactly.
  *  - Count-min (depth x width counters): per-row bucket = salted md5.
  *    Pure integer arithmetic end to end.
  *
  * Determinism rules follow the repo-wide oracle recipes: md5-derived
  * integers, powers of two via shifts (never libm pow), single final
  * division, round(_, 6).
  */
object PortableSketches {

  /** 40-bit md5 hash: first 10 hex chars. Unlike hash60, fits a double
    * mantissa exactly (2^40 < 2^53), so ratio arithmetic on it is
    * reproducible across engines.
    */
  def hash40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast(LongType)

  // ------------------------------------------------------------- HLL

  val hllM = 256

  /** Per-group HLL register table: (groups..., reg, r) with one row per
    * OCCUPIED register, r = max rank seen. This IS the sketch — tiny
    * (<= m rows per group), mergeable by max, persistable, and any
    * engine can rebuild or extend it. Duplicates need no pre-distinct:
    * max absorbs them, so the input streams through map-side partial
    * aggregation at full width.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val reg = conv(substring(md5(value), 1, 2), 16, 10).cast(IntegerType)
    val w32 = conv(substring(md5(value), 3, 8), 16, 10).cast(LongType)
    // rank = 1 + leading zeros of the 32-bit word = 33 - bitlength;
    // bitlength via the binary string (identical in DuckDB), w=0 -> 33
    val rho = when(w32 === 0, 33)
      .otherwise(lit(33) - length(bin(w32))).cast(IntegerType)
    df.select(groupCols.map(col) :+ reg.as("reg") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Collapse a register table to the raw HLL estimate per group.
    * Z = sum(2^-r) over occupied registers + 1.0 per empty register;
    * every term is a dyadic rational with exponent >= -33, so Z is
    * exact and order-independent. alpha_m * m^2 is spelled as the same
    * literal expression the oracle uses.
    *
    * RAW estimator, deliberately: the small-range linear-counting
    * correction (nd < 2.5m) needs ln(), whose last-ulp behaviour is
    * libm-specific — one flipped bit and the cross-engine hash breaks.
    * Accuracy below 2.5m comes from applying the correction reader-side
    * from the same register table (the occupied-count is already in it;
    * see PortableSketchesSpec), not from baking it into the hashable
    * face.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val term = lit(1.0) / expr("shiftleft(cast(1 as bigint), r)").cast(DoubleType)
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(term).as("z_occ"), count(lit(1)).as("n_occ"))
      .select(groupCols.map(col) :+
        round(alphaM2 / (col("z_occ") + (lit(256) - col("n_occ")).cast(DoubleType)),
          6).as("hll_nd"): _*)
  }

  // ------------------------------------------------------------- CMS

  /** Count-min sketch of a value column's occurrence counts:
    * (r, b, ct) rows, r in [0, depth), b = hash40(r || ':' || value) mod
    * width. Integer-only; <= depth*width rows total regardless of input
    * size, reached through map-side combine.
    */
  def cmsSketch(df: DataFrame, value: Column, depth: Int, width: Int): DataFrame = {
    val rows = (0 until depth).map { i =>
      struct(lit(i).as("r"), (hash40(concat(lit(s"$i:"), value)) % width).as("b"))
    }
    df.select(explode(array(rows: _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("ct"))
  }

  /** Point-estimate counts for `keys` (a column named `key`) against a
    * cms sketch: min over the depth rows of the bucket counters. The
    * sketch is broadcast (depth*width rows); estimation is a map-side
    * probe, never a shuffle of the keys. A bucket with no sketch row
    * holds count 0, so the probe is a LEFT join with a 0 fill: a cold
    * key (never sketched) estimates 0 instead of vanishing from the
    * output, and a key with some empty buckets takes min over the real
    * counters including that 0.
    */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame, depth: Int, width: Int): DataFrame = {
    val probes = (0 until depth).map { i =>
      struct(lit(i).as("r"), (hash40(concat(lit(s"$i:"), col("key"))) % width).as("b"))
    }
    keys
      .select(col("*"), explode(array(probes: _*)).as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.b").as("b")).drop("rb")
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("ct"), lit(0L))).as("cms_ct"))
  }
}
