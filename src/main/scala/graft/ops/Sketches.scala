package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches that replace exact operators
  * once exact stops scaling. At 100 TB an exact `count(DISTINCT x)` is
  * a full shuffle of every distinct value; the HLL++ sketch is a few KB
  * of mergeable state per group, and `percentile_approx`'s
  * Greenwald-Khanna summary replaces a full sort. Both partial-
  * aggregate map-side and merge associatively, so they take the same
  * two-stage hash-aggregate plan as a plain count — constant state per
  * group instead of state proportional to the data.
  *
  * Approximate results are NOT oracle-hashable directly (the sketch
  * estimate is engine-specific); SketchesSpec pins each one to its
  * exact counterpart within the documented error bound, and
  * `q_sketch_builtin_bounds` (queries.SketchOps.sketchBuiltinBounds)
  * puts the same bound checks under the driver's DuckDB hash gate —
  * the estimate is deterministic for a fixed input, so "estimate
  * within bound" is a hashable boolean. For sketches whose ESTIMATES
  * are themselves engine-portable and oracle-hashable, see
  * [[PortableSketches]].
  */
object Sketches {

  /** Distinct count per group via HyperLogLog++ (rsd = target relative
    * standard deviation; Spark default 0.05).
    */
  def approxDistinct(df: DataFrame, groups: Seq[Column], value: Column,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groups: _*)
      .agg(approx_count_distinct(value, rsd).as("approx_nd"))

  /** Exact counterpart, for bound checks and small inputs. */
  def exactDistinct(df: DataFrame, groups: Seq[Column], value: Column): DataFrame =
    df.groupBy(groups: _*).agg(countDistinct(value).as("exact_nd"))

  /** Approximate quantiles per group (Greenwald-Khanna; `accuracy` =
    * 1/relative-error, Spark default 10000).
    */
  def approxQuantiles(df: DataFrame, groups: Seq[Column], value: Column,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groups: _*)
      .agg(percentile_approx(value, array(probs.map(lit): _*), lit(accuracy))
        .as("approx_q"))

  /** Heavy hitters: values occurring in more than `minSupport` fraction
    * of rows, per the count-based sketch behind DataFrameStatFunctions.
    */
  def frequentItems(df: DataFrame, cols: Seq[String],
      minSupport: Double = 0.01): DataFrame =
    df.stat.freqItems(cols, minSupport)
}
