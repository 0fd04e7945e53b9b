package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * AQE's skew-join split (on by default) handles most cases at runtime;
  * these are the explicit tools for when the skew is known up front —
  * e.g. a null/default key holding 10% of a 100 TB fact table, or a
  * power-law grouping key.
  *
  * Both are semantics-preserving: specs assert equality with the
  * unsalted formulation.
  */
object Skew {

  /** Salted two-phase aggregation for decomposable aggregates: phase 1
    * aggregates on (keys, random salt in [0, saltBuckets)), spreading a
    * hot key over `saltBuckets` reducers; phase 2 combines the partials
    * on the true keys. The partial relation is tiny (≤ groups ×
    * saltBuckets rows), so phase 2 never skews.
    *
    * `partials` map: output column -> (phase-1 agg over input, phase-2
    * combiner over the partial column).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(42L) * saltBuckets).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, (agg, _)) => agg.as(s"__p_$n") }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, (_, comb)) =>
          comb(col(s"__p_$n")).as(n)
        }.toSeq: _*)
  }

  /** Broadcast-replicated salted join for a skewed probe side against a
    * modest build side: the build side is replicated `saltBuckets` times
    * (one copy per salt), the probe side gets a random salt, and the
    * join key becomes (key, salt) — a hot probe key now lands on
    * `saltBuckets` different reducers. Inner joins only (replication is
    * transparent there).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      (rand(7L) * saltBuckets).cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt"))
      .drop("__salt")
  }
}
