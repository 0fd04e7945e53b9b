package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

import graft.functions.ColumnBridge

/** Bloom-filter pre-join pruning — the explicit, library-level form of
  * runtime row-level filtering (Spark's own InjectRuntimeFilter applies
  * the same BloomFilterAggregate / BloomFilterMightContain pair when its
  * heuristics fire; here the pipeline author states the intent).
  *
  * The 100 TB shape this exists for: a fact-side shuffle join against a
  * filtered dimension whose surviving keys are too many to broadcast-
  * hash-join (tens of millions) but whose BLOOM FILTER is a few MB. The
  * filter is built with one distributed aggregation over the keys
  * (constant-size mergeable sketch state), broadcast as a one-row
  * relation, and applied map-side BEFORE the fact side's exchange — so
  * rows that cannot match never enter the shuffle. With a 1% false-
  * positive rate the shuffle volume drops to ~(selectivity + 1%) of the
  * fact table; the residual false positives are removed by the real
  * join that follows.
  */
object BloomPrune {

  /** One-row DataFrame holding the bloom filter (column `__bf`, binary)
    * of `key` over `keys` — one aggregation pass, xxhash64'd keys.
    */
  def bloomOf(keys: DataFrame, key: Column, expectedKeys: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      expectedKeys).toAggregateExpression()
    keys.select(ColumnBridge.column(agg).as("__bf"))
  }

  /** `fact` minus the rows whose `factKey` is definitely not in the
    * bloom filter of `keyCol` over `keys` (may keep false positives —
    * follow with the real join). The bloom is attached as an
    * uncorrelated scalar subquery — `might_contain` requires a constant
    * or scalar-subquery filter, and this is the exact shape Spark's own
    * InjectRuntimeFilter emits — so the sketch evaluates once and the
    * test runs map-side in whole-stage codegen, before any downstream
    * exchange.
    */
  def pruneByBloom(fact: DataFrame, factKey: Column,
      keys: DataFrame, keyCol: Column, expectedKeys: Long): DataFrame = {
    val bloomPlan = bloomOf(keys, keyCol, expectedKeys).queryExecution.analyzed
    fact.filter(ColumnBridge.column(new BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(ColumnBridge.expression(factKey))))))
  }

  /** Exact left-semi join with bloom pre-pruning: semantically identical
    * to `fact.join(keys, fact(factKey) === keys(keyCol), "left_semi")`
    * (BloomPruneSpec pins this); the bloom pass only shrinks what the
    * semi join must shuffle.
    */
  def semiJoinBloom(fact: DataFrame, factKey: Column,
      keys: DataFrame, keyCol: Column, expectedKeys: Long): DataFrame = {
    val pruned = pruneByBloom(fact, factKey, keys, keyCol, expectedKeys)
    pruned.join(keys.select(keyCol.as("__k")).distinct(),
      factKey === col("__k"), "left_semi")
  }

  /** Exact left-ANTI join with bloom pre-pruning — the deletion-side
    * dual of [[semiJoinBloom]]: semantically identical to
    * `fact.join(keys, factKey === keyCol, "left_anti")`. Rows whose
    * key is DEFINITELY absent from the bloom (no false negatives by
    * construction) are kept map-side without entering any join
    * exchange; only the might-contain suspects — true members plus the
    * ~FP-rate sliver — ride the exact anti-join that removes the false
    * positives. The join exchange therefore carries ~(|keys|-match
    * rate + FP rate) of the fact table instead of all of it — the
    * shape that keeps a corpus-∝ drop set affordable where a
    * broadcast anti-join no longer is.
    */
  def antiJoinBloom(fact: DataFrame, factKey: Column,
      keys: DataFrame, keyCol: Column, expectedKeys: Long): DataFrame = {
    val bloomPlan = bloomOf(keys, keyCol, expectedKeys).queryExecution.analyzed
    // A single expression instance (val, not def) shared by both
    // branches: the fastKeep and suspects filters then carry the SAME
    // ScalarSubquery, so the expectedKeys-sized bloom-build aggregate
    // executes once even if ReuseSubquery fails to canonicalize two
    // separately-constructed subqueries together (semiJoinBloom's
    // single-instance shape).
    val mightContain = ColumnBridge.column(new BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(ColumnBridge.expression(factKey)))))
    val fastKeep = fact.filter(!mightContain)
    val suspects = fact.filter(mightContain)
    fastKeep.unionByName(
      suspects.join(keys.select(keyCol.as("__k")).distinct(),
        factKey === col("__k"), "left_anti"))
  }
}
