package graft.ops

import graft.SparkSpec
import graft.queries.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("packSequencesSharded: hash-partitioned window, not a global sort") {
    val df = Curation.packSequencesSharded(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the scale fix: the running-total window runs per shard behind a
    // hash exchange — the global variant's single-partition window
    // (Exchange SinglePartition under Window) must not appear
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("packSequencesSharded conserves docs/tokens and keeps shard bins disjoint") {
    val sharded = Curation.packSequencesSharded(spark, sf, budget = 500, nShards = 4)
      .agg(sum("n_docs").as("docs"), sum("bin_tokens").as("toks"))
      .collect()(0)
    val global = Curation.packSequences(spark, sf, budget = 500)
      .agg(sum("n_docs").as("docs"), sum("bin_tokens").as("toks"))
      .collect()(0)
    assert(sharded.getLong(0) == global.getLong(0))
    assert(sharded.getLong(1) == global.getLong(1))
    // bin ids are globally unique: shard recoverable from the id offset
    val clash = Curation.packSequencesSharded(spark, sf, budget = 500, nShards = 4)
      .filter(shiftright(col("bin_id"), 40) =!= col("shard")).count()
    assert(clash == 0)
  }
}
