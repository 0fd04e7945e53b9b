package graft.streaming

import graft.SparkSpec
import graft.queries.Maintenance
import org.apache.spark.sql.functions._

/** Streaming SCD2: the converged history (through a kill-and-resume)
  * must be the batch face's exact result, the double-update chain must
  * close across micro-batch boundaries, and a replayed fold must
  * rewrite identical artifacts.
  */
class Scd2StreamSpec extends SparkSpec {

  private lazy val converged = Maintenance.scd2StreamMaterialize(spark, sf)

  test("converged ≡ batch face through kill-and-resume") {
    val got = converged.collect().map(_.toString).sorted.toSeq
    val expected = Maintenance.scd2History(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expected)
  }

  test("a cross-batch double update closes the seq-1 version, not the initial one") {
    val k20 = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 20 === 4)
      .select(col("o_orderkey"), col("o_totalprice"))
      .head
    val (k, v0) = (k20.getLong(0), k20.getDouble(1))
    val chain = converged.filter(col("o_orderkey") === k)
      .collect().map(r => (r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sortBy(_._2).toSeq
    assert(chain === Seq((v0, 0L, Some(1L)), (v0 + 1000.0, 1L, Some(2L)),
      (v0 + 5000.0, 2L, None)),
      s"key $k version chain broke across the batch boundary: $chain")
  }

  test("replayed fold is idempotent: re-running a generation rewrites identical rows") {
    converged.count() // ensure staged
    val root = graft.ops.StageOnce.tmp("scd2_stream", sf)
    val gen1 = spark.read.parquet(s"$root/hist/gen=1")
      .collect().map(_.toString).sorted.toSeq
    // replay batch 1's fold from the same inputs (gens < 1)
    val events = Maintenance.scd2Events(spark, sf)
      .filter(col("seq") === 1L && col("k") % 2 === 1)
    val hist0 = graft.ops.StageOnce.tmp("scd2_stream_hist0", sf)
    Scd2Stream.fold(events.select(col("k"), col("v"), col("seq"), col("op")),
      root, hist0, 1L)
    val replayed = spark.read.parquet(s"$root/hist/gen=1")
      .collect().map(_.toString).sorted.toSeq
    assert(replayed === gen1, "replaying batch 1 changed the generation artifact")
  }
}
