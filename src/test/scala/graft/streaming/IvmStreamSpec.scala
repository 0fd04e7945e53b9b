package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming IVM: converged view ≡ the batch face, the generation
  * chain grows one MV snapshot per batch, and a replayed fold rewrites
  * identical artifacts (the exactly-once argument).
  */
class IvmStreamSpec extends SparkSpec {
  import spark.implicits._

  test("converged stream ≡ batch IVM face through the kill-and-resume") {
    val got = graft.queries.Maintenance.ivmStreamMaterialize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = graft.queries.Maintenance.ivmAggregate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(want), "stream != batch")
    // one MV generation per micro-batch survived the restart
    val root = graft.ops.StageOnce.tmp("ivm_stream", sf)
    val gens = new java.io.File(s"$root/mv").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.length === 3, s"expected 3 generations, got ${gens.toSeq}")
  }

  test("replayed fold is idempotent: same generation in, same artifacts out") {
    val root = java.nio.file.Files.createTempDirectory("ivm_s").toString
    val mv0 = s"$root/mv0"
    Seq((2020L, 2L, BigDecimal(10.00))).toDF("annee", "n", "s")
      .select(col("annee"), col("n"),
        col("s").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("s"))
      .write.parquet(mv0)
    def batch(dvs: (Long, Long, Double)*) =
      dvs.toSeq.toDF("annee", "dn", "dv")
    IvmStream.fold(batch((2020L, 1L, 5.0)), root, mv0, 0L)
    IvmStream.fold(batch((2020L, -1L, -3.0), (2021L, 1L, 7.0)), root, mv0, 1L)
    def snap() = IvmStream.view(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = snap()
    assert(before === Seq((2020L, 2L, 12.0), (2021L, 1L, 7.0)))
    // at-least-once delivery: batch 1 fires again — gen 1 recomputes
    // from gen 0 (never from itself) and rewrites identically
    IvmStream.fold(batch((2020L, -1L, -3.0), (2021L, 1L, 7.0)), root, mv0, 1L)
    assert(snap() === before)
  }
}
