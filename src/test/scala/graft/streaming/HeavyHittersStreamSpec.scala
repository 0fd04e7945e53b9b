package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming MG maintenance: the generation fold keeps the mergeable
  * superset guarantee across batches, a replayed fold rewrites
  * identical state, and the converged report equals the batch face.
  */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "s") }
      .toDF("doc_id", "text", "source")

  test("two-batch fold: state holds the heavy gram with the stream total; replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("hhs").toString
    // 'aaaa' → grams aaa×2; batch 2 repeats it and adds noise
    HeavyHittersStream.fold(docsDF((1L, "aaaa"), (2L, "bcdef")), root, 0L)
    HeavyHittersStream.fold(docsDF((3L, "aaaaa")), root, 1L)
    val st = spark.read.parquet(s"$root/state/gen=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aaa = ('a'.toLong << 32) | ('a'.toLong << 16) | 'a'.toLong
    assert(st(aaa) === 5L) // 2 + 3 occurrences, exactly counted (k never exceeded)
    assert(st(HeavyHittersStream.Sentinel) === 2L + 3L + 3L)
    // checkpoint-recovery replay of batch 1 rewrites identical state
    HeavyHittersStream.fold(docsDF((3L, "aaaaa")), root, 1L)
    val st2 = spark.read.parquet(s"$root/state/gen=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st2 === st)
  }

  test("converged stream report ≡ the batch face on the real corpus") {
    val got = graft.queries.SketchOps
      .heavyHittersStreamMaterialize(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.queries.SketchOps.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }
}
