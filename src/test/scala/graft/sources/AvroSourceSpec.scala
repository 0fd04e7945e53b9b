package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native Avro OCF source: exact round trip (nulls, all scalar types),
  * sync-marker byte-range splits that neither drop nor duplicate rows,
  * and decode-level column pruning visible in the scan description.
  */
class AvroSourceSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(df: org.apache.spark.sql.DataFrame,
      opts: Map[String, String] = Map.empty) = {
    val dir = java.nio.file.Files.createTempDirectory("avro_rt").toString
    AvroSource.write(df, s"$dir/t.avro", syncIntervalBytes = 512)
    opts.foldLeft(spark.read.format("avrofile"))((r, kv) =>
      r.option(kv._1, kv._2)).load(s"$dir/t.avro")
  }

  test("round trip: scalar types and nulls survive exactly") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(true), Some(7)),
      (2L, None, None, None, None),
      (3L, Some("gamma"), Some(-2.25), Some(false), Some(-1)))
      .toDF("id", "s", "d", "b", "i")
    val got = roundtrip(df).orderBy(col("id"))
      .collect().map(_.toString).toSeq
    val expected = df.orderBy(col("id")).collect().map(_.toString).toSeq
    assert(got === expected)
    assert(roundtrip(df).schema === df.schema)
  }

  test("byte-range splits: many partitions, no row lost or duplicated") {
    val df = (1L to 5000L).map(i => (i, s"row-$i-payload", i * 1.25))
      .toDF("id", "s", "v")
    val read = roundtrip(df, Map("blockBytesPerSplit" -> "4096"))
    assert(read.rdd.getNumPartitions > 4,
      s"split machinery bypassed: ${read.rdd.getNumPartitions} partitions")
    assert(read.count() === 5000L)
    assert(read.agg(sum(col("id"))).head.getLong(0) === (1L to 5000L).sum)
    assert(read.select(col("id")).distinct().count() === 5000L)
  }

  test("column pruning reaches the scan (projected reader schema in the plan)") {
    val df = (1L to 100L).map(i => (i, "x" * 100, i * 1.0)).toDF("id", "s", "v")
    val pruned = roundtrip(df).select(col("id"))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("columns=[id]"), scan)
    assert(pruned.agg(sum(col("id"))).head.getLong(0) === 5050L)
  }

  test("directory of files reads as a union, deterministic order-independent") {
    val dir = java.nio.file.Files.createTempDirectory("avro_dir").toString
    AvroSource.write(Seq((1L, "a")).toDF("id", "s"), s"$dir/a.avro")
    AvroSource.write(Seq((2L, "b")).toDF("id", "s"), s"$dir/b.avro")
    val got = spark.read.format("avrofile").load(dir)
      .orderBy(col("id")).collect().map(_.toString).toSeq
    assert(got === Seq("[1,a]", "[2,b]"))
  }
}
