package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"layout-$name").resolve("t").toString

  private lazy val df = (0L until 10000L).map(i => (i, s"cat${i % 5}", i * 2))
    .toDF("id", "cat", "v")

  test("writePartitioned: equality read prunes to one directory (PartitionFilters)") {
    val path = tmp("hive")
    Layout.writePartitioned(df, path, "cat")
    val read = spark.read.parquet(path).filter($"cat" === "cat3")
    assert(read.count() == 2000)
    val scan = read.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty, "expected partition-level pruning")
    // only the matching directory's files are read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).forall(_.getPath.toString.contains("cat=cat3")))
  }

  test("writeRangeClustered: files carry disjoint id ranges") {
    val path = tmp("range")
    Layout.writeRangeClustered(df, path, $"id", nFiles = 8)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length == 8)
    perFile.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, "file ranges must not overlap")
    }
  }

  test("compact merges small files and preserves the data") {
    val inPath = tmp("frag")
    val outPath = tmp("compacted")
    df.repartition(64).write.parquet(inPath) // 64 tiny files
    val (before, after) = Layout.compact(spark, inPath, outPath,
      targetBytes = 10L * 1024 * 1024)
    assert(before == 64 && after < 8, s"before=$before after=$after")
    val a = spark.read.parquet(inPath).orderBy("id").collect()
    val b = spark.read.parquet(outPath).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
