package graft.sources

import java.io.{File, RandomAccessFile}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** dBase III source: header/field parsing, record-range splits seeking
  * to exact byte offsets, deleted-record skipping, column pruning down
  * to the parsed fields, null round trips for every supported type, and
  * the writer↔reader round trip that backs the `q_dbf_*` faces.
  */
class DbfSourceSpec extends SparkSpec {

  private def stagingDir: String =
    Files.createTempDirectory("dbf_spec").toString

  private val typedSchema = StructType(Seq(
    StructField("code", LongType),
    StructField("label", StringType),
    StructField("pop", DecimalType(9, 2)),
    StructField("since", DateType),
    StructField("active", BooleanType)))

  private def typedRows: Seq[Row] = Seq(
    Row(1L, "PARIS", BigDecimal("2145.90").bigDecimal,
      java.sql.Date.valueOf("2020-01-01"), true),
    Row(2L, "LYON", BigDecimal("522.25").bigDecimal,
      java.sql.Date.valueOf("1999-12-31"), false),
    Row(3L, null, null, null, null),
    Row(-4L, "ST OUEN", BigDecimal("-0.50").bigDecimal,
      java.sql.Date.valueOf("2024-02-29"), true))

  test("typed round trip: C/N/N-decimal/D/L with nulls") {
    val dir = stagingDir
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(typedRows, 1), typedSchema)
    DbfSource.write(df, s"$dir/t.dbf")
    val back = spark.read.format("dbf").load(s"$dir/t.dbf")
    assert(back.schema.map(f => (f.name, f.dataType)) == Seq(
      ("code", LongType), ("label", StringType),
      // N width = precision+2 (sign+point), so decimal reads as (len-2, s)
      ("pop", DecimalType(9, 2)), ("since", DateType),
      ("active", BooleanType)))
    val got = back.orderBy("code").collect().toSeq
    val exp = df.orderBy("code").collect().toSeq
    assert(got == exp)
  }

  test("record-range splits: partition count from recordsPerSplit, same rows") {
    val dir = stagingDir
    val df = spark.range(0, 103).select(col("id").as("k"),
      concat(lit("row_"), col("id")).as("v"))
    DbfSource.write(df, s"$dir/t.dbf")
    val split = spark.read.format("dbf")
      .option("recordsPerSplit", "10").load(s"$dir/t.dbf")
    assert(split.rdd.getNumPartitions == 11) // ceil(103/10)
    val whole = spark.read.format("dbf").load(s"$dir/t.dbf")
    assert(whole.rdd.getNumPartitions == 1)
    assert(split.orderBy("k").collect().toSeq ==
      whole.orderBy("k").collect().toSeq)
    assert(split.count() == 103)
  }

  test("deleted records are skipped without breaking split seek math") {
    val dir = stagingDir
    val df = spark.range(0, 20).select(col("id").as("k"))
    DbfSource.write(df, s"$dir/t.dbf")
    // flag records 3 and 17 deleted, in different splits
    val h = DbfSource.readHeader(new File(s"$dir/t.dbf"))
    val raf = new RandomAccessFile(s"$dir/t.dbf", "rw")
    try Seq(3, 17).foreach { i =>
      raf.seek(h.headerSize + i.toLong * h.recordSize)
      raf.write('*')
    } finally raf.close()
    // the out-of-band edit models an externally-produced file: drop the
    // LocalFileSystem checksum sidecar it invalidates
    new File(s"$dir/.t.dbf.crc").delete()
    val back = spark.read.format("dbf")
      .option("recordsPerSplit", "7").load(s"$dir/t.dbf")
    assert(back.select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == (0L until 20L).filterNot(Seq(3L, 17L).contains))
  }

  test("column pruning reaches the reader (description lists only requested fields)") {
    val dir = stagingDir
    val df = spark.range(0, 5).select(col("id").as("a"),
      col("id").cast(StringType).as("b"), (col("id") * 2).as("c"))
    DbfSource.write(df, s"$dir/t.dbf")
    val pruned = spark.read.format("dbf").load(s"$dir/t.dbf").select("b")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("columns=[b]"))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("0", "1", "2", "3", "4"))
  }

  test("limit pushdown caps the planned record ranges") {
    val dir = stagingDir
    DbfSource.write(spark.range(0, 1000).select(col("id").as("k")),
      s"$dir/t.dbf")
    val limited = spark.read.format("dbf")
      .option("recordsPerSplit", "100").load(s"$dir/t.dbf").limit(7)
    val scan = limited.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    // one sequential stop-at-7-live-rows partition, not ten of 100
    assert(scan.inputRDD.getNumPartitions == 1)
    assert(limited.count() == 7)
  }

  test("pushed limit still delivers `limit` live rows when deletions precede them") {
    val dir = stagingDir
    DbfSource.write(spark.range(0, 50).select(col("id").as("k")),
      s"$dir/t.dbf")
    // delete 5 of the first 7 physical slots: a range capped at 7 records
    // would yield only 2 live rows for LIMIT 7
    val h = DbfSource.readHeader(new File(s"$dir/t.dbf"))
    val raf = new RandomAccessFile(s"$dir/t.dbf", "rw")
    try Seq(0, 2, 3, 5, 6).foreach { i =>
      raf.seek(h.headerSize + i.toLong * h.recordSize)
      raf.write('*')
    } finally raf.close()
    new File(s"$dir/.t.dbf.crc").delete() // out-of-band edit: drop checksum
    val limited = spark.read.format("dbf").load(s"$dir/t.dbf").limit(7)
    val got = limited.select("k")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq
    assert(got == Seq(1L, 4L, 7L, 8L, 9L, 10L, 11L),
      s"LIMIT 7 must return the first 7 LIVE rows, got $got")
  }

  test("field names up to 11 bytes survive; 12 bytes are rejected at write") {
    val dir = stagingDir
    DbfSource.write(spark.range(0, 3).select(col("id").as("n_nationkey")),
      s"$dir/ok.dbf")
    assert(spark.read.format("dbf").load(s"$dir/ok.dbf")
      .schema.fieldNames.toSeq == Seq("n_nationkey"))
    val e = intercept[IllegalArgumentException] {
      DbfSource.write(spark.range(0, 1).select(col("id").as("twelve_chars")),
        s"$dir/bad.dbf")
    }
    assert(e.getMessage.contains("11 bytes"))
  }

  test("nation.dbf staged bytes are deterministic (byte-stable re-stage)") {
    val dir = stagingDir
    val nation = graft.Tables.load(spark, sf, "nation")
    DbfSource.write(nation, s"$dir/a.dbf")
    DbfSource.write(nation, s"$dir/b.dbf")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(new File(s"$dir/a.dbf").toPath),
      Files.readAllBytes(new File(s"$dir/b.dbf").toPath)))
  }

  test("a directory of same-schema .dbf files reads as one table; mismatched schema is rejected") {
    val dir = stagingDir
    DbfSource.write(spark.range(0, 10).select(col("id").as("k")),
      s"$dir/a.dbf")
    DbfSource.write(spark.range(10, 25).select(col("id").as("k")),
      s"$dir/b.dbf")
    val both = spark.read.format("dbf").load(dir)
    assert(both.count() == 25)
    assert(both.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 25L))
    // a third file with a different schema must fail planning loudly
    DbfSource.write(spark.range(0, 3).select(col("id").as("other")),
      s"$dir/c.dbf")
    val e = intercept[Exception] {
      spark.read.format("dbf").load(dir).count()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("schema mismatch"), messages)
  }

  test("property: random typed rows round-trip bit-exactly (20 seeded samples)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // latin-1-safe strings with no leading/trailing whitespace and no
    // all-blank values (all-blank C reads as null by documented choice)
    val str = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++
        ('0' to '9') ++ "éüßñ_.,:#-".toSeq)).map(_.mkString))
    val rowGen = for {
      k <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.option(str)
      d <- Gen.option(Gen.choose(-2000000000L, 2000000000L)
        .map(c => BigDecimal(c, 2)))
      dt <- Gen.option(Gen.choose(-20000, 40000)
        .map(days => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(days.toLong))))
      b <- Gen.option(Gen.oneOf(true, false))
    } yield Row(k, s.orNull, d.map(_.bigDecimal).orNull, dt.orNull,
      b.map(java.lang.Boolean.valueOf).orNull)
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("d", DecimalType(12, 2)),
      StructField("dt", DateType),
      StructField("b", BooleanType)))
    val params = Gen.Parameters.default
    (1 to 20).foreach { seed =>
      val rows = Gen.listOfN(25, rowGen).pureApply(params, Seed(seed.toLong))
        // distinct keys so the sorted compare is total
        .zipWithIndex.map { case (r, i) => Row(i.toLong +: r.toSeq.tail: _*) }
      val dir = stagingDir
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      DbfSource.write(df, s"$dir/p.dbf")
      val back = spark.read.format("dbf")
        .option("recordsPerSplit", "7").load(s"$dir/p.dbf")
      assert(back.orderBy("k").collect().toSeq ==
        df.orderBy("k").collect().toSeq, s"seed $seed diverged")
    }
  }

  test("header-derived statistics: a dbf dim auto-broadcasts without a hint") {
    val dir = stagingDir
    DbfSource.write(spark.range(0, 50).select(col("id").as("k"),
      concat(lit("label_"), col("id")).as("lbl")), s"$dir/dim.dbf")
    val dim = spark.read.format("dbf").load(s"$dir/dim.dbf")
    // exact stats from the header: 50 rows, bytes = n * recordSize
    val stats = dim.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10000,
      s"reported ${stats.sizeInBytes} bytes — header stats not wired")
    // NO broadcast() hint: the planner must pick BHJ from the stats
    val fact = spark.range(0, 10000).select((col("id") % 50).as("k"))
    val joined = fact.join(dim, "k")
    joined.collect()
    val bhj = graft.ops.PlanMetrics.executedNodes(joined).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bhj === 1, "stats-driven auto-broadcast did not happen")
  }

  test("a non-dbf file is rejected with the version byte in the error") {
    val dir = stagingDir
    Files.write(new File(s"$dir/x.dbf").toPath,
      Array.fill[Byte](64)(0x42))
    val e = intercept[IllegalArgumentException] {
      DbfSource.readHeader(new File(s"$dir/x.dbf"))
    }
    assert(e.getMessage.contains("not a dBase III file"))
  }
}
