package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional inverted index: phrase semantics against a direct
  * recompute, multi-occurrence counting, and the partition-pruning
  * claim measured off the executed scans.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("3-term phrase through the index equals the direct corpus recompute") {
    // pick the most frequent 3-gram in the corpus so the test phrase is
    // never empty regardless of the synthetic text generator's seed
    val docs = graft.Tables.load(spark, sf, "documents")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
    val tri = toks
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("t")) - lit(3)),
        i => struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), i + 2).as("b"),
          element_at(col("t"), i + 3).as("c")))).as("g"))
    val top = tri.groupBy("g").count().orderBy(col("count").desc).first().getStruct(0)
    val phrase = Seq(top.getString(0), top.getString(1), top.getString(2))

    val viaIndex = InvertedIndex.phraseSearch(spark, sf, phrase, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = tri
      .filter(col("g.a") === phrase(0) && col("g.b") === phrase(1) &&
        col("g.c") === phrase(2))
      .groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaIndex.nonEmpty)
    assert(viaIndex === direct)
  }

  test("overlapping single-term and repeated occurrences count exactly") {
    import java.nio.file.Files
    val docs = Seq(
      (1L, "a b a b a b"), // "a b" occurs 3 times
      (2L, "a a a a"),     // "a a" occurs 3 times (overlapping starts)
      (3L, "b b")
    ).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("inv_spec").toString
    InvertedIndex.write(docs, idx)
    def search(phrase: Seq[String]) = {
      val legs = phrase.zipWithIndex.map { case (t, i) =>
        spark.read.parquet(idx)
          .filter(col("term") === lit(t))
          .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
      }
      legs.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
        .groupBy("doc_id").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(search(Seq("a", "b")) === Map(1L -> 3L))
    // positional intersection naturally counts overlapping starts —
    // the same answer a scan of the text gives
    assert(search(Seq("a", "a")) === Map(2L -> 3L))
    assert(search(Seq("b")) === Map(1L -> 3L, 2L -> 0L, 3L -> 2L).filter(_._2 > 0))
  }

  test("segmented index: base + appended delta segment ≡ the monolithic build") {
    val phrase = Seq("table", "hash")
    val mono = InvertedIndex.phraseSearch(spark, sf, phrase, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val seg = InvertedIndex.phraseSearchIncr(spark, sf, phrase, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(seg === mono)
    // the segmented layout still prunes: bucket partition filter
    // survives the two-level seg=*/bucket=* discovery
    val df = InvertedIndex.phraseSearchIncr(spark, sf, phrase, k = 20)
    df.collect()
    val scans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("inverted_index_incr")))
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("bucket")),
        s"no bucket partition filter: ${s.metadata.get("PartitionFilters")}")
    }
  }

  test("segment append is idempotent and compaction preserves search results") {
    import java.nio.file.Files
    val docs = Seq(
      (1L, "x y x y"), (2L, "x y"), (3L, "y x")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("inv_seg").toString
    InvertedIndex.writeSegment(docs.filter(col("doc_id") <= 2), path, "base")
    InvertedIndex.writeSegment(docs.filter(col("doc_id") === 3), path, "d1")
    // replayed append: same segment id overwrites with identical bytes
    InvertedIndex.writeSegment(docs.filter(col("doc_id") === 3), path, "d1")
    def search(at: String) =
      InvertedIndex.phraseSearchAt(spark, at, Seq("x", "y"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(search(path) === Map(1L -> 2L, 2L -> 1L))
    val out = Files.createTempDirectory("inv_compact").toString
    InvertedIndex.compact(spark, path, out)
    assert(search(out) === search(path))
    // compaction collapsed to ONE segment
    assert(new java.io.File(out).listFiles().count(_.getName.startsWith("seg=")) === 1)
  }

  test("phrase query scans are bucket-partition-pruned and term-pushed") {
    val df = InvertedIndex.phraseSearch(spark, sf, Seq("table", "hash"), k = 20)
    df.collect()
    val scans = PlanMetrics.distinctFileScans(df)
      .filter(_.metadata.get("Location").exists(_.contains("inverted_index")))
    assert(scans.nonEmpty)
    scans.foreach { s =>
      // directory pruning: the partition filter on bucket survived to
      // the scan, and only that bucket's files were read
      assert(s.metadata.get("PartitionFilters").exists(_.contains("bucket")),
        s"no partition filter on: ${s.metadata.get("PartitionFilters")}")
      // row-group pruning: the term equality was pushed into parquet
      assert(s.metadata.get("PushedFilters").exists(_.contains("term")),
        s"term filter not pushed: ${s.metadata.get("PushedFilters")}")
      val total = new java.io.File(
        StageOnce.tmp("inverted_index", sf)).listFiles()
        .count(_.getName.startsWith("bucket="))
      val selected = s.selectedPartitions.partitionCount
      assert(selected < total,
        s"scan read $selected of $total partitions — no pruning")
    }
  }
}
