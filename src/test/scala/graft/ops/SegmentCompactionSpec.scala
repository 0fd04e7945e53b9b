package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-bucket segment compaction: the compacted bucket folds to ONE
  * file, every other bucket's files stay byte-untouched (path + size +
  * mtime pinned), the row multiset is unchanged, and the REAL search
  * plans (trigram LIKE scan, phrase search) return identical results
  * before and after.
  */
class SegmentCompactionSpec extends SparkSpec {

  private def fileCensus(root: String, excludeBucket: Long): Seq[(String, Long, Long)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val st = fs.listStatus(p)
      st.filter(_.isFile).toSeq ++ st.filter(_.isDirectory).flatMap(d => walk(d.getPath))
    }
    walk(new Path(root))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .filterNot(_.getPath.toString.contains(s"bucket=$excludeBucket"))
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1)
  }

  test("trigram index: compacted bucket → one file; others byte-untouched; LIKE scan invariant") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val idx = java.nio.file.Files.createTempDirectory("trgm_compact").toString
    // three crawl segments so the hot buckets accumulate 3 files each
    TrigramIndex.writeSegment(docs.filter(col("doc_id") % 3 === 0), idx, "s0")
    TrigramIndex.writeSegment(docs.filter(col("doc_id") % 3 === 1), idx, "s1")
    TrigramIndex.writeSegment(docs.filter(col("doc_id") % 3 === 2), idx, "s2")
    // pick a bucket one of the face patterns actually reads
    val bucket = spark.read.parquet(idx).groupBy("bucket").count()
      .orderBy(col("count").desc).head.getAs[Number]("bucket").longValue
    val before = TrigramIndex.likeScanAt(spark, sf, idx).collect().map(_.toString).toSeq
    val rowsBefore = spark.read.parquet(idx)
      .filter(col("bucket") === bucket)
      .select("doc_id", "tri").collect().map(_.toString).sorted.toSeq
    val othersBefore = fileCensus(idx, bucket)
    val (nBefore, nAfter) = SegmentCompaction.compactBucket(spark, idx, bucket)
    assert(nBefore >= 3, s"expected ≥3 per-segment files, got $nBefore")
    assert(nAfter === 1, s"compaction left $nAfter files")
    assert(fileCensus(idx, bucket) === othersBefore,
      "a non-compacted bucket's files changed")
    val rowsAfter = spark.read.parquet(idx)
      .filter(col("bucket") === bucket)
      .select("doc_id", "tri").collect().map(_.toString).sorted.toSeq
    assert(rowsAfter === rowsBefore, "compaction changed the posting multiset")
    val after = TrigramIndex.likeScanAt(spark, sf, idx).collect().map(_.toString).toSeq
    assert(after === before, "search result changed across compaction")
  }

  test("inverted index: per-bucket fold is search-invariant for phrase search") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val idx = java.nio.file.Files.createTempDirectory("inv_compact").toString
    InvertedIndex.writeSegment(docs.filter(col("doc_id") % 2 === 0), idx, "s0")
    InvertedIndex.writeSegment(docs.filter(col("doc_id") % 2 === 1), idx, "s1")
    val phrase = Seq("table", "hash")
    val bucket = InvertedIndex.bucketOfLiteral(phrase.head)
    val before = InvertedIndex.phraseSearchAt(spark, idx, phrase, 20)
      .collect().map(_.toString).toSeq
    assert(before.nonEmpty)
    val (nBefore, nAfter) = SegmentCompaction.compactBucket(spark, idx, bucket)
    assert(nBefore >= 2 && nAfter === 1)
    val after = InvertedIndex.phraseSearchAt(spark, idx, phrase, 20)
      .collect().map(_.toString).toSeq
    assert(after === before, "phrase search changed across compaction")
  }
}
