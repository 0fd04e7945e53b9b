package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-bucket SEGMENT COMPACTION for the two-level `seg=…/bucket=…`
  * posting layouts ([[TrigramIndex.writeSegment]],
  * [[InvertedIndex.writeSegment]]) — the small-file follow-up the
  * quantized ANN tiers already have ([[Similarity.ivfCompactPartition]]):
  * after many crawl appends a hot bucket's postings are spread over one
  * file per segment, and per-file open/footer cost starts to dominate a
  * pruned read. Compaction folds exactly ONE bucket's rows — across
  * every segment — into a single file inside a fresh `seg=compact-…`
  * directory, then removes that bucket's original per-segment files.
  * Every other bucket's files are BYTE-UNTOUCHED (spec-pinned by path,
  * size, and modification time), so maintenance cost stays proportional
  * to the compacted bucket; the index's row multiset is unchanged, so
  * searches before ≡ after (partition discovery unions whatever
  * segments exist, and the bucket filter prunes directories the same
  * way in both layouts).
  *
  * Contract: a stop-the-world maintenance step, like
  * [[Similarity.ivfCompactPartition]] and [[Layout.compact]] — no
  * concurrent reader/writer during the swap. Publish order (compacted
  * file in under a NEW segment name first, originals deleted after)
  * means a crash in between leaves duplicate postings, which a re-run
  * repairs; no posting is ever lost.
  */
object SegmentCompaction {

  /** Fold bucket `bucket`'s postings from every `seg=…` directory into
    * one file; returns (data files before, data files after) for that
    * bucket. `bucket` is whatever the layout's partition value is — a
    * long (trigram hash buckets) or a string (the inverted index's
    * md5-hex buckets).
    *
    * `tombstones` (doc_id rows) is the forget cascade's physical-purge
    * hook ([[Forget]]): when set, the compacted bucket is rewritten
    * WITHOUT the tombstoned docs' postings — the Lucene `.del` model,
    * where logical deletes are anti-joined at probe time and the bytes
    * leave the index when routine per-bucket maintenance next touches
    * their bucket. Purge cost stays ∝ the compacted bucket; searches
    * are unaffected because the probe-time anti-join already hid the
    * purged rows (spec-pinned: search before ≡ after the purge).
    */
  def compactBucket(spark: SparkSession, path: String,
      bucket: Any, tombstones: Option[DataFrame] = None): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segDirs() = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
    def bucketFiles() = segDirs().flatMap { s =>
      val bp = new Path(s.getPath, s"bucket=$bucket")
      if (fs.exists(bp))
        fs.listStatus(bp).filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Array.empty[Path]
    }
    val originals = bucketFiles()
    require(originals.nonEmpty, s"no postings for bucket=$bucket under $path")
    // data-only schema (partition columns live in the directory names)
    val dataCols = spark.read.parquet(originals.head.toString).columns.toSeq
    val kept = spark.read.parquet(path)
      .filter(col("bucket") === lit(bucket)) // directory-pruned to this bucket
      .select(dataCols.map(col): _*)
    val rows = tombstones.fold(kept)(t =>
      kept.join(broadcast(t.select(col("doc_id"))), Seq("doc_id"), "left_anti"))
    val tmp = new Path(s"$path/.compact_tmp_bucket_$bucket")
    rows.coalesce(1).sortWithinPartitions(dataCols.map(col): _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val destDir = new Path(
      s"$path/seg=compact-${java.util.UUID.randomUUID().toString.take(8)}" +
        s"/bucket=$bucket")
    fs.mkdirs(destDir)
    fs.listStatus(tmp).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        val dest = new Path(destDir, s"compact-$i.parquet")
        require(fs.rename(f, dest), s"compaction publish failed: $f -> $dest")
      }
    originals.foreach(f => fs.delete(f, false))
    fs.delete(tmp, true)
    (originals.length, bucketFiles().length)
  }
}
