package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The forget cascade: tombstoned artifacts must answer exactly as the
  * same artifacts rebuilt from the filtered corpus; the physical purge
  * rides per-bucket compaction without changing any search; and the
  * digest retraction flips ingest admissions in both directions.
  */
class ForgetSpec extends SparkSpec {

  private def docs = graft.Tables.load(spark, sf, "documents")

  test("tombstoned index search ≡ search over an index rebuilt from the filtered corpus") {
    val kept = docs.filter(col("doc_id") % 23 =!= 5)
    val rebuilt = java.nio.file.Files.createTempDirectory("forget_rebuild").toString
    TrigramIndex.writeSegment(kept.filter(col("doc_id") % 20 =!= 0), rebuilt, "base")
    TrigramIndex.writeSegment(kept.filter(col("doc_id") % 20 === 0), rebuilt, "d1")
    val expected = TrigramIndex.likeScanAt(spark, sf, rebuilt)
      .collect().map(_.toString).toSeq
    val got = Forget.forgetIndex(spark, sf).collect().map(_.toString).toSeq
    assert(got === expected)
  }

  test("the forget genuinely bites: candidate counts drop vs the un-tombstoned index") {
    val idx = TrigramIndex.stagedIncremental(spark, sf)
    val before = TrigramIndex.likeScanAt(spark, sf, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Forget.forgetIndex(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    assert(after.forall { case (p, n) => n <= before(p) },
      "tombstoning must never ADD candidates")
    assert(after.exists { case (p, n) => n < before(p) },
      s"no pattern lost a candidate — the tombstone set missed every posting ($before)")
  }

  test("physical purge rides compaction: tombstoned bytes leave the bucket, search invariant") {
    val idx = java.nio.file.Files.createTempDirectory("forget_purge").toString
    TrigramIndex.writeSegment(docs.filter(col("doc_id") % 2 === 0), idx, "s0")
    TrigramIndex.writeSegment(docs.filter(col("doc_id") % 2 === 1), idx, "s1")
    val ts = Forget.tombstones(spark, sf)
    val tsIds = ts.collect().map(_.getLong(0)).toSet
    val bucket = spark.read.parquet(idx).groupBy("bucket").count()
      .orderBy(col("count").desc).head.getAs[Number]("bucket").longValue
    val before = TrigramIndex.likeScanAt(spark, sf, idx, Some(ts))
      .collect().map(_.toString).toSeq
    val hadTombstoned = spark.read.parquet(idx)
      .filter(col("bucket") === bucket && col("doc_id").isin(tsIds.toSeq: _*))
      .count()
    assert(hadTombstoned > 0, "test bucket carries no tombstoned postings — pick another")
    SegmentCompaction.compactBucket(spark, idx, bucket, Some(ts))
    val left = spark.read.parquet(idx)
      .filter(col("bucket") === bucket && col("doc_id").isin(tsIds.toSeq: _*))
      .count()
    assert(left === 0L, s"$left tombstoned postings survived the purge")
    val after = TrigramIndex.likeScanAt(spark, sf, idx, Some(ts))
      .collect().map(_.toString).toSeq
    assert(after === before, "tombstoned search changed across the physical purge")
  }

  test("IVF delete: touched lists only, delete ≡ rebuild from the filtered corpus, frozen centroids") {
    import org.apache.hadoop.fs.Path
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val centroids = graft.queries.LlmOps.fittedCentroids(spark, sf)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssign(df, col("vec_id"), col("embedding"), centroids)
    val idx = java.nio.file.Files.createTempDirectory("ivf_forget").toString
    Similarity.ivfWriteIndex(assign(emb), idx)
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def census(exclude: Set[Int]) = fs.listStatus(new Path(idx))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid="))
      .filterNot(s => exclude.contains(s.getPath.getName.stripPrefix("centroid=").toInt))
      .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile))
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    val tombAssigned = assign(emb.filter(col("vec_id") % 23 === 5))
    val expectTouched = tombAssigned.select("centroid").distinct()
      .collect().map(_.getInt(0)).toSet
    val othersBefore = census(expectTouched)
    val touched = Similarity.ivfDeletePartitioned(spark, idx, tombAssigned)
    assert(touched.toSet === expectTouched)
    assert(census(expectTouched) === othersBefore,
      "an untouched inverted list's files changed")
    // delete ≡ rebuild: row multiset identical to an index built from
    // the filtered corpus with the same frozen centroids
    val after = spark.read.parquet(idx).select("vec_id", "centroid")
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = assign(emb.filter(col("vec_id") % 23 =!= 5))
      .select("vec_id", "centroid")
      .collect().map(_.toString).sorted.toSeq
    assert(after === rebuilt)
    // and the probe answers as if the vectors never existed
    val got = Similarity.ivfSearchIndexed(spark, idx, centroids,
      graft.queries.LlmOps.queryVector(spark, sf), k = 10)
      .collect().map(_.toString).toSeq
    val rebuiltIdx = java.nio.file.Files.createTempDirectory("ivf_rebuild").toString
    Similarity.ivfWriteIndex(assign(emb.filter(col("vec_id") % 23 =!= 5)), rebuiltIdx)
    val expected = Similarity.ivfSearchIndexed(spark, rebuiltIdx, centroids,
      graft.queries.LlmOps.queryVector(spark, sf), k = 10)
      .collect().map(_.toString).toSeq
    assert(got === expected)
  }

  test("tombstoned sig probe ≡ LSH gate over signatures rebuilt from the filtered corpus, and the forget bites") {
    val got = Forget.forgetSigs(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    // rebuild: the same gate with corpus signatures derived from the
    // filtered corpus directly (no artifact, no tombstones)
    val batchSig = Dedup.minHash(docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), n = 3, k = 16)
    val keptSig = Dedup.minHash(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 23 =!= 5),
      col("doc_id"), col("text"), n = 3, k = 16)
    val expected = Dedup.jaccardVerify(
        Dedup.crossLshCandidates(batchSig, keptSig, bands = 4, rowsPerBand = 4),
        docs, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expected)
    // and the tombstones genuinely remove a pair vs the un-forgotten gate
    val before = graft.queries.LlmOps.dedupIncrementalLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = Forget.forgetSigs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.subsetOf(before), "tombstoning must never ADD pairs")
    assert(before.exists(_._2 % 23 == 5) && !after.exists(_._2 % 23 == 5)
      && after.size < before.size,
      s"the forget never bit (before=$before after=$after) — pick tombstones that hit a pair")
  }

  test("tombstoned winnow probe ≡ winnow gate over fingerprints rebuilt from the filtered corpus, and the forget bites") {
    import graft.functions.GraftFunctions.winnowHashes
    val got = Forget.forgetWinnow(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val fpsOf = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      explode(winnowHashes(col("text"), 5, 4)).as("fp"))
    val expected = fpsOf(docs.filter(col("doc_id") % 10 === 0)).as("a")
      .join(fpsOf(docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 23 =!= 5)).as("b"),
        col("a.fp") === col("b.fp"))
      .groupBy(col("a.doc_id").as("doc_batch"), col("b.doc_id").as("doc_corpus"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expected)
    val before = graft.queries.LlmOps.winnowIncrPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = Forget.forgetWinnow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.subsetOf(before) && after.size < before.size
      && !after.exists(_._2 % 23 == 5),
      s"the forget never bit (before=$before after=$after)")
  }

  test("tombstoned phrase search ≡ search over a positional index rebuilt from the filtered corpus, and the forget bites") {
    val kept = docs.filter(col("doc_id") % 23 =!= 5)
    val rebuilt = java.nio.file.Files.createTempDirectory("forget_pindex").toString
    InvertedIndex.writeSegment(kept.filter(col("doc_id") % 20 =!= 0), rebuilt, "base")
    InvertedIndex.writeSegment(kept.filter(col("doc_id") % 20 === 0), rebuilt, "d1")
    val expected = InvertedIndex.phraseSearchAt(spark, rebuilt,
      Seq("table", "hash"), 20).collect().map(_.toString).toSeq
    val got = Forget.forgetPostings(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got === expected)
    val before = InvertedIndex.phraseSearchIncr(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(before.exists(_ % 23 == 5),
      "no tombstoned doc in the un-forgotten top-20 — the bite check is vacuous")
    assert(!got.isEmpty && Forget.forgetPostings(spark, sf)
      .collect().forall(_.getLong(0) % 23 != 5),
      "a forgotten doc surfaced through the tombstoned index")
  }

  test("sig-artifact purge rides compaction: tombstoned rows leave the bucket, others byte-untouched, probe invariant") {
    import org.apache.hadoop.fs.Path
    val idx = Forget.stagedSigs(spark, sf)
    val ts = Forget.tombstones(spark, sf)
    val tsIds = ts.collect().map(_.getLong(0)).toSet
    val bucket = spark.read.parquet(idx)
      .filter(col("doc_id").isin(tsIds.toSeq: _*))
      .groupBy("bucket").count().orderBy(col("count").desc)
      .head.getAs[Number]("bucket").longValue
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def otherFiles() = fs.listStatus(new Path(idx))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
      .flatMap(s => fs.listStatus(s.getPath).filter(_.isDirectory))
      .filterNot(_.getPath.getName == s"bucket=$bucket")
      .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile))
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .sortBy(_._1).toSeq
    val before = Forget.forgetSigs(spark, sf).collect().map(_.toString).sorted.toSeq
    val othersBefore = otherFiles()
    SegmentCompaction.compactBucket(spark, idx, bucket, Some(ts))
    assert(spark.read.parquet(idx)
      .filter(col("bucket") === bucket && col("doc_id").isin(tsIds.toSeq: _*))
      .count() === 0L, "tombstoned sig rows survived the purge")
    assert(otherFiles() === othersBefore, "an untouched bucket's files changed")
    val after = Forget.forgetSigs(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(after === before, "tombstoned sig probe changed across the physical purge")
  }

  test("digest retraction: forgotten re-crawls admitted unless a retained copy blocks them; retained re-crawls stay blocked") {
    val rows = Forget.forgetDedup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (fN, fPre, fPost, fAdm) = rows("recrawl_forgotten")
    val (rN, rPre, rPost, rAdm) = rows("recrawl_retained")
    assert(fPre === fN, "every forgotten doc's own digest must block it pre-forget")
    assert(fAdm > 0, "retraction admitted nothing — the gate never loosened")
    assert(fAdm === fN - fPost)
    // dup_post for the forgotten class = docs whose text survives in a
    // RETAINED doc — recomputed independently
    val expectedBlocked = docs.filter(col("doc_id") % 23 === 5).select(sha2(col("text"), 256).as("h"))
      .join(docs.filter(col("doc_id") % 23 =!= 5).select(sha2(col("text"), 256).as("h")).distinct(),
        Seq("h"), "left_semi")
      .count()
    assert(fPost === expectedBlocked,
      "forgetting one copy must not unblock text a retained doc still carries")
    assert(rPre === rN && rPost === rN && rAdm === 0L,
      "forgetting unrelated docs loosened the gate for retained content")
  }
}
