package graft.ops

import java.security.MessageDigest

import graft.SparkSpec
import graft.queries.LlmOps

class WinnowSpec extends SparkSpec {

  private val (n, w) = (5, 4)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side reference winnow: positional n-gram 60-bit md5 hashes,
    * min over every w-window (right-edge partial windows kept), distinct.
    */
  private def refFingerprints(text: String): Set[Long] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.length < n) return Set.empty
    val hashes = (0 to toks.length - n).map { i =>
      java.lang.Long.parseLong(md5hex(toks.slice(i, i + n).mkString(" ")).take(15), 16)
    }
    hashes.indices.map(i => hashes.slice(i, math.min(i + w, hashes.length)).min).toSet
  }

  test("winnowPairs n_shared equals the brute-force shared-fingerprint count (sf0.001)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fps = docs.map { case (id, t) => id -> refFingerprints(t) }
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b
      shared = (fa intersect fb).size
      if shared >= 2
    } yield (a, b) -> shared.toLong).toMap
    val got = LlmOps.winnowPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("winnowing guarantee: a shared token run of >= n+w-1 tokens always shares a fingerprint") {
    // Two documents agreeing only on an (n+w-1)-token run, surrounded by
    // disjoint noise — the paper's guarantee threshold, exactly met.
    val run = (1 to n + w - 1).map(i => s"shared$i").mkString(" ")
    val docA = s"alpha beta gamma delta epsilon $run zeta eta theta iota kappa"
    val docB = s"one two three four five $run six seven eight nine ten"
    val (fa, fb) = (refFingerprints(docA), refFingerprints(docB))
    assert((fa intersect fb).nonEmpty, "guarantee violated by the reference impl")

    // and the Spark path agrees: run the query face over a synthetic
    // documents table holding exactly these two docs
    val dir = java.nio.file.Files.createTempDirectory("winnow_docs").toString
    spark.createDataFrame(Seq(
        (0L, docA, "en", "syn", docA.length.toLong),
        (1L, docB, "en", "syn", docB.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmOps.winnowPairs(spark, dir, minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq((0L, 1L)))
    assert(got.head._2 === (fa intersect fb).size.toLong)
  }

  test("winnowIncrPairs: exactly the batch-x-corpus slice of the brute-force pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fps = docs.map { case (id, t) => id -> refFingerprints(t) }
    val expected = (for {
      (a, fa) <- fps if a % 10 == 0
      (b, fb) <- fps if b % 10 != 0
      shared = (fa intersect fb).size
      if shared >= 2
    } yield (a, b) -> shared.toLong).toMap
    val got = LlmOps.winnowIncrPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("fingerprint density: ~2/(w+1) of the gram stream, never above 2x that") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val (nFps, nGrams) = docs.foldLeft((0, 0)) { case ((f, g), t) =>
      val grams = math.max(0, t.trim.split("\\s+").length - n + 1)
      (f + refFingerprints(t).size, g + grams)
    }
    val density = nFps.toDouble / nGrams
    assert(density <= 2.0 * 2.0 / (w + 1),
      s"fingerprint density $density vs expected ~${2.0 / (w + 1)}")
  }
}
