package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** The composed e2e ingest gate (q_ingest_gate_e2e): verdict semantics,
  * gate precedence, and the artifact REFRESH the admitted batch
  * produces (digests_refreshed / clusters_refreshed) pinned against
  * from-scratch recomputation — the oracle face checks the verdicts,
  * this spec checks the side of the pipeline the oracle can't see.
  */
class IngestGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every batch doc gets exactly one verdict; gates are disjoint by precedence") {
    val v = LlmOps.ingestGateE2e(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val batchSize = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0).count() +
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 20 === 5).count()
    assert(v.length.toLong === batchSize)
    assert(v.map(_._1).distinct.length === v.length, "duplicate verdict rows")
    // re-crawled corpus copies carry identical text — the exact gate
    // must catch every one of them (precedence: nothing else may)
    v.filter(_._1 >= 1000000L).foreach { case (id, verdict) =>
      assert(verdict === "dup_exact", s"re-crawl $id got $verdict")
    }
    assert(v.exists(_._2 === "admitted"))
  }

  test("digests_refreshed = corpus digests ∪ admitted batch digests, exactly") {
    val g = LlmOps.ingestArtifacts(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val verdicts = LlmOps.ingestGateE2e(spark, dir)
    val admittedIds = verdicts.filter(col("verdict") === "admitted")
      .select("doc_id")
    // admitted ids are all < 1000000 (re-crawls are exact dups), so the
    // admitted text is recoverable from documents directly
    val want = docs.filter(col("doc_id") % 10 =!= 0)
      .select(sha2(col("text"), 256).as("h"))
      .unionByName(docs.join(admittedIds, Seq("doc_id"), "left_semi")
        .select(sha2(col("text"), 256).as("h")))
      .distinct().collect().map(_.getString(0)).toSet
    val got = spark.read.parquet(s"$g/digests_refreshed")
      .collect().map(_.getString(0)).toSet
    assert(got === want)
  }

  test("clusters_refreshed ≡ from-scratch components over corpus ∪ batch pairs") {
    val g = LlmOps.ingestArtifacts(spark, dir)
    val refreshed = spark.read.parquet(s"$g/clusters_refreshed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild: corpus-internal LSH pairs (the clusters_corpus input) ∪
    // the batch's verified cross pairs, one fresh run()
    val art = LlmOps.dedupArtifacts(spark, dir)
    val corpusMap = spark.read.parquet(s"$art/clusters_corpus")
    val corpusEdges = corpusMap
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("doc_a"), col("root").as("doc_b"))
    // the staged refresh used verifiedBatchPairs (composed batch,
    // incl. re-crawl offsets); rebuild with the same pair set
    val composedPairs = LlmOps.verifiedBatchPairs(spark, dir, g)
      .select(col("doc_a"), col("doc_b"))
    val rebuilt = ConnectedComponents.run(
        corpusEdges.unionByName(composedPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merge preserves externally-supplied singletons that run() never
    // emits; on shared vertices the maps must agree exactly
    val shared = refreshed.keySet intersect rebuilt.keySet
    assert(shared.nonEmpty)
    shared.foreach { id =>
      assert(refreshed(id) === rebuilt(id),
        s"vertex $id: refreshed root ${refreshed(id)} != rebuilt ${rebuilt(id)}")
    }
    // every rebuilt vertex exists in the refreshed map (nothing dropped)
    assert(rebuilt.keySet.subsetOf(refreshed.keySet))
  }

  // (accessors removed — verifiedBatchPairs is private[graft])

  test("a long shared span inside a much larger doc is caught by the WINNOW gate only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("gate_docs").toString
    val rng = new scala.util.Random(11)
    def prose(n: Int, tag: String) =
      (1 to n).map(i => s"$tag${rng.nextInt(100000)}").mkString(" ")
    val span = (1 to 12).map(i => s"shared$i").mkString(" ")
    // corpus doc 1: the span plus its own prose; batch doc 10 (% 10 == 0):
    // the same span buried in 8x more unique prose — jaccard « 0.5 so
    // the LSH gate must NOT fire, content hash differs so exact must
    // not, but winnowing's >= n+w-1-token guarantee catches the span
    val corpusDoc = span + " " + prose(30, "c")
    val batchDoc = prose(120, "a") + " " + span + " " + prose(120, "b")
    Seq(
      (1L, corpusDoc, "en", "src1", corpusDoc.length.toLong),
      (3L, prose(40, "z"), "en", "src3", 40L),
      (10L, batchDoc, "en", "src10", batchDoc.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // empty embeddings table => semantic gate cannot fire
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(0).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val v = LlmOps.ingestGateE2e(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(10L) === "dup_winnow", s"got ${v.mkString(", ")}")
  }
}
