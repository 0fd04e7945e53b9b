package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, each designed
  * around its 100 TB shuffle shape:
  *
  *  - exact:    group by sha256(text) — the shuffle key is a 32-byte
  *              digest, never the document body, so shuffle volume is
  *              O(rows·32B) regardless of document size.
  *  - minhash:  shingle → k permuted min-hashes → LSH banding; candidate
  *              pairs come from joining on (band, band-signature), i.e.
  *              equality joins Spark shuffles/broadcasts well. No O(n²).
  *  - simhash:  per-doc 60-bit signature from token-hash bit votes;
  *              near-dup = small hamming distance within blocking keys.
  *  - ngram:    exact Jaccard via an inverted shingle index (explode +
  *              self-equi-join), with a document-frequency cap so a hot
  *              shingle can't quadratically blow up the join.
  *
  * All hashing derives from md5/sha2 built-ins, so every signature here
  * is reproducible by any engine (and by the DuckDB oracle).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: one row per distinct text, keeper = min id. */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("text_hash"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (distinct) of a text column, as an array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(filter(
      transform(toks, (_, i) => when(i <= size(toks) - n,
        concat_ws(" ", slice(toks, i + 1, lit(n))))),
      s => s.isNotNull))
  }

  /** Engine-portable 60-bit hash of a string: first 15 hex chars of md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  // -------------------------------------------------------------- minhash

  /** Fixed (a, b) parameters for the k min-hash permutations
    * h_i(x) = (a_i·(x mod p) + b_i) mod p, p = 2^31-1. Deterministic,
    * engine-portable (a·(x mod p) < p² fits in int64).
    */
  val minhashP: Long = 2147483647L
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 3L, 104729L * (i + 1) % minhashP))

  /** MinHash signatures: explode shingles, one min-aggregation per
    * permutation. One shuffle on doc id; signature width k columns
    * (m0..m{k-1}).
    */
  def minHash(df: DataFrame, id: Column, text: Column, n: Int = 3,
      k: Int = 16): DataFrame = {
    val exploded = df.select(id.as("doc_id"),
      explode(shingles(text, n)).as("shingle"))
      .withColumn("h", pmod(hash60(col("shingle")), lit(minhashP)))
    val aggs = minhashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(minhashP))).as(s"m$i")
    }
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature: docs sharing any band's
    * signature are candidate pairs. bands·rowsPerBand must equal k.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  def minHashLshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      sig.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws(":", cols: _*)).as("bsig"))
    }.reduce(_ unionAll _)
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bsig") === col("r.bsig") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  // -------------------------------------------------------------- simhash

  /** 60-bit SimHash: per token, hash60 votes ±1 on each bit; signature
    * bit = sign of the vote sum. Computed entirely inside one aggregate
    * expression over the token array — NO shuffle, map-only.
    */
  def simHash(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 60),
      (acc, t) => {
        val h = hash60(t)
        transform(acc, (v, i) =>
          v + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
      })
    aggregate(
      transform(votes, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the top `blockBits` bits (near
    * dups almost always share them), then filter by hamming ≤ maxDist
    * within blocks. Blocking keeps the self-join linear-ish at scale.
    */
  def simHashPairs(df: DataFrame, id: Column, text: Column,
      maxDist: Int = 3, blockBits: Int = 12): DataFrame = {
    val sigs = df.select(id.as("doc_id"), simHash(text).as("sig"))
      .withColumn("block", shiftright(col("sig"), 60 - blockBits))
    val l = sigs.as("l"); val r = sigs.as("r")
    l.join(r, col("l.block") === col("r.block") &&
        col("l.doc_id") < col("r.doc_id"))
      .filter(hamming(col("l.sig"), col("r.sig")) <= maxDist)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        hamming(col("l.sig"), col("r.sig")).as("dist"))
  }

  // ------------------------------------------------------- ngram jaccard

  /** Exact n-gram Jaccard similarity for all pairs above `threshold`,
    * via an inverted shingle index: explode distinct shingles, self-join
    * on shingle (equality join — hash-partitioned, no cross product),
    * count intersections, derive the union from per-doc shingle counts.
    *
    * `maxDocFreq` drops shingles present in more than that many docs
    * (stop-shingles) — the standard guard against quadratic blowup on a
    * hot shingle at scale; near-dup pairs share RARE shingles too, so
    * recall for high thresholds is unaffected in practice.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column, n: Int = 3,
      threshold: Double = 0.1, maxDocFreq: Long = 1000): DataFrame = {
    val sh = df.select(id.as("doc_id"), explode(shingles(text, n)).as("shingle"))
    val filtered = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq).select("shingle"),
      Seq("shingle"))
    val counts = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val l = filtered.as("l"); val r = filtered.as("r")
    val inter = l.join(r, col("l.shingle") === col("r.shingle") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "jaccard")
  }
}
