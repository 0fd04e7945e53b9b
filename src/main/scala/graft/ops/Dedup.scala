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

  /** Word n-gram shingles (distinct, first-occurrence order) of a text
    * column. Codegen'd custom expression — the equivalent
    * transform/slice/array_distinct HOF chain evaluates interpreted and
    * was the dominant cost of every shingle-based dedup op.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordShingles(text, n)

  /** Engine-portable 60-bit hash of a string: first 15 hex chars of md5. */
  /** Parallelism for a pair-keyed exchange whose downstream aggregate
    * is near-unique-keyed (one hash-map entry per row): grows with the
    * input's optimizer size estimate (~file bytes — free, no job) at
    * one partition per 256 KB of source, floored at the session's
    * shuffle parallelism (small inputs keep the measured-fast pinned
    * floor) and capped at 4096 (the tiny-task regime). Keeps per-task
    * aggregate maps around a million entries however big the corpus.
    */
  private[graft] def pairExchangeParallelism(df: DataFrame): Int = {
    val base = df.sparkSession.sessionState.conf.numShufflePartitions.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Catalyst reports ~Long.MaxValue (spark.sql.defaultSizeInBytes)
    // for relations it cannot size — e.g. some joins or non-file
    // sources. That is "unknown", not "huge": pinning 4096 partitions
    // off a sentinel would bury a small input in tiny-task overhead,
    // so unknown falls back to the session floor (where AQE still
    // rules the other exchanges).
    val byBytes =
      if (bytes.isValidLong && bytes.toLong < (1L << 50))
        bytes.toLong / (256L << 10)
      else base
    math.min(4096L, math.max(base, byBytes)).toInt
  }

  /** Parallelism for a RAW-ROW key exchange feeding an interpreted
    * stage (object aggregate + generator): same bytes-proportional
    * growth as [[pairExchangeParallelism]] but floored at a small
    * constant instead of the session's shuffle parallelism. Pinning an
    * explicit N here does two things AQE's coalescing would undo:
    * keeps the interpreted consumer stage parallel (a sub-advisory
    * shuffle otherwise coalesces to 1 task and serializes it —
    * measured 0.40 s → 0.27 s on q_winnow_pairs at sf0.1), and ships
    * raw rows instead of running a map-side ObjectHashAggregate
    * partial that combines ~nothing on near-unique keys while paying
    * the buffer build twice. The floor stays small because the raw
    * stream at tiny inputs is sub-MB — a session-parallelism-wide
    * exchange pays more in task waves than the extra cores buy.
    */
  private[graft] def streamExchangeParallelism(df: DataFrame,
      floor: Int = 8): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes =
      if (bytes.isValidLong && bytes.toLong < (1L << 50))
        bytes.toLong / (256L << 10)
      else df.sparkSession.sessionState.conf.numShufflePartitions.toLong
    math.min(4096L, math.max(floor.toLong, byBytes)).toInt
  }

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

  /** MinHash signatures, MAP-ONLY: the whole k-permutation signature is
    * one codegen'd kernel pass per document (graft.functions.MinHashSig)
    * — no shingle explode, no shuffle. The permutation constants are
    * minhashParams, shared with the DuckDB oracle; documents with no
    * shingles yield no row (null signature filtered), matching the
    * previous explode+groupBy formulation. Signature width k columns
    * (m0..m{k-1}).
    */
  def minHash(df: DataFrame, id: Column, text: Column, n: Int = 3,
      k: Int = 16): DataFrame = {
    val sig = graft.functions.GraftFunctions.minhashSig(text, n, k)
    df.select(id.as("doc_id"), sig.as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col("doc_id") +:
        (0 until k).map(i => col("__sig")(i).as(s"m$i")): _*)
  }

  /** LSH banding over a minhash signature: docs sharing any band's
    * signature are candidate pairs. bands·rowsPerBand must equal k.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  /** All (a, b) pairs with a < b from each group's id array: the
    * bucket-local pair generator shared by the LSH-style candidate ops
    * (LongPairs generator — C(|ds|,2) rows in O(|ds|) memory; the
    * explode×explode formulation materialized an O(|ds|²)-element
    * intermediate per bucket). Group sizes are bounded upstream
    * (bands/buckets/df-caps), so pair volume is O(Σ groupSize²) with
    * small groups — no all-rows self-join, no shuffle beyond the
    * caller's groupBy. `ids` must be array<bigint>.
    */
  private[graft] def pairsWithinGroups(grouped: DataFrame, ids: Column): DataFrame =
    grouped.select(graft.functions.GraftFunctions.longPairs(ids)
        .as(Seq("doc_a", "doc_b")))
      .distinct()

  /** (doc_id, band, bsig) banded relation of a minhash signature table —
    * one pass (array + posexplode), shared by the self- and cross-corpus
    * candidate generators.
    */
  private[graft] def bandSignatures(sig: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandSigs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      md5(concat_ws(":", cols: _*))
    }
    sig.select(col("doc_id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "bsig")))
  }

  def minHashLshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // One pass: band signatures as an array + posexplode — NOT a bands-way
    // union (which would recompute the upstream signature aggregation per
    // band). Pairs are generated within (band, bsig) buckets via
    // collect_list rather than a self-join: bucket occupancy is small by
    // LSH construction, and one aggregation replaces the join's two
    // shuffles of the full banded relation.
    val buckets = bandSignatures(sig, bands, rowsPerBand)
      .groupBy(col("band"), col("bsig"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) >= 2)
    pairsWithinGroups(buckets, col("ds"))
  }

  // ---------------------------------------------------- incremental dedup
  // The production ingest gate: dedupe an INCOMING batch against the
  // EXISTING corpus without ever comparing corpus×corpus. At 100 TB the
  // corpus sides below are the persisted artifact tables (content-hash /
  // band-signature tables maintained by LlmOps.dedupArtifacts-style
  // jobs), and the batch side is small — Spark broadcasts it, so the
  // corpus is never shuffled at all.

  /** Batch docs whose exact content already exists in the corpus.
    * Shuffle/broadcast payload is 32-byte digests only — never text.
    */
  def incrementalExactDups(batch: DataFrame, corpus: DataFrame,
      id: Column, text: Column): DataFrame =
    batch.select(id.as("doc_id"), sha2(text, 256).as("h"))
      .join(corpus.select(sha2(text, 256).as("h")), Seq("h"), "left_semi")
      .select(col("doc_id"))

  /** Candidate (batch, corpus) near-dup pairs via a cross-corpus band
    * join: each side is banded once, then equi-joined on (band, bsig).
    * Linear in each side — no batch×batch or corpus×corpus pairs.
    */
  def crossLshCandidates(batchSig: DataFrame, corpusSig: DataFrame,
      bands: Int, rowsPerBand: Int): DataFrame =
    bandSignatures(batchSig, bands, rowsPerBand)
      .select(col("doc_id").as("doc_a"), col("band"), col("bsig"))
      .join(bandSignatures(corpusSig, bands, rowsPerBand)
        .select(col("doc_id").as("doc_b"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

  /** Exact Jaccard verification of a candidate-pair relation: join each
    * side to its (distinct) shingle set and compare with array_intersect.
    * Work is O(candidates · doc-shingles) — the post-LSH shape where the
    * candidate set is already near-linear, so no inverted-index self-join
    * (and none of its shuffle) is needed at all.
    */
  def jaccardVerify(cand: DataFrame, df: DataFrame, id: Column, text: Column,
      n: Int, threshold: Double): DataFrame = {
    val sets = df.select(id.as("doc_id"), shingles(text, n).as("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 60-bit SimHash: per token, hash60 votes ±1 on each bit; signature
    * bit = sign of the vote sum. Codegen'd custom expression — map-only,
    * no shuffle; one md5 per token (the HOF formulation re-evaluated the
    * digest subtree per bit, interpreted).
    */
  def simHash(text: Column): Column =
    graft.functions.GraftFunctions.simhash60(text)

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Band layout for pigeonhole simhash search: `maxDist + 1` disjoint
    * bit ranges covering the 60-bit signature, sized as evenly as
    * possible. Any two signatures within hamming distance `maxDist`
    * differ in at most `maxDist` bands, so they agree EXACTLY on at
    * least one — banding is a lossless candidate generator (unlike
    * top-bits blocking, which misses pairs whose flipped bits land in
    * the block). Shared with the SQL oracle so both sides bucket
    * identically. Returns (shift, width) per band.
    */
  def simhashBands(maxDist: Int): Seq[(Int, Int)] = {
    val n = maxDist + 1
    require(n <= 60, s"maxDist $maxDist needs more bands than bits")
    val sizes = Array.tabulate(n)(i => 60 / n + (if (i < 60 % n) 1 else 0))
    sizes.scanLeft(0)(_ + _).zip(sizes).toSeq
  }

  /** SimHash near-dup pairs with a RECALL GUARANTEE: explode each
    * signature into its `maxDist + 1` pigeonhole bands (one row per
    * (band, value) — the minhash-LSH shape), self-join on band equality,
    * verify hamming ≤ maxDist, and de-duplicate pairs that collide in
    * several bands. Every true pair shares a band by pigeonhole, so the
    * output is exactly the brute-force pair set (property-tested).
    * Scale shape: one (band, value)-keyed exchange of (maxDist+1)×n
    * 16-byte rows; per-bucket occupancy is n/2^width per band — width
    * (via maxDist) is the occupancy lever, same as LSH band tuning.
    */
  def simHashPairs(df: DataFrame, id: Column, text: Column,
      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(id.as("doc_id"), simHash(text).as("sig"))
    val bandCols = simhashBands(maxDist).map { case (shift, width) =>
      shiftright(col("sig"), shift).bitwiseAND(lit((1L << width) - 1L))
    }
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    // Bucket-local enumeration, verify fused into the generator: ONE
    // (band, value)-keyed exchange of (maxDist+1)×n 16-byte rows, then
    // each bucket's C(m,2) candidates are popcount-checked WITHOUT
    // materializing non-pairs (the former banded self-join built ~9M
    // join rows for ~300k survivors at sf0.1 and spent the query's time
    // in join machinery, not hamming arithmetic). Bucket memory is
    // O(occupancy) — what the sort-merge join buffered per duplicate-key
    // run anyway; band width remains the occupancy lever at scale.
    banded.groupBy(col("band"), col("bv"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("entries"))
      .select(graft.functions.GraftFunctions
        .hammingSigPairs(col("entries"), maxDist)
        .as(Seq("doc_a", "doc_b", "dist")))
      // multi-band collisions emit the same pair repeatedly; the dedup
      // aggregate's keys are near-unique (same regime as the jaccard
      // pair count), so size its exchange with the corpus — at an
      // amplified corpus the verified-pair stream is tens of millions
      // of rows and the session-floor partition count packs the
      // per-task dedup maps into GC territory (x100: 17.1 s → 14.4 s
      // sized). Only pin when stats ask for MORE than the floor: at
      // small inputs an explicit repartition blocks AQE coalescing and
      // costs ~0.2 s for nothing (x1 measured). Partitioning on
      // (doc_a, doc_b) satisfies the distinct's clustering requirement
      // (dist is equal within a pair), so no second exchange appears.
      .transform { pairs =>
        val n = pairExchangeParallelism(df)
        val base = df.sparkSession.sessionState.conf.numShufflePartitions
        if (n > base) pairs.repartition(n, col("doc_a"), col("doc_b"))
        else pairs
      }
      .distinct()
  }

  // ------------------------------------------------------- ngram jaccard

  /** Exact n-gram Jaccard similarity for all pairs above `threshold`,
    * via an inverted shingle index: explode distinct shingles, build
    * cap-bounded posting lists per shingle hash, enumerate pairs
    * bucket-locally, count intersections — with each doc's
    * distinct-shingle count RIDING THE POSTING ENTRIES, so the Jaccard
    * denominator is computed inline at the pair aggregate and no
    * per-doc count table is ever joined back onto the (much larger)
    * pair stream.
    *
    * `maxDocFreq` drops shingles present in more than that many docs
    * (stop-shingles) — the standard guard against quadratic blowup on a
    * hot shingle at scale; near-dup pairs share RARE shingles too, so
    * recall for high thresholds is unaffected in practice. The UNION
    * (denominator) deliberately counts ALL of a doc's distinct
    * shingles, including dropped stop-shingles: that is the true
    * shingle-set union, making the reported jaccard a slight
    * UNDER-estimate for pairs whose overlap includes stop-shingles
    * (conservative — a pair never gains similarity from the cap; an
    * earlier formulation excluded stop-shingles from the denominator
    * too, which could inflate). On corpora without stop-shingles the
    * two definitions agree exactly (the test corpora's max doc-freq is
    * 25 at sf0.1 vs the 1000 cap — oracle-pinned either way).
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column, n: Int = 3,
      threshold: Double = 0.1, maxDocFreq: Long = 1000): DataFrame =
    ngramPairCounts(df, id, text, n, maxDocFreq)
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "jaccard")

  /** Exact n-gram CONTAINMENT (overlap coefficient) for all pairs above
    * `threshold`: inter / min(n_a, n_b). Where Jaccard punishes size
    * asymmetry, containment detects the SUBSET-duplication web data is
    * full of — a page whose text is another page plus boilerplate, a
    * document embedded verbatim inside a larger one — which sits far
    * below any useful Jaccard threshold (a doc 10× the size of the one
    * it contains caps Jaccard at ~0.1 while containment reads 1.0).
    * Same joinless posting shape as [[ngramJaccardPairs]]: 2 exchanges,
    * 0 joins at every scale; only the final scalar differs. The cap's
    * conservatism flips direction here: dropped stop-shingles can only
    * LOWER inter while min(n_a,n_b) counts all distinct shingles, so a
    * containment score is likewise never inflated by the cap.
    */
  def ngramContainmentPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Long = 1000): DataFrame =
    ngramPairCounts(df, id, text, n, maxDocFreq)
      .withColumn("containment",
        col("inter").cast(DoubleType) /
          least(col("n_a"), col("n_b")).cast(DoubleType))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "inter", "containment")

  /** Shared pair-intersection core of the n-gram similarity family:
    * (doc_a, n_a, doc_b, n_b, inter) for every candidate pair sharing
    * ≥1 surviving shingle, with each side's distinct-shingle count
    * riding along. The similarity faces differ only in the final scalar
    * (Jaccard: inter/(n_a+n_b−inter); containment: inter/min(n_a,n_b)).
    */
  private[graft] def ngramPairCounts(df: DataFrame, id: Column, text: Column,
      n: Int, maxDocFreq: Long): DataFrame = {
    // Shape chosen for the 100 TB case — TWO exchanges total:
    //  - shingles travel as 60-bit md5-derived hashes (8-byte shuffle
    //    keys; collisions ~n²/2^61 — immaterial, and the hash definition
    //    is shared with the oracle);
    //  - ONE partial-aggregated exchange on h builds the inverted index:
    //    graft.functions.BoundedPostings counts exact doc-freq while
    //    capping the buffered list at maxDocFreq+1 entries, so a hot
    //    stop-shingle never materializes an unbounded posting list and
    //    its (truncated) list is discarded by the df filter — the
    //    previous count → anti-join → collect_list plan paid two extra
    //    exchanges and a second scan of the exploded shingles for the
    //    same guarantee;
    //  - each posting entry carries the doc's distinct-shingle count
    //    (size of the scan-time shingle array — the codegen'd kernel
    //    emits distinct shingles, so no extra pass), and the
    //    LongPairsWeighted generator emits it with every pair, so the
    //    ONE pair-keyed exchange feeds an aggregate that finishes the
    //    jaccard inline. The former per-doc count table cost a third
    //    exchange to build and TWO more (plus sorts of the ~300M-row
    //    amplified pair stream) to join back — measured x100: 5
    //    exchanges / 22.3 s before, 2 exchanges after;
    //  - intersections come from bucket-local pair enumeration over the
    //    surviving posting lists (bounded by maxDocFreq) — C(|ds|,2)
    //    rows in O(|ds|) memory, not the |ds|²-element explode×explode
    //    intermediate, and never a self-equi-join of the full index.
    // `id` must be a bigint column (the posting aggregator is typed).
    // the shingle+hash step is ONE fused kernel call per document
    // (WordShingleHashes): the exploded rows are bare longs, so the
    // md5-hex/conv built-in chain and per-shingle UTF8String rows never
    // exist — measured ~2× on the scan stage, which a single-row-group
    // input runs serialized
    // explode_outer, NOT explode: plain explode's implicit
    // (size(gen) > 0 AND isnotnull(gen)) guard is pushed into the scan
    // filter with the GENERATOR EXPRESSION INLINED — the kernel then
    // runs 3× per row (twice in the filter, once in the project;
    // measured 1.0 s → 0.6 s on this stage at sf0.1). explode_outer
    // plans no guard, the kernel evaluates once into the `hs`
    // attribute, and the one null `h` row an empty array emits is
    // dropped by an attribute-only filter.
    val posts =
      df.select(id.as("doc_id"),
          graft.functions.GraftFunctions.wordShingleHashes(text, n).as("hs"))
        .select(col("doc_id"),
          size(col("hs")).cast(LongType).as("n_sh"),
          explode_outer(col("hs")).as("h"))
        .filter(col("h").isNotNull)
        .groupBy("h")
        .agg(graft.functions.GraftFunctions
          .boundedPostings(col("doc_id"), col("n_sh"), maxDocFreq.toInt)
          .as("p"))
        .filter(col("p.df") <= maxDocFreq)
        .select(col("p.ids").as("ds"), col("p.ws").as("ns"))
    val inter = posts
      .filter(size(col("ds")) >= 2)
      .select(graft.functions.GraftFunctions
        .longPairsWeighted(col("ds"), col("ns"))
        .as(Seq("doc_a", "n_a", "doc_b", "n_b")))
      // pair keys are near-unique (most candidate pairs share exactly
      // one shingle), so partial aggregation combines almost nothing and
      // the exchange ships ~every pair — and AQE then coalesces the
      // "small" shuffle to a handful of partitions, strangling the final
      // aggregate's parallelism right where the row count EXPLODES
      // relative to the input. Pin the pair exchange explicitly (an
      // explicit N disables AQE coalescing for this exchange only;
      // measured 1.8× on this stage) — and GROW it with the corpus:
      // the aggregate after this exchange holds one hash-map entry per
      // distinct pair in its partition, so at the session floor an
      // amplified corpus packs ~12M entries per task (a GC wall at
      // default executor memory; x100 measured 62 s at 8 g vs 22.6 s at
      // 32 g from exactly this). Size from the scan's optimizer stats
      // (file bytes — free, no extra job): pair volume tracks corpus
      // volume when duplicate structure is replica-proportional. The
      // session floor still rules small inputs; 4096 caps the tiny-task
      // regime at the top.
      .repartition(pairExchangeParallelism(df), col("doc_a"), col("doc_b"))
      // n_a/n_b are functionally dependent on doc_a/doc_b, so adding
      // them to the grouping changes nothing but lets the aggregate
      // output them without a join or a first()
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
    inter
  }
}
