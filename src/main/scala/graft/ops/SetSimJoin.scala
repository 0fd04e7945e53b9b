package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** EXACT set-similarity self-join with prefix filtering (PPJoin family,
  * Xiao et al. WWW 2008; Chaudhuri et al.'s SSJoin prefix filter) — the
  * exact counterpart to the MinHash-LSH tier in [[Dedup]]: LSH finds
  * near-dup CANDIDATES probabilistically (a banded trade of recall for
  * candidate count); this operator returns EVERY pair with Jaccard ≥ τ,
  * no false negatives, which is what a contractual dedup guarantee
  * ("no two retained docs share ≥ half their vocabulary") needs.
  *
  * Prefix-filter theorem: order every doc's token set by ONE global
  * total order (rarest-first: ascending document frequency, ties by
  * token). If Jaccard(A,B) ≥ τ then A and B must collide inside their
  * PREFIXES of length |X| − ⌈τ·|X|⌉ + 1 — so the candidate join runs
  * only on exploded prefixes, and rarest-first ordering makes those
  * prefix tokens the LOW-df ones: postings lists of the join are the
  * short tails of the vocabulary, never the stopword heads. A size
  * filter (min/max ≥ τ, integer cross-multiplied) prunes the rest.
  *
  * POSITIONAL filter (PPJoin's second lever, applied per match row
  * BEFORE the pair exchange): a collision at prefix positions
  * (p_a, p_b) can witness an overlap of at most
  * min(|A|−p_a, |B|−p_b) + 1 (the token itself plus the two
  * suffixes), while Jaccard ≥ τ needs overlap ≥ α =
  * ⌈τ(|A|+|B|)/(1+τ)⌉. Every qualifying pair's FIRST common prefix
  * token satisfies the bound (nothing common precedes it), so rows
  * failing it can be dropped wholesale with zero false negatives —
  * this is what keeps the candidate exchange proportional to true
  * near-pairs when the corpus has moderately-hot shingles even in its
  * rare tails (template-generated text does). α is integer-exact:
  * floor((num·(sa+sb) + num+den−1)/(num+den)).
  *
  * Verification is candidate-pair-sized AND row-local: each surviving
  * pair joins to its two docs' collected token-set ARRAYS and the exact
  * intersection is one in-row array_intersect — the exchanges carry
  * only the compact pair list and the doc-keyed set table; the wide
  * (pair × two sets) rows exist solely in-flight between a join and a
  * filter, never in a shuffle. (The first cut exploded every pair back
  * to per-token rows — candidate×|doc| rows through two exchanges,
  * ~50 GB of spill at the x100 amplification for the same answer.)
  *
  * Scale shape: tf/df aggregates are map-side combined; the per-doc
  * prefix position is a doc-keyed window (each doc sorts only its own
  * tokens); the candidate join is token-keyed on low-df postings (the
  * quadratic term is Σ_rare df², bounded by design — the same reason
  * the rare-anchor longest-span plan holds); the verify joins are
  * candidate×doc-size. The oracle deliberately runs the UNFILTERED
  * shared-token plan (all-pairs on postings) — same result, the
  * quadratic formulation the prefix filter exists to beat.
  */
object SetSimJoin {

  /** All pairs (doc_a < doc_b) with Jaccard ≥ tNum/tDen over `tokens` =
    * the DISTINCT (doc_id, token) relation. Returns (doc_a, doc_b,
    * inter, union_sz, jaccard) with the threshold test done in exact
    * integer arithmetic and jaccard as one final rounded division.
    */
  def ppjoin(tokens: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val toks = CacheBin.pin(tokens.select(col("doc_id"), col("token")))
    // Duplicate-input robustness with ZERO extra exchanges: sz and
    // array_intersect are only correct over DISTINCT per-doc token
    // sets, so docArr dedups IN-ROW — collect_LIST (array-buffer
    // state, the cheap aggregate), then the sort the kernel already
    // pays makes duplicates adjacent, and one filter HOF drops them
    // (x != arr[i-1]). An up-front .distinct() would cost a full extra
    // exchange — measured +0.9 s on q_ssjoin_incr at sf0.1 — and the
    // r15 collect_SET form paid the per-row set-state insert on every
    // token (the r15 board's only all-window >2× cell, 2.04 s vs
    // r14's 1.13 s). The df counts may be inflated by duplicated
    // inputs, which is harmless: the prefix/positional theorems need
    // ONE total (df, token) order applied to both sides, not exact
    // frequencies. The house shingle kernel already emits distinct
    // tokens, so for those callers the filter keeps everything.
    val dfs = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // ONE doc-keyed collect carries the whole per-doc state: the
    // rarest-first order is an IN-ROW sort_array over (df, token)
    // structs (each doc sorts only its own tokens — replacing a
    // corpus-wide window sort + a sizes join with one aggregate), and
    // the same table feeds both the prefix explode and the verify
    // sets.
    val docArr = CacheBin.pin(toks.join(dfs, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("arr0"))
      .withColumn("arr",
        expr("filter(arr0, (x, i) -> i = 0 OR x != arr0[i-1])"))
      .drop("arr0")
      .withColumn("sz", size(col("arr")).cast(LongType)))
    // prefix length |X| − ⌈τ|X|⌉ + 1, with ⌈τ·sz⌉ = floor((num·sz +
    // den − 1)/den) — integer-exact (values ≪ 2^53 keep floor exact)
    val pref = docArr
      .withColumn("pl",
        (col("sz") - floor((col("sz") * tNum + (tDen - 1)) / tDen) + 1)
          .cast("int"))
      .select(col("doc_id"), col("sz"),
        posexplode(expr("slice(arr, 1, pl)")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("p"),
        col("col.token").as("token"))
    // α = ⌈num(sa+sb)/(num+den)⌉ — the overlap any τ-pair must reach
    val alpha = floor(((col("a.sz") + col("b.sz")) * tNum
      + (tNum + tDen - 1)) / (tNum + tDen))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tDen >= col("b.sz") * tNum &&
          col("b.sz") * tDen >= col("a.sz") * tNum &&
          least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) + 1 >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()
    val docSets = docArr.select(col("doc_id"),
      expr("transform(arr, x -> x.token)").as("set"))
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("set").as("set_a")),
        Seq("doc_a"))
      .join(docSets.select(col("doc_id").as("doc_b"), col("set").as("set_b")),
        Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast(LongType))
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * tDen >= col("union_sz") * tNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
        round(col("inter").cast(DoubleType) / col("union_sz"), 6).as("jaccard"))
  }

  /** INCREMENTAL (cross-only) PPJoin — the standing incremental-ingest
    * contract (digests, LSH sigs, winnow fps, index segments) applied
    * to the exact tier: every (batch, corpus) pair with Jaccard ≥
    * tNum/tDen, with NO batch×batch and NO corpus×corpus join anywhere
    * (the [[Dedup.crossLshCandidates]] convention), so per-batch cost
    * is ∝ |batch| prefix rows probing corpus postings plus
    * candidate-sized verification.
    *
    * The token order comes from CORPUS document frequencies alone (the
    * artifact a staged deployment already has): batch-only tokens
    * coalesce to df 0 — rarest — which keeps the order a single global
    * total order across both sides, the only property the prefix and
    * positional theorems need. Returns (doc_new, doc_base, inter,
    * union_sz, jaccard).
    */
  def ppjoinCross(batch: DataFrame, corpus: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    // df counts over the raw corpus stream: duplicated inputs inflate
    // counts but still yield ONE total (df, token) order — all the
    // theorems need (see [[ppjoin]]); per-doc dedup happens inside the
    // doc-keyed collect_set aggregate, never as an extra exchange
    val c = corpus.select(col("doc_id"), col("token"))
    ppjoinCrossWithDfs(batch, c,
      c.groupBy(col("token")).agg(count(lit(1)).as("df")), tNum, tDen)
  }

  /** Cross PPJoin against an EXPLICIT document-frequency artifact —
    * the streaming admission tier's entry point: the token total order
    * is PINNED per artifact generation (`dfs` staged when the
    * generation is built, refreshed only on the compaction cadence),
    * so per-batch cost never includes a corpus df aggregate and a
    * replayed micro-batch sees the identical order. Correctness needs
    * only that `dfs` define ONE total order applied to BOTH sides —
    * the prefix and positional filter theorems never require the
    * counts to be CURRENT, so a between-compactions artifact is exact,
    * not approximate.
    */
  def ppjoinCrossWithDfs(batch: DataFrame, corpus: DataFrame,
      dfs0: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val b = CacheBin.pin(batch.select(col("doc_id"), col("token")))
    val c = CacheBin.pin(corpus.select(col("doc_id"), col("token")))
    val dfs = dfs0.select(col("token"), col("df"))
    // per-side doc-keyed collect with the in-row rarest-first sort
    // (see [[ppjoin]]); batch-only tokens coalesce to df 0. Duplicate-
    // input robustness rides the in-row adjacent-unique filter after
    // the sort — collect_LIST state, not the costlier per-row set
    // insert (see [[ppjoin]]; an up-front distinct would cost a full
    // extra exchange per side for rows this absorbs).
    def docArrOf(side: DataFrame): DataFrame =
      CacheBin.pin(side.join(dfs, Seq("token"), "left")
        .withColumn("df", coalesce(col("df"), lit(0L)))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("arr0"))
        .withColumn("arr",
          expr("filter(arr0, (x, i) -> i = 0 OR x != arr0[i-1])"))
        .drop("arr0")
        .withColumn("sz", size(col("arr")).cast(LongType)))
    val (arrB, arrC) = (docArrOf(b), docArrOf(c))
    def prefixOf(docArr: DataFrame): DataFrame = docArr
      .withColumn("pl",
        (col("sz") - floor((col("sz") * tNum + (tDen - 1)) / tDen) + 1)
          .cast("int"))
      .select(col("doc_id"), col("sz"),
        posexplode(expr("slice(arr, 1, pl)")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("p"),
        col("col.token").as("token"))
    val alpha = floor(((col("a.sz") + col("b.sz")) * tNum
      + (tNum + tDen - 1)) / (tNum + tDen))
    val cand = prefixOf(arrB).as("a").join(prefixOf(arrC).as("b"),
        col("a.token") === col("b.token") &&
          col("a.sz") * tDen >= col("b.sz") * tNum &&
          col("b.sz") * tDen >= col("a.sz") * tNum &&
          least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) + 1 >= alpha)
      .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_base"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()
    def setsOf(docArr: DataFrame): DataFrame = docArr.select(col("doc_id"),
      expr("transform(arr, x -> x.token)").as("set"))
    val setsB = setsOf(arrB)
    val setsC = setsOf(arrC)
    cand
      .join(setsB.select(col("doc_id").as("doc_new"), col("set").as("set_a")),
        Seq("doc_new"))
      .join(setsC.select(col("doc_id").as("doc_base"), col("set").as("set_b")),
        Seq("doc_base"))
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast(LongType))
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * tDen >= col("union_sz") * tNum)
      .select(col("doc_new"), col("doc_base"), col("inter"), col("union_sz"),
        round(col("inter").cast(DoubleType) / col("union_sz"), 6).as("jaccard"))
  }
}
