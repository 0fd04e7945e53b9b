package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained quality classifier: a depth-2 decision tree over cheap
  * surrogate features, fit on weak labels (the Gopher rule verdict) —
  * the classic LLM-pipeline move of distilling an expensive labeler
  * into a model cheap enough to run at crawl scale (fastText-style
  * quality filters in C4/CCNet/RefinedWeb pipelines). Three of the four
  * features the tree sees (chars/digits/punct) are surrogates the label
  * rules never read; token count is shared with the word-count rule —
  * so the fit is a real approximation that can anchor on the one shared
  * signal but must surrogate the other four rules, not an identity.
  *
  * Everything is exact integer arithmetic, so the trained tree — not
  * just its application — is bit-identical across engines and the
  * DuckDB oracle replays fit + predict end to end:
  * - candidate thresholds are a FIXED power-of-two grid (data
  *   independent — no quantile sketch in the loop);
  * - the split criterion is misclassification count
  *   `min(posL,negL) + min(posR,negR)` (the classic decision-stump
  *   objective) — a pure int64 total order, no Gini fractions to
  *   compare across unequal denominators;
  * - ties break on (score, feature name, threshold) ascending — the
  *   same ORDER BY in both engines;
  * - leaves predict strict-majority positive (ties → negative).
  *
  * Scale shape: training is TWO aggregation passes over the corpus
  * (root, then both children in one pass keyed by root side), each a
  * map-side-combined groupBy over ≤ |features|·|grid|·2·2 keys — the
  * shuffle carries at most a few hundred rows per partition regardless
  * of corpus size, and the driver-side argmin sees a parameter-sized
  * histogram (≤ 256 rows), never data. Prediction is one map-side CASE
  * in the scan projection.
  */
object QualityModel {

  /** Candidate thresholds: 2^0 .. 2^14. */
  val grid: Seq[Long] = (0 to 14).map(i => 1L << i)

  case class Node(feature: String, thr: Long)

  /** Fitted depth-2 tree: root split, per-side child splits, and leaf
    * predictions keyed by (rootSide, childSide) with side = value ≤ thr.
    */
  case class Stump2(root: Node, left: Node, right: Node,
      leaf: Map[(Boolean, Boolean), Boolean])

  /** Surrogate features, alphabetical (the tie-break order). Exact
    * int64 in Spark and the oracle: ASCII `\w` semantics match RE2.
    */
  def featureCols(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text).cast(LongType),
    "n_digit" -> regexp_count(text, lit("[0-9]")),
    "n_punct" -> regexp_count(text, lit("[^\\w\\s]")),
    "n_tokens" -> size(TextAnalysis.tokens(text)).cast(LongType))

  /** Grid-bucket index: the number of grid thresholds strictly below
    * the value — `v ≤ grid(j)` iff `bucket(v) ≤ j`, so per-(feature,
    * bucket) counts are a sufficient statistic for EVERY candidate
    * split at once (one histogram, 15 cumulative reads).
    */
  private def bucket(v: Column): Column =
    grid.map(t => (v > t).cast(IntegerType)).reduce(_ + _)

  private case class H(side: Boolean, f: String, k: Int, y: Boolean, n: Long)

  /** Driver-side argmin over the node's histogram rows: best (feature,
    * threshold) by misclassification, ties by (feature, threshold).
    * Degenerate splits (one empty side) are allowed — they score the
    * node's own misclassification, so they only win when nothing
    * discriminates, and the empty side's leaf never receives a row.
    */
  private def bestSplit(rows: Seq[H]): Node = {
    val byF = rows.groupBy(_.f)
    val cands = for {
      (f, hs) <- byF.toSeq
      j <- grid.indices
    } yield {
      val (le, gt) = hs.partition(_.k <= j)
      def cnt(s: Seq[H], y: Boolean) = s.filter(_.y == y).map(_.n).sum
      val score = math.min(cnt(le, true), cnt(le, false)) +
        math.min(cnt(gt, true), cnt(gt, false))
      (score, f, grid(j))
    }
    val (_, f, t) = cands.minBy { case (s, f, t) => (s, f, t) }
    Node(f, t)
  }

  private def majority(rows: Seq[H]): Boolean = {
    val pos = rows.filter(_.y).map(_.n).sum
    pos > rows.filterNot(_.y).map(_.n).sum
  }

  /** One training pass: the per-(side, feature, bucket, label) count
    * histogram — ONE corpus scan (all feature buckets in a 4-element
    * array, exploded; not a union of per-feature selects = 4 scans),
    * one map-side-combined groupBy whose shuffle carries at most
    * |features|·|grid+1|·2·2 rows per partition at ANY corpus size.
    * Public so the scale harness can put a receipt on exactly this
    * claim (flat rows, flat exchanges, time ∝ input).
    */
  def bucketHistogram(labeled: DataFrame, text: Column, label: Column,
      side: Column): DataFrame = {
    val feats = featureCols(text)
    labeled
      .select(side.as("s"), label.cast(BooleanType).as("y"),
        explode(array(feats.map { case (name, c) =>
          struct(lit(name).as("f"), bucket(c).as("k"))
        }: _*)).as("fk"))
      .select(col("s"), col("fk.f").as("f"), col("fk.k").as("k"), col("y"))
      .groupBy("s", "f", "k", "y").count()
  }

  /** Fit on (text, label): the weak label + feature buckets are
    * materialized once, then TWO aggregation passes over the slim
    * table with parameter-sized collects (the histogram,
    * ≤ 4·16·2·2 rows).
    */
  def fit(labeled: DataFrame, text: Column, label: Column): Stump2 = {
    val feats = featureCols(text)
    // Materialize the per-doc bucket indexes + weak label ONCE (4 ints
    // + 1 bool per doc). The weak label is the expensive term — the
    // Gopher verdict runs interpreted per-token lambda HOFs — and the
    // grid-bucket index is a sufficient statistic for every candidate
    // split (v ≤ grid(j) ⟺ bucket(v) ≤ j, and the root threshold is
    // always a grid point), so both training passes AND the root-side
    // predicate of the second pass read only this slim table; text is
    // never rescanned. At crawl scale this is the label table a
    // production pipeline would persist to storage and reuse across
    // fits — here it lives for the two passes and is dropped.
    val slim = labeled.select(
      (feats.map { case (n, c) => bucket(c).as("k_" + n) } :+
        label.cast(BooleanType).as("y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def hist(side: Column): Seq[H] = slim
        .select(side.as("s"), col("y"),
          explode(array(feats.map { case (n, _) =>
            struct(lit(n).as("f"), col("k_" + n).as("k"))
          }: _*)).as("fk"))
        .select(col("s"), col("fk.f").as("f"), col("fk.k").as("k"), col("y"))
        .groupBy("s", "f", "k", "y").count()
        .collect().toSeq
        .map(r => H(r.getBoolean(0), r.getString(1), r.getInt(2),
          r.getBoolean(3), r.getLong(4)))

      val rootHist = hist(lit(true))
      val root = bestSplit(rootHist)

      val childHist =
        hist(col("k_" + root.feature) <= grid.indexOf(root.thr))
      fitChildren(root, childHist)
    } finally slim.unpersist()
  }

  private def fitChildren(root: Node, childHist: Seq[H]): Stump2 = {
    val (lh, rh) = childHist.partition(_.side)
    val (ln, rn) = (bestSplit(lh), bestSplit(rh))
    def leafOf(hs: Seq[H], n: Node, le: Boolean): Boolean =
      majority(hs.filter(h => h.f == n.feature &&
        (h.k <= grid.indexOf(n.thr)) == le))
    Stump2(root, ln, rn, Map(
      (true, true) -> leafOf(lh, ln, true),
      (true, false) -> leafOf(lh, ln, false),
      (false, true) -> leafOf(rh, rn, true),
      (false, false) -> leafOf(rh, rn, false)))
  }

  /** Map-side application: one nested CASE in the projection. */
  def predictCol(text: Column, tree: Stump2): Column = {
    val feats = featureCols(text).toMap
    def side(n: Node): Column = feats(n.feature) <= n.thr
    when(side(tree.root),
        when(side(tree.left), lit(tree.leaf((true, true))))
          .otherwise(lit(tree.leaf((true, false)))))
      .otherwise(
        when(side(tree.right), lit(tree.leaf((false, true))))
          .otherwise(lit(tree.leaf((false, false)))))
  }
}
