package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous LABEL PROPAGATION over an undirected edge list
  * (Raghavan, Albert & Kumara 2007) — the community-detection
  * companion to [[ConnectedComponents]] and [[KCore]] on the near-dup
  * graph: CC answers "which docs are transitively linked at all",
  * LPA answers "which docs cluster DENSELY together" — a chain of
  * incidental pairs that CC merges into one component splits into its
  * dense ends under majority voting, which is the distinction a
  * curation pass wants when deciding audit units.
  *
  * Determinism (the property that makes the face hash-gateable, unlike
  * the asynchronous/randomized textbook variant): SYNCHRONOUS rounds —
  * every round-r label is computed from the full round-(r−1) labeling
  * — with the tie-break (neighbor-label count DESC, label ASC), and a
  * fixed round count both engines unroll identically (the [[KCore]]
  * bounded-sweep argument; the oracle unrolls the same rounds as
  * materialized CTEs, so the fold is checked round-for-round, not just
  * at the end).
  *
  * Scale shape: each round is one dst-keyed join of the edge list
  * against the |V|-sized label table, one (src, lbl)-keyed count with
  * map-side combine, and one src-keyed argmax window — all keyed
  * exchanges on graph-sized relations, no driver loop, labels pinned
  * per round so round r+1 never recomputes rounds 1..r.
  */
object LabelPropagation {

  /** `rounds` synchronous sweeps; returns (v, lbl). Edges must be the
    * canonical (doc_a < doc_b) pair relation. Initial label = own id;
    * every vertex in the edge list has ≥ 1 neighbor, so the argmax is
    * always defined.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
    for (_ <- 1 to rounds) {
      // OPTIMIZATION r16: the per-src argmax rides a max_by AGGREGATE
      // instead of a row_number window — (cnt DESC, lbl ASC) spelled as
      // max over the (cnt, -lbl) key struct — deleting one src-keyed
      // sort exchange per round. Identical tie-break: max on the struct
      // compares cnt first, then -lbl (labels are non-negative ids, so
      // -lbl max ⟺ lbl min).
      labels = CacheBin.pin(
        und.join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("src"))
          .agg(max_by(col("lbl"),
            struct(col("cnt"), (-col("lbl")).as("nl"))).as("lbl"))
          .select(col("src").as("v"), col("lbl")))
    }
    labels
  }
}
