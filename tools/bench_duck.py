#!/usr/bin/env python3
"""DuckDB-side wall clock for every oracle SQL — the local stand-in for
BASELINE.md's "within 2x of the oracle at the same scale factor".

Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir> [spark_bench.json]

Runs each oracle query from oracle_sql.json in DuckDB over the sf tables
(min of 3), prints per-query seconds; if a Spark bench JSON is given,
prints the ratio spark/duck per query, worst first.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Fallback mirror of graft.Bench.stagedInputCells (the authoritative
# list rides every Bench JSON line since round 14); see BASELINE.md
# "Staged-input cells" / "Basis-mismatch cell": oracle timings for these
# include derivation work the Spark side stages out per JVM (or, for
# binaryfile, Spark does file-per-object I/O the oracle computes
# closed-form; for the IVM faces, the oracle recomputes a view the
# engine maintains) — their per-query ratios are not engine-vs-engine.
STAGED_CELLS = [
    "q_cdc_merge", "q_events_json", "q_binaryfile_scan",
    "q_ingest_gate_e2e", "q_quality_classifier",
    "q_bpe_merges", "q_phrase_search", "q_phrase_search_incr",
    "q_index_stats",
    "q_wordpiece_vocab", "q_wordpiece_encode", "q_wordpiece_ids",
    "q_minpiece_encode", "q_token_blocks",
    "q_block_provenance", "q_block_decontam",
    "q_embed_ann_ivf", "q_embed_ann_ivf_indexed", "q_embed_recall",
    "q_embed_drift", "q_dedup_semantic", "q_sample_cluster_balanced",
    "q_embed_ivf_append", "q_embed_ivf_sq8", "q_embed_ivf_sq8_append",
    "q_embed_ivfpq_append",
    "q_attribution_stream", "q_ivm_stream", "q_blocklist_stream",
    "q_para_dedup_stream", "q_para_dedup_incr",
    "q_ivm_aggregate", "q_ivm_join", "q_ivm_join_dim", "q_ivm_minmax",
    "q_ivm_minmax_stream",
    "q_dedup_doc_coverage",
    "q_trgm_like_scan", "q_trgm_like_incr"]


def main(sf_dir, out_dir, spark_json=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    duck = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(3):
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"{name}: ERROR {str(e)[:120]}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            duck[name] = best
    staged = STAGED_CELLS
    if spark_json:  # prefer the list embedded in the Spark receipt
        try:
            staged = next(json.loads(ln)["staged_input_cells"]
                          for ln in open(spark_json)
                          if ln.strip() and "staged_input_cells" in ln)
        except (StopIteration, KeyError, json.JSONDecodeError):
            pass
    print(json.dumps({"duck_total": round(sum(duck.values()), 2),
                      "queries": {k: round(v, 3) for k, v in duck.items()},
                      "staged_input_cells": staged}))
    if spark_json:
        # Bench prints the full per-query line FIRST, then a compact
        # totals-only line (tail-capture insurance) — take the line
        # that carries "queries".
        spark_line = next(json.loads(ln)
                          for ln in open(spark_json)
                          if ln.strip() and "\"queries\"" in ln)
        spark = spark_line["queries"]
        rows = [(k, spark.get(k), duck.get(k)) for k in duck if k in spark]
        rows.sort(key=lambda r: -(r[1] / r[2] if r[2] else 0))
        print(f"\n{'query':32} {'spark':>8} {'duck':>8} {'ratio':>7}")
        for k, s, d in rows:
            print(f"{k:32} {s:8.2f} {d:8.3f} {s / d:7.1f}x")
        # committed paired-ratio artifact: per-cell spark/duck/ratio so
        # future judges diff RATIOS across rounds, not just totals.
        # Self-describing: carries the Spark receipt's load evidence and
        # the staged-cell list (those ratios compare different work).
        paired = {
            "sf": sf_dir,
            "loadavg_before": spark_line.get("loadavg_before"),
            "loadavg_after": spark_line.get("loadavg_after"),
            "hot_window_warn": spark_line.get("hot_window_warn"),
            "spark_total": round(sum(s for _, s, _ in rows), 2),
            "duck_total": round(sum(d for _, _, d in rows), 2),
            "ratio_total": round(sum(s for _, s, _ in rows)
                                 / max(sum(d for _, _, d in rows), 1e-9), 3),
            "staged_input_cells": staged,
            "cells": {k: {"spark": round(s, 3), "duck": round(d, 3),
                          "ratio": round(s / d, 2) if d else None}
                      for k, s, d in rows},
        }
        with open("target/paired_last.json", "w") as f:
            json.dump(paired, f, indent=1, sort_keys=True)
        print("\npaired artifact -> target/paired_last.json")


if __name__ == "__main__":
    main(*sys.argv[1:])
