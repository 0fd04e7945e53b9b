#!/usr/bin/env python3
"""Cross-engine dtype audit — the r11 q_session_transcript failure class.

The driver's hash compare stringifies values; check_oracle.py's %.10g
float normalization masks int-vs-float divergences that the driver's
int-naive stringifier does NOT ("3" vs "3.0"). The canonical source is
DuckDB widening sum(BIGINT) to HUGEINT, which pandas materializes as
float64 — fixed by CAST(sum(x) AS BIGINT) AROUND the aggregate.

This audit runs every oracle and compares pandas dtype KINDS per column
against the Spark parquet dump: any column where one side is float and
the other is not is a latent driver hash mismatch, even if values agree.

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>
Exit 1 if any mismatch is found.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"SKIP {name}: {str(e)[:120]}")
            continue
        for c in got.columns:
            if c not in exp.columns:
                continue
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            # Flag any kind divergence where one side is float OR one side
            # is numeric and the other is object: DuckDB HUGEINT can
            # materialize as pandas object ('O'), which the old float-only
            # test missed while the driver's stringifier still diverges.
            numeric = set("iuf")
            if gk != ek and (
                "f" in (gk, ek)
                or ("O" in (gk, ek) and (gk in numeric or ek in numeric))
            ):
                bad.append((name, c, str(got[c].dtype), str(exp[c].dtype)))
    for name, c, g, e in bad:
        print(f"MISMATCH {name}.{c}: spark={g} oracle={e}")
    print(f"\n{len(bad)} float/int dtype mismatches over {len(oracle)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
