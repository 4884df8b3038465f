#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs EVERY ``QUERIES`` entry at sf0.01 through toPandas, canonicalizes
(columns sorted by name, rows sorted, values stringified) and compares
row count + per-cell values against the DuckDB oracle (when one exists).
Rows-only queries are executed and row-counted.  Prints one line per
query and a final ``N queries, M bad`` summary.

Usage: python tools/gate_sweep.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        kind = getattr(col.dtype, "kind", None)
        if kind == "f":
            # genuinely-float columns: round to absorb cross-engine noise
            out[c] = col.round(6).astype(str)
        else:
            # integers (incl. 56-bit fingerprints that exceed float64's
            # 53-bit mantissa), bools, objects: exact string compare, the
            # same sensitivity as the driver's type-aware value hash
            out[c] = col.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from bench import make_spark
    from archive_pdf_tools_spark.queries import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "24")), "gate")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    n_run = 0
    try:
        for name, (fn, sql) in QUERIES.items():
            if only and name not in only:
                continue
            n_run += 1
            try:
                got = fn(spark, sf_dir).toPandas()
            except Exception as exc:  # noqa: BLE001
                print(f"{name:24s} SPARK-ERR {type(exc).__name__}: {exc}")
                bad += 1
                continue
            if sql is None:
                print(f"{name:24s} rows-only  {len(got)} rows")
                continue
            try:
                want = con.execute(sql).df()
            except Exception as exc:  # noqa: BLE001
                print(f"{name:24s} ORACLE-ERR {type(exc).__name__}: {exc}")
                bad += 1
                continue
            cg, cw = canon(got), canon(want)
            if len(cg) != len(cw):
                print(f"{name:24s} ROWS {len(cg)} vs {len(cw)}")
                bad += 1
            elif list(cg.columns) != list(cw.columns):
                print(f"{name:24s} SCHEMA {list(cg.columns)} vs "
                      f"{list(cw.columns)}")
                bad += 1
            elif not cg.equals(cw):
                neq = (cg != cw).any(axis=1)
                print(f"{name:24s} VALUES {int(neq.sum())}/{len(cg)} rows "
                      "differ; first:")
                print("  spark:", cg[neq].head(2).to_dict("records"))
                print("  duck :", cw[neq].head(2).to_dict("records"))
                bad += 1
            else:
                print(f"{name:24s} ok  {len(cg)} rows")
    finally:
        spark.stop()
    print(f"{n_run} queries, {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
