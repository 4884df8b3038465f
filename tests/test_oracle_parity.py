"""Local replica of the driver's correctness gate: run every
oracle-paired query on Spark AND DuckDB over the same parquet and compare
row count, schema shape, and exact values (columns sorted by name, rows
sorted).  Runs at sf0.001 for speed; the driver runs sf0.01.
"""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _pairs():
    from archive_pdf_tools_spark.queries import QUERIES
    return [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql",
                         _pairs(), ids=[n for n, _, _ in _pairs()])
def test_query_matches_duckdb_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    ddf = _duck(sql)
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    got = _normalize(spark_rows, spark_cols)
    want = _normalize(duck_rows, duck_cols)
    mism = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert not mism, (f"{name}: {len(mism)} mismatched rows; first: "
                      f"{got[mism[0]]} != {want[mism[0]]}")


def test_pinned_sql_registry_consistency():
    """Every query the pin tool maintains has a pinned oracle wired into
    the registry, and every pinned oracle belongs to a registered query
    (a rename or forgotten regeneration shows up here, not in the
    driver's run)."""
    import importlib.util
    import os

    from archive_pdf_tools_spark.pinned_sql import PINNED_SQL
    from archive_pdf_tools_spark.queries import QUERIES

    spec = importlib.util.spec_from_file_location(
        "pin_oracles", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "pin_oracles.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert set(PINNED_SQL) == set(mod.PIN)
    for name, sql in PINNED_SQL.items():
        assert name in QUERIES
        assert QUERIES[name][1] == sql        # registry wired to the pin
        assert "VALUES" in sql
