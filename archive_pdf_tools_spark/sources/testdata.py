"""Driver testdata parquet loaders (TESTDATA.md)."""

from __future__ import annotations

import os

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark, sf_dir: str, name: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark, sf_dir: str, names=TABLES) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in names}
