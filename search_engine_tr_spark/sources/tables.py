"""Loaders for the driver-provided testdata parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark, sf_dir: str, name: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark, sf_dir: str) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
