"""Iceberg-or-parquet source boundary: ref classification, parquet
fallback round-trip, and graceful capability detection without jars."""

import pytest

from search_engine_tr_spark.sources import catalog


def test_ref_classification():
    assert catalog.is_table_ref("local.db.pages")
    assert not catalog.is_table_ref("/tmp/pages")
    assert not catalog.is_table_ref("s3a://bucket/pages")  # path-style


def test_iceberg_conf_shape():
    conf = catalog.iceberg_conf("/tmp/warehouse", catalog="c1")
    assert conf["spark.sql.catalog.c1.warehouse"] == "/tmp/warehouse"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_unavailable_without_jars(spark):
    # no catalog configured in the test session → cleanly unavailable
    assert catalog.iceberg_available(spark) is False
    assert catalog.snapshot_id(spark, "/tmp/anything") is None


def test_parquet_fallback_roundtrip(spark, tmp_path):
    path = str(tmp_path / "pages_pq")
    df = spark.createDataFrame([("u1", "<p>x</p>")], "url string, html string")
    catalog.write_pages(df, path)
    got = catalog.read_pages(spark, path).collect()
    assert [(r["url"], r["html"]) for r in got] == [("u1", "<p>x</p>")]
