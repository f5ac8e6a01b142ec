"""plans.fsio: sidecar IO must behave identically through the local fast
path and the JVM Hadoop FileSystem branch. No HDFS in the sandbox, so the
JVM branch is exercised against the local filesystem by disabling the
fast-path detection — the Hadoop API calls (create/open/delete/listStatus/
listFiles) are the same ones an hdfs:// or s3a:// root would hit."""

import os

import pytest

from search_engine_tr_spark.plans import fsio


def test_local_path_detection():
    assert fsio.local_path("/a/b") == "/a/b"
    assert fsio.local_path("file:///a/b") == "/a/b"
    assert fsio.local_path("file:/a/b") == "/a/b"
    assert fsio.local_path("hdfs://nn/a") is None
    assert fsio.local_path("s3a://bucket/k") is None


@pytest.mark.parametrize("branch", ["local", "jvm"])
def test_round_trip_both_branches(spark, tmp_path, monkeypatch, branch):
    if branch == "jvm":
        monkeypatch.setattr(fsio, "local_path", lambda p: None)
    root = str(tmp_path / branch)
    os.makedirs(root)
    p = os.path.join(root, "meta.json")
    assert not fsio.exists(spark, p)
    fsio.write_json(spark, p, {"a": 1, "türkçe": "çok iyi"})
    assert fsio.exists(spark, p)
    assert fsio.read_json(spark, p) == {"a": 1, "türkçe": "çok iyi"}
    fsio.write_json(spark, p, {"b": 2})  # overwrite publishes atomically
    assert fsio.read_json(spark, p) == {"b": 2}
    # listing: flat and recursive
    sub = os.path.join(root, "t", "k=1")
    os.makedirs(sub)
    with open(os.path.join(sub, "x.parquet"), "wb") as f:
        f.write(b"\x00")
    flat = fsio.list_files(spark, root)
    rec = fsio.list_files_recursive(spark, os.path.join(root, "t"))
    assert [os.path.basename(f) for f in flat] == ["meta.json"]
    assert [os.path.basename(f) for f in rec] == ["x.parquet"]
    assert fsio.list_files(spark, os.path.join(root, "missing")) == []
    assert fsio.delete(spark, p) is True
    assert fsio.delete(spark, p) is False
    assert not fsio.exists(spark, p)


def test_jvm_branch_large_payload(spark, tmp_path, monkeypatch):
    """The streamed JVM read must reassemble payloads larger than its
    64 KiB buffer without truncation or mojibake."""
    monkeypatch.setattr(fsio, "local_path", lambda p: None)
    p = str(tmp_path / "big.json")
    text = "ğüşiöç" * 40000  # ~480 KB utf-8
    fsio.write_text(spark, p, text)
    assert fsio.read_text(spark, p) == text
