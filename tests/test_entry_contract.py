"""Local mirror of the driver's correctness gate: run every queries()[name]
at sf0.01 and compare to oracle_sql()[name] in DuckDB — row count, column
names, and order-insensitive values (exact after the queries' own rounding).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    df = _QUERIES[name](spark, SF)
    spark_rows = df.collect()
    cols = df.columns
    if name not in _ORACLES:
        # rows-only contract: runs, stable schema, no exception
        assert isinstance(spark_rows, list)
        return
    res = ddb.execute(_ORACLES[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert sorted(cols) == sorted(oracle_cols), name
    assert len(spark_rows) == len(oracle_rows), name
    got = _norm_rows(cols, [[r[c] for c in cols] for r in spark_rows])
    exp = _norm_rows(oracle_cols, oracle_rows)
    mismatches = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mismatches, (name, mismatches[:5])


def test_every_query_has_an_oracle():
    """Round-2 invariant: no rows-only gate entries — every queries() key
    carries a full ANSI-SQL oracle (and no orphan oracles)."""
    assert set(_ORACLES) == set(_QUERIES)


def test_blocks_index_queries_thread_safe(spark):
    """The three gate queries sharing the memoized scratch index
    (bm25_blocks / bm25_blocks_batch / bm25_blended_rank) must be safe to
    invoke CONCURRENTLY — the driver harness may parallelize gate queries
    in threads. The build must happen exactly once (lock) and each query's
    result must equal its sequential run."""
    from concurrent.futures import ThreadPoolExecutor

    names = ["bm25_blocks", "bm25_blocks_batch", "bm25_blended_rank",
             "bm25_blocks_incremental"]
    entry_mod._BLOCKS_INDEX_CACHE.clear()
    entry_mod._INCR_INDEX_CACHE.clear()

    def run(name):
        df = _QUERIES[name](spark, SF)
        return sorted(map(tuple, df.collect()))

    with ThreadPoolExecutor(max_workers=4) as ex:
        concurrent = dict(zip(names, ex.map(run, names)))
    sequential = {n: run(n) for n in names}
    for n in names:
        assert concurrent[n] == sequential[n], n
    assert len(entry_mod._BLOCKS_INDEX_CACHE) == 1  # built once, reused
    assert len(entry_mod._INCR_INDEX_CACHE) == 1


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == ["doc_id", "score"]
