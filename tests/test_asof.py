"""asof_join edge semantics: equal-timestamp ties match, missing history
is NULL, carry-forward spans multiple left rows, multiple value columns."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_tr_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 100, 5.0), (1, 150, 6.0), (1, 200, 7.0), (2, 50, 8.0),
         (3, 10, 9.0)],
        "key long, ts long, lval double")
    right = spark.createDataFrame(
        [(1, 100, 1.0, "a"), (1, 180, 2.0, "b"), (2, 60, 3.0, "c")],
        "key long, ts long, rval double, tag string")
    return left, right


def test_asof_join_semantics(spark):
    left, right = _dfs(spark)
    out = {(r["key"], r["ts"]): (r["rval_asof"], r["tag_asof"])
           for r in asof_join(left, right, on="key").collect()}
    assert out == {
        (1, 100): (1.0, "a"),   # equal ts matches (>= rule)
        (1, 150): (1.0, "a"),   # carries forward past the match
        (1, 200): (2.0, "b"),   # later right row supersedes
        (2, 50): (None, None),  # right exists but only later → NULL
        (3, 10): (None, None),  # key with no right rows at all → NULL
    }
    # all left rows and columns survive
    res = asof_join(left, right, on="key")
    assert res.count() == left.count()
    assert set(res.columns) == {"key", "ts", "lval", "rval_asof", "tag_asof"}


def test_asof_join_null_valued_right_row_matches(spark):
    """A matched right row whose VALUE is NULL must yield NULL (the row
    matched; its value is null) — not skip back to an older non-null row;
    and multiple value columns must all come from the SAME matched row
    (round-3 review finding)."""
    left = spark.createDataFrame([(1, 3)], "key long, ts long")
    right = spark.createDataFrame(
        [(1, 1, 5.0, "old"), (1, 2, None, "new")],
        "key long, ts long, rval double, tag string")
    row = asof_join(left, right, on="key").collect()[0]
    assert row["rval_asof"] is None      # NOT 5.0
    assert row["tag_asof"] == "new"      # both columns from ts=2's row


def test_asof_join_subset_value_cols_and_suffix(spark):
    left, right = _dfs(spark)
    res = asof_join(left, right, on="key", value_cols=["rval"], suffix="_x")
    assert set(res.columns) == {"key", "ts", "lval", "rval_x"}
    got = {(r["key"], r["ts"]): r["rval_x"] for r in res.collect()}
    assert got[(1, 200)] == 2.0 and got[(2, 50)] is None


def _py_asof(left_rows, right_rows):
    """Pure-Python reference: for each left (key, ts), the right value at
    the greatest right-ts ≤ ts, else None."""
    by_key = {}
    for k, ts, v in right_rows:
        by_key.setdefault(k, []).append((ts, v))
    for rs in by_key.values():
        rs.sort()
    out = {}
    for k, ts in left_rows:
        best = None
        for rts, v in by_key.get(k, []):
            if rts <= ts:
                best = v
            else:
                break
        out[(k, ts)] = best
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)),
                min_size=1, max_size=40, unique=True),
       st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)),
                min_size=0, max_size=25))
def test_asof_join_matches_python_fold(spark, lefts, rights):
    """Property: the tagged-union window == a per-key python scan for any
    key/ts layout (incl. equal timestamps, empty right, never-matching
    keys). Right side deduped per (key, ts) keeping max value — the
    operator's determinism contract."""
    rkeyed = {}
    for k, ts in rights:
        v = float(k * 100 + ts)
        cur = rkeyed.get((k, ts))
        rkeyed[(k, ts)] = max(cur, v) if cur is not None else v
    right_rows = [(k, ts, v) for (k, ts), v in rkeyed.items()]
    left = spark.createDataFrame(list(lefts), "key long, ts long")
    if right_rows:
        right = spark.createDataFrame(right_rows,
                                      "key long, ts long, rv double")
    else:
        right = spark.createDataFrame([], "key long, ts long, rv double")
    got = {(r["key"], r["ts"]): r["rv_asof"]
           for r in asof_join(left, right, on="key").collect()}
    exp = _py_asof(list(lefts), right_rows)
    assert got == exp


def test_asof_join_one_shuffle_plan(spark):
    """Plan audit: the composition is one key-partitioned exchange + one
    window — no join node, no range explosion."""
    left, right = _dfs(spark)
    plan = asof_join(left, right, on="key")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
