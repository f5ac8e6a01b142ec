"""asof_join edge semantics: equal-timestamp ties match, missing history
is NULL, carry-forward spans multiple left rows, multiple value columns."""

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


def test_asof_join_subset_value_cols_and_suffix(spark):
    left, right = _dfs(spark)
    res = asof_join(left, right, on="key", value_cols=["rval"], suffix="_x")
    assert set(res.columns) == {"key", "ts", "lval", "rval_x"}
    got = {(r["key"], r["ts"]): r["rval_x"] for r in res.collect()}
    assert got[(1, 200)] == 2.0 and got[(2, 50)] is None


def test_asof_join_one_shuffle_plan(spark):
    """Plan audit: the composition is one key-partitioned exchange + one
    window — no join node, no range explosion."""
    left, right = _dfs(spark)
    plan = asof_join(left, right, on="key")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
