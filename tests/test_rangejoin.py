"""Bucketed range join: equals the naive BETWEEN join for every bucket
width (pairs can never be lost at bucket boundaries — bucket ids are
monotonic in the input), closed-bound semantics, no nested-loop join in
the plan, column-collision guard."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_tr_spark.operators.rangejoin import range_join


def _naive(left, right, point, start, end):
    return left.join(right, (F.col(point) >= F.col(start)) &
                     (F.col(point) <= F.col(end)))


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=30),
       st.lists(st.tuples(st.integers(0, 900), st.integers(0, 200)),
                min_size=1, max_size=10),
       st.sampled_from([1, 7, 50, 128, 1000]))
def test_range_join_equals_naive(spark, points, intervals, width):
    left = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, pt long")
    right = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(intervals)],
        "iid long, s long, e long")
    got = _pairs(range_join(left, right, "pt", "s", "e", width))
    exp = _pairs(_naive(left, right, "pt", "s", "e"))
    assert got == exp


def test_range_join_closed_bounds_and_plan(spark):
    left = spark.createDataFrame([(1, 10), (2, 20), (3, 21)],
                                 "pid long, pt long")
    right = spark.createDataFrame([(7, 10, 20)], "iid long, s long, e long")
    out = range_join(left, right, "pt", "s", "e", bucket_width=8)
    assert _pairs(out) == [(1, 7), (2, 7)]  # both endpoints inclusive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

    with pytest.raises(ValueError, match="collision"):
        range_join(left.withColumnRenamed("pid", "iid"), right,
                   "pt", "s", "e", 8)
