"""Bucketed range join: point-in-interval joins without an equi-key.

Spark's optimizer turns ``l.ts BETWEEN r.start AND r.end`` with no equality
key into BroadcastNestedLoopJoin — a cartesian scan that dies at scale. The
standard fix is coarse time-bucketing: explode each right interval into the
buckets it overlaps, put each left point into its single bucket, equi-join
on the bucket, and re-check the exact predicate. Each matching pair meets
in EXACTLY one bucket (the left point's), so no dedup pass is needed.

Cost: |right| × (interval_width / bucket_width + 1) exploded rows and one
hash shuffle — choose ``bucket_width`` near the typical interval width so
the explode factor stays ~2. Bucket ids come from a floor of a double
division: monotonic in the input, so boundary rounding can never separate
a pair (l ≥ s ⇒ bucket(l) ≥ bucket(s), l ≤ e ⇒ bucket(l) ≤ bucket(e)).

Skew: a bucket where many intervals overlap (or many points land) is an
inherent range-join hot spot — the join fan-out there IS the output size.
If one bucket dominates, AQE's skew-join split handles the shuffle side;
truly pathological overlap (thousands of intervals × millions of points
in one bucket) means the OUTPUT is quadratic and needs an upstream cap,
not a different join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, width: int):
    return F.floor(col / F.lit(float(width))).cast("long")


def range_join(left: DataFrame, right: DataFrame, point: str,
               start: str, end: str, bucket_width: int) -> DataFrame:
    """Inner join of left rows to every right interval containing their
    point: ``start <= point <= end`` (closed bounds, SQL BETWEEN). Columns
    of both inputs survive; name collisions must be resolved upstream.

    ``point``/``start``/``end`` are numeric (use unix_micros for
    timestamps); ``bucket_width`` in the same unit."""
    overlap = left.columns and set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    r_b = right.withColumn(
        "_rb", F.explode(F.sequence(_bucket(F.col(start), bucket_width),
                                    _bucket(F.col(end), bucket_width))))
    l_b = left.withColumn("_rb", _bucket(F.col(point), bucket_width))
    return (l_b.join(r_b, "_rb")
            .filter((F.col(point) >= F.col(start)) &
                    (F.col(point) <= F.col(end)))
            .drop("_rb"))
