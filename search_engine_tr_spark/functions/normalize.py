"""Score-normalization transforms as Spark column arithmetic (C7).

Distributed equivalents of the reference normalizer (normalizer.py:4-41):
stats via a single aggregate (or window), then pure column math — no UDFs.
Conventions preserved: population σ; *index-based* quartiles
(``sorted[n//4]``, ``sorted[n//2]``, ``sorted[3n//4]``), not interpolated
percentiles; min==max → 1.0; σ==0 / IQR==0 → 0.0.

Each helper takes and returns a DataFrame, adding ``out`` computed from
``col`` over the whole frame (matching the reference's list-at-a-time
semantics). Stats are computed with an aggregate + broadcast-joined scalar
row — no global window, so no single-partition bottleneck at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_stats(df: DataFrame, exprs: list) -> DataFrame:
    stats = df.agg(*exprs)
    return df.crossJoin(F.broadcast(stats))


def min_max_col(df: DataFrame, col: str, out: str) -> DataFrame:
    d = _with_stats(df, [F.min(col).alias("_lo"), F.max(col).alias("_hi")])
    return d.withColumn(
        out,
        F.when(F.col("_hi") == F.col("_lo"), F.lit(1.0))
         .otherwise((F.col(col) - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))),
    ).drop("_lo", "_hi")


def z_score_col(df: DataFrame, col: str, out: str) -> DataFrame:
    d = _with_stats(df, [F.avg(col).alias("_mu"), F.stddev_pop(col).alias("_sd")])
    return d.withColumn(
        out,
        F.when((F.col("_sd") == 0) | F.col("_sd").isNull(), F.lit(0.0))
         .otherwise((F.col(col) - F.col("_mu")) / F.col("_sd")),
    ).drop("_mu", "_sd")


def log_transform_col(df: DataFrame, col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.log1p(F.col(col)))


def robust_scale_col(df: DataFrame, col: str, out: str) -> DataFrame:
    """Index-based quartiles: rank the column, pick rows n//4, n//2, 3n//4
    (0-based) of the ascending sort — the reference's ``sorted[i]`` lookup.
    Implemented with row_number + a 3-row broadcast, not a full collect.
    """
    w = Window.orderBy(F.col(col).asc())
    ranked = df.withColumn("_rk", F.row_number().over(w) - 1)
    n = df.count()
    picks = (ranked.filter(F.col("_rk").isin(n // 4, n // 2, 3 * n // 4))
             .groupBy()
             .agg(
                 F.max(F.when(F.col("_rk") == n // 2, F.col(col))).alias("_med"),
                 F.max(F.when(F.col("_rk") == n // 4, F.col(col))).alias("_q1"),
                 F.max(F.when(F.col("_rk") == 3 * n // 4, F.col(col))).alias("_q3"),
             ))
    d = df.crossJoin(F.broadcast(picks))
    return d.withColumn(
        out,
        F.when(F.col("_q3") == F.col("_q1"), F.lit(0.0))
         .otherwise((F.col(col) - F.col("_med")) / (F.col("_q3") - F.col("_q1"))),
    ).drop("_med", "_q1", "_q3")


def clip_col(df: DataFrame, col: str, out: str, lo: float, hi: float) -> DataFrame:
    return df.withColumn(out, F.greatest(F.least(F.col(col), F.lit(hi)), F.lit(lo)))


def exp_transform_col(df: DataFrame, col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.lit(1.0) - F.exp(-F.col(col)))
