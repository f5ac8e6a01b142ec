"""As-of (temporal) join — for every left row, the right row with the
greatest timestamp ≤ the left timestamp within the same key.

Spark has no native ASOF JOIN (DuckDB/kdb do); the standard scalable
composition is the tagged-union trick: stack both sides, sort each key's
rows by (ts, side) with right rows BEFORE left rows at equal timestamps
(so ties match, like DuckDB's ``l.ts >= r.ts``), and carry the last
non-null right value forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. One shuffle on the key — same cost class as a
regular join, no range explosion, no per-key driver loop.

Skew note: a hot key serializes into one task's sort (the window is
per-key sequential by construction). At 100 TB, pre-bucket hot keys by
coarse time range and as-of join within (range, key), seeding each range
with the previous range's last right row — the composition below is the
per-bucket kernel of that plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str,
              ts: str = "ts", value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """→ left columns + ``<value_col><suffix>`` for each right value column
    (NULL when no right row at-or-before the left row's timestamp exists
    for that key).

    ``right`` must be unique per (on, ts) — enforce upstream (e.g.
    ``groupBy(on, ts).agg(...)``) so the matched row is well-defined; this
    mirrors the determinism contract of DuckDB's ASOF JOIN, which is
    otherwise free to pick any of the tied rows.
    """
    value_cols = value_cols or [c for c in right.columns
                                if c not in (on, ts)]
    # the carried payload is ONE struct per right row (never null itself,
    # even when every value inside is null): last(ignorenulls) then picks
    # the latest matched ROW — a right row whose value is NULL correctly
    # yields NULL (DuckDB ASOF semantics), and multiple value columns can
    # never mix values from different right rows
    row_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        T.StructType([right.schema[c] for c in value_cols]))
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        null_struct.alias("_r"))
    r_tag = right.select(
        on, ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
        F.lit(0).alias("_side"),
        row_struct.alias("_r"))
    stacked = l_tag.unionByName(r_tag)

    # right (side=0) sorts before left (side=1) at equal ts → ties match
    w = (Window.partitionBy(on).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = stacked.withColumn(
        "_r_match", F.last("_r", ignorenulls=True).over(w))
    return (carried.filter(F.col("_side") == 1)
            .select(*[F.col(c) for c in left.columns],
                    *[F.col("_r_match").getField(c).alias(f"{c}{suffix}")
                      for c in value_cols]))
