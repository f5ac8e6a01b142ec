"""Upsert / merge-by-key (S4) and delete-by-predicate (S5) as DataFrame ops.

The reference does select-then-insert-or-update per row (PageService.py:
100-109, IPService.py:89-101). The Spark shape is one MERGE: anti-join the
old rows against the updates' keys, union the updates, write. On Iceberg
this is literally ``MERGE INTO``; on plain parquet it is an atomic
overwrite. Both sides of the merge shuffle once on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str | list[str]) -> DataFrame:
    """Rows of ``updates`` win on key collision; others kept (MERGE shape)."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def merge_apply(target: DataFrame, updates: DataFrame, key: str,
                set_exprs: dict[str, F.Column]) -> DataFrame:
    """UPDATE-style merge: matched rows get ``set_exprs`` applied (columns
    may reference both sides), unmatched kept as-is."""
    u = updates.select(F.col(key).alias("_k"),
                       *[c for c in updates.columns if c != key])
    joined = target.join(u, target[key] == F.col("_k"), "left")
    out_cols = []
    for c in target.columns:
        if c in set_exprs:
            out_cols.append(
                F.when(F.col("_k").isNotNull(), set_exprs[c])
                 .otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def delete_where(target: DataFrame, predicate: F.Column) -> DataFrame:
    """DELETE FROM target WHERE predicate (S5)."""
    return target.filter(~predicate)
