"""URL scalar functions as native Spark expressions (JVM-side, codegen'd).

Replaces the reference's per-row ``urlparse`` calls (crawler.py:29-37,
backlink_analyser.py:11-26) with ``parse_url`` — stays inside whole-stage
codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def base_url_col(url: Column) -> Column:
    """scheme://netloc — parity with `_get_base_url` (crawler.py:29-33)."""
    return F.concat(
        F.parse_url(url, F.lit("PROTOCOL")), F.lit("://"), F.parse_url(url, F.lit("HOST"))
    )


def domain_col(url: Column) -> Column:
    """Bare hostname."""
    return F.parse_url(url, F.lit("HOST"))


def registrable_suffix_col(url: Column) -> Column:
    """Last two host labels — parity with `_is_same_subbdomain`
    (backlink_analyser.py:23-26): ``domain.split(".")[-2:]``."""
    parts = F.split(F.parse_url(url, F.lit("HOST")), r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.concat_ws(".", F.slice(parts, n - 1, 2))) \
            .otherwise(F.concat_ws(".", parts))
