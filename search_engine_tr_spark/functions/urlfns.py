"""URL scalar functions as native Spark expressions (JVM-side, codegen'd).

Replaces the reference's per-row ``urlparse`` calls (crawler.py:29-37,
backlink_analyser.py:11-26). NOT implemented with Spark's ``parse_url``:
that builtin returns NULL for any non-ASCII (IDN) host — e.g.
``https://dünya.com.tr/x`` — while the reference's Python ``urlparse``
handles unicode hosts fine, and Common-Crawl webtext is full of them.
Instead we mirror urlparse's netloc/scheme split with unicode-safe regexes
(still whole-stage-codegen'd, no Python in the hot path):

- scheme  = chars before the first ':' when the url starts like a scheme
- netloc  = everything between '//' and the next '/', '?' or '#'
- no match → empty string → base_url degrades to '://', exactly like
  ``urlparse("None")`` does in the reference (link_type INVALID path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):"
_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"


def scheme_col(url: Column) -> Column:
    return F.regexp_extract(url, _SCHEME_RE, 1)


def domain_col(url: Column) -> Column:
    """Hostname (urlparse netloc, incl. port if present — parity)."""
    return F.regexp_extract(url, _NETLOC_RE, 1)


def base_url_col(url: Column) -> Column:
    """scheme://netloc — parity with `_get_base_url` (crawler.py:29-33)."""
    return F.concat(scheme_col(url), F.lit("://"), domain_col(url))


def registrable_suffix_col(url: Column) -> Column:
    """Last two host labels — parity with `_is_same_subbdomain`
    (backlink_analyser.py:23-26): ``netloc.split(".")[-2:]``."""
    parts = F.split(domain_col(url), r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.concat_ws(".", F.slice(parts, n - 1, 2))) \
            .otherwise(F.concat_ws(".", parts))
