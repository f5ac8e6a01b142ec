"""search_engine_tr_spark — a from-scratch PySpark-native inverted-index build +
BM25 query engine with the query/data-processing capabilities of the reference
web search engine `emso-c/search-engine-tr` (see SURVEY.md).

Layout
------
- ``oracle/``     pure-Python reference semantics (the parity spec; no Spark imports)
- ``functions/``  scalar/vectorized functions: pandas UDFs, codecs, normalizers
- ``sources/``    deterministic fixture synthesis + table IO helpers
- ``plans/``      multi-stage jobs: docid assignment, stats, index build, checkpoints
- ``operators/``  query-time operators: BM25/WAND, reference-parity ranker, PageRank,
                  dedup, similarity search, text analysis
- ``streaming/``  incremental (resumable availableNow-style) index maintenance

Nothing at package import time touches a SparkSession, so the package is safe to
ship via ``spark-submit --py-files``.
"""

__version__ = "0.1.0"
