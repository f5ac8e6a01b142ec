from .query_bm25 import BM25Index  # noqa: F401
from .refrank import reference_rank  # noqa: F401
from .pagerank import pagerank, indegree_authority  # noqa: F401
