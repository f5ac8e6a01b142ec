from .incremental import incremental_index_update, stream_pages_to_postings  # noqa: F401
