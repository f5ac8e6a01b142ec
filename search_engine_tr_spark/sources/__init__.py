from .synth import (  # noqa: F401
    gen_pages,
    gen_links,
    pages_schema,
    pages_df,
    pages_df_dist,
    links_df,
    write_pages_parquet,
    reference_queries,
)
from .tables import load_table, load_all, TESTDATA_TABLES  # noqa: F401
