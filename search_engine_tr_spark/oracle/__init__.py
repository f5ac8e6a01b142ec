"""Pure-Python oracle: the reference engine's semantics, re-implemented from
its observable behavior as the parity spec for the Spark engine.

NOTE ON THE PARITY TARGET: the reference (`/root/reference`) uses
``BeautifulSoup(content, 'html.parser')`` (bs4 4.12 + stdlib html.parser).
bs4/lxml are not installable in this environment, so this package vendors a
careful stdlib-``html.parser``-based re-implementation of the exact subset of
bs4 behavior the reference exercises (get_text granularity, script/style/
comment exclusion per bs4>=4.9 string_containers, find_all document order,
lxml ``.text`` direct-text semantics for links/title). This module IS the
byte-identical spec the Spark engine is tested against.

No Spark imports here — the oracle must run on executors and in plain pytest.
"""

from .htmltext import (  # noqa: F401
    TAG_WEIGHTS,
    INVALID_FILE_EXTENSIONS,
    base_url,
    link_type,
    parse_document,
    extract_text,
    tokenize,
    index_rows,
    partition_key,
)
from .refscore import (  # noqa: F401
    min_max,
    z_score,
    log_transform,
    robust_scale,
    clip_scores,
    exp_transform,
    preprocess_words,
    reference_search,
    bm25_search,
)
