"""Reference-parity scoring oracle + naive BM25 oracle.

Replicates (from observed behavior):
- score normalizers           reference src/modules/normalizer.py:4-41
- query-word preprocessing    src/modules/document_score_calculator.py:8-10
- candidate assembly + TF-IDF src/modules/document_score_calculator.py:12-66
- the full re-rank pipeline   src/modules/pagerank.py:27-149
- scan order                  UNION ALL over partitions a..z,default in
                              declaration order, insertion order within each
                              (src/services/DocumentIndexService.py:46-58 +
                              indexer.py insertion order) — SURVEY.md §8 Q3.

Quirks deliberately preserved (SURVEY.md §8): Q1 asymmetric tokenization,
Q2 candidate-relative IDF, Q3 first-match survivorship, Q4 pinned argmax doc,
Q5 sequential z-score re-rank (authority pass REPLACES the score), Q6 stable
sort ties. Duplicate query words double-count document-frequency AND add
their term score twice (no break in the df loop) — also preserved.

The BM25 oracle is this engine's own scoring mode (north star: k1=1.2,
b=0.75, Lucene-style idf), computed in plain float64 as the spec for the
distributed scorer.
"""

from __future__ import annotations

import math
import string
from dataclasses import dataclass, field

from .htmltext import TAG_WEIGHTS, base_url, extract_text, index_rows, partition_key

_PARTITION_ORDER = list(string.ascii_lowercase) + ["default"]


# ---------------------------------------------------------------------------
# normalizers — normalizer.py:4-41 (population σ, index-based quartiles)
# ---------------------------------------------------------------------------

def min_max(scores: list[float]) -> list[float]:
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [1.0] * len(scores)
    return [(s - lo) / (hi - lo) for s in scores]


def z_score(scores: list[float]) -> list[float]:
    mean = sum(scores) / len(scores)
    std = (sum((s - mean) ** 2 for s in scores) / len(scores)) ** 0.5
    if std == 0:
        return [0.0] * len(scores)
    return [(s - mean) / std for s in scores]


def log_transform(scores: list[float]) -> list[float]:
    return [math.log(s + 1) for s in scores]


def robust_scale(scores: list[float]) -> list[float]:
    s = sorted(scores)
    n = len(scores)
    median = s[n // 2]
    q1, q3 = s[n // 4], s[3 * n // 4]
    iqr = q3 - q1
    if iqr == 0:
        return [0.0] * len(scores)
    return [(x - median) / iqr for x in scores]


def clip_scores(scores: list[float], lo: float, hi: float) -> list[float]:
    return [max(min(s, hi), lo) for s in scores]


def exp_transform(scores: list[float]) -> list[float]:
    return [1 - math.exp(-s) for s in scores]


# ---------------------------------------------------------------------------
# reference query pipeline
# ---------------------------------------------------------------------------

def preprocess_words(words: list[str]) -> list[str]:
    """document_score_calculator.py:8-10 — drops non-isalnum words, keeps dups."""
    return [w.lower().strip() for w in words if w.isalnum()]


@dataclass
class OracleIndex:
    """In-memory replica of the 27 partition tables with exact scan order."""

    partitions: dict[str, list[tuple[str, str, int, int, str]]] = field(
        default_factory=lambda: {k: [] for k in _PARTITION_ORDER}
    )
    pages_meta: dict[str, tuple[str | None, str | None]] = field(default_factory=dict)

    def add_page(self, url: str, content: str,
                 title: str | None = None, description: str | None = None) -> None:
        for row in index_rows(url, content):
            self.partitions[partition_key(row[1])].append(row)
        self.pages_meta[url] = (title, description)

    def scan_words(self, words: list[str]) -> list[tuple[str, str, int, int, str]]:
        """word IN (...) over all partitions in declaration+insertion order."""
        wanted = set(words)
        out = []
        for key in _PARTITION_ORDER:
            out.extend(r for r in self.partitions[key] if r[1] in wanted)
        return out


@dataclass
class OracleDoc:
    url: str
    # word_frequencies: (word, frequency, location, tag) — one per matched
    # query word, first index row in scan order (Q3)
    wfs: list[tuple[str, int, int, str]]
    score: float = 0.0
    title: str | None = None
    description: str | None = None
    pinned: bool = False


def _candidates(words_raw: list[str],
                indices: list[tuple[str, str, int, int, str]]) -> list[OracleDoc]:
    """convert_indices_to_document parity (doc order = first appearance)."""
    words = preprocess_words(words_raw)
    doc_map: dict[str, list[tuple[str, str, int, int, str]]] = {}
    for row in indices:
        doc_map.setdefault(row[0], []).append(row)
    docs = []
    for url, rows in doc_map.items():
        wfs = []
        for word in words:
            for row in rows:
                if word.lower() == row[1].lower():
                    wfs.append((word, row[2], row[3], row[4]))
                    break
        docs.append(OracleDoc(url=url, wfs=wfs))
    return docs


def _tf_idf(words_raw: list[str], docs: list[OracleDoc]) -> None:
    """Candidate-relative TF-IDF (Q2) incl. duplicate-word double counting."""
    words = preprocess_words(words_raw)
    counts = {w: 0 for w in words}
    n = len(docs)
    for w in words:
        for d in docs:
            for wf in d.wfs:
                if wf[0] == w:
                    counts[w] += 1  # no break — duplicates double-count
    for d in docs:
        s = 0.0
        for w in words:
            dfx = counts[w]
            if dfx == 0:
                continue
            f = 0
            for wf in d.wfs:
                if wf[0] == w:
                    f = wf[1]
                    break
            s += f * math.log10(n / dfx)
        d.score = s


def _proximity(d: OracleDoc) -> float:
    locs: dict[str, list[int]] = {}
    for wf in d.wfs:
        locs.setdefault(wf[0], []).append(wf[2])
    words = list(locs.keys())
    best = math.inf
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            dists = [abs(a - b) for a in locs[words[i]] for b in locs[words[j]]]
            if dists:
                best = min(best, min(dists))
    if best == math.inf:
        return 1.0
    return 1 / (1 + best)


_WEIGHTS = {"idf": 0.8, "proximity": 0.5, "weights": 0.3, "authority": 0.1}


def reference_search(index: OracleIndex, raw_query: str,
                     domain_scores: dict[str, float] | None = None,
                     top: int = 10) -> tuple[list[OracleDoc], int]:
    """Full §3.1 lifecycle: normalize → scan → score → pin → re-rank → top-k."""
    domain_scores = domain_scores or {}
    query_pp = extract_text(raw_query)
    words = query_pp.split(" ")
    indices = index.scan_words(words)
    docs = _candidates(words, indices)
    _tf_idf(words, docs)
    if not docs:
        return [], 0
    # Q4: pin argmax by FIRST matched word's tf (first maximal in doc order)
    pinned = max(docs, key=lambda d: d.wfs[0][1])
    pinned.pinned = True
    rest = [d for d in docs if d is not pinned]

    def norm(vals: list[float]) -> list[float]:
        return vals if not vals else z_score(vals)

    # pass 1 — authority REPLACES score (Q5)
    z_idf = norm([d.score for d in rest])
    auth = norm([domain_scores.get(base_url(d.url), 0) for d in rest])
    for i, d in enumerate(rest):
        d.score = _WEIGHTS["idf"] * z_idf[i] + _WEIGHTS["authority"] * auth[i]
    # pass 2 — mean tag weight
    tagw = norm([
        sum(TAG_WEIGHTS.get(wf[3], 1.0) for wf in d.wfs) / len(d.wfs) for d in rest
    ])
    for i, d in enumerate(rest):
        d.score += _WEIGHTS["weights"] * tagw[i]
    # pass 3 — proximity
    prox = norm([_proximity(d) for d in rest])
    for i, d in enumerate(rest):
        d.score += _WEIGHTS["proximity"] * prox[i]

    rest.sort(key=lambda d: d.score, reverse=True)  # stable (Q6)
    ranked = [pinned] + rest
    for d in ranked:
        meta = index.pages_meta.get(d.url)
        if meta:
            d.title, d.description = meta
    return ranked[:top], len(ranked)


# ---------------------------------------------------------------------------
# BM25 oracle (engine mode)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term(tf: int, dl: int, avgdl: float, idf: float,
              k1: float = BM25_K1, b: float = BM25_B) -> float:
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_search(corpus_tokens: dict[int, list[str]], raw_query: str,
                k: int = 10) -> list[tuple[int, float]]:
    """Exhaustive BM25 over tokenized docs {doc_id: [terms...]}.

    Query normalization = the engine's query path (extract_text on the raw
    string), unique terms in first-appearance order. Tie-break:
    (score desc, doc_id asc). This is the spec for the distributed scorer.
    """
    terms = list(dict.fromkeys(t for t in extract_text(raw_query).split(" ") if t))
    n = len(corpus_tokens)
    if n == 0 or not terms:
        return []
    dls = {d: len(toks) for d, toks in corpus_tokens.items()}
    avgdl = sum(dls.values()) / n
    scores: dict[int, float] = {}
    for t in terms:
        df = sum(1 for toks in corpus_tokens.values() if t in toks)
        if df == 0:
            continue
        idf = bm25_idf(n, df)
        for d, toks in corpus_tokens.items():
            tf = toks.count(t)
            if tf:
                scores[d] = scores.get(d, 0.0) + bm25_term(tf, dls[d], avgdl, idf)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
