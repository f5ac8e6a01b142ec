"""Reference-parity HTML parsing, text extraction and tokenization.

Replicates (from observed behavior, not copied code):

- ``Crawler._preprocess_document``  reference src/modules/crawler.py:113-168
  (query-side normalization + the ``text`` column's byte-identical contract)
- ``Crawler.get_document_frequency`` reference src/modules/crawler.py:217-245
  (index-side positional tokenizer; NOTE the deliberate asymmetry with the
  query path — SURVEY.md §8 Q1)
- ``Crawler.get_links`` / ``_get_link_type``  crawler.py:43-87
- ``Crawler.get_meta_tags``                   crawler.py:89-111
- partition routing ``word.lower()[0]`` → a-z else "default"
                                               src/models/db.py:105-109
- indexer row emission order                   indexer.py:24-38

bs4-semantics notes (pinned bs4==4.12.3 + 'html.parser' in the reference):
- ``get_text`` excludes <script>/<style> content, comments, doctypes and
  processing instructions (bs4>=4.9 ``string_containers``) — on BOTH the
  extraction and the per-tag tokenizer path.
- ``get_text(separator=' ', strip=True)`` strips each text *node* and joins
  the non-empty ones with a single space. Text-node granularity matters:
  ``hel<!--x-->lo`` extracts to ``"hel lo"`` on the extraction path but
  tokenizes to ``"hello"`` on the index path (separator='').
- Python ``str.lower()`` maps ``İ`` → ``i`` + U+0307 (combining dot above);
  U+0307 is not ``\\w``, so the extraction path turns ``İZMİR`` into
  ``"i zmi r"`` while the index tokenizer (which *removes* non-word chars
  instead of replacing with space) yields ``"izmir"``. Verified empirically;
  replicate, don't fix.
"""

from __future__ import annotations

import re
import string
import unicodedata
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urlparse

# reference src/utils/__init__.py:13-21
TAG_WEIGHTS: dict[str, float] = {
    "title": 2.0,
    "h1": 1.5,
    "h2": 1.2,
    "h3": 1.1,
    "p": 1.0,
    "a": 0.8,
    "span": 0.5,
}

# reference config.json crawler.invalid_file_extensions
INVALID_FILE_EXTENSIONS = (
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx", ".csv",
    ".zip", ".rar", ".tar", ".gz", ".7z", ".mp3", ".mp4", ".avi", ".mkv",
    ".mov", ".flv", ".wmv", ".wav", ".ogg", ".jpg", ".jpeg", ".png",
    ".gif", ".svg", ".bmp", ".webp",
)

_ASCII_LOWER = set(string.ascii_lowercase)
_NON_WORD_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")
_MAX_TEXT_LEN = 100_000  # crawler.py:151
# crawler.py:157-163 — ç/ö/ü deliberately NOT folded
_TR_FOLD = (("ı", "i"), ("ğ", "g"), ("ş", "s"))

_SKIP_CONTENT = {"script", "style"}


@dataclass
class _TagRecord:
    name: str
    chunks: list[str] = field(default_factory=list)


@dataclass
class ParsedDoc:
    """Single-pass parse of one HTML document."""

    text_chunks: list[str] = field(default_factory=list)  # visible text nodes
    tag_records: list[_TagRecord] = field(default_factory=list)  # TAG_WEIGHTS tags, doc order
    links: list[tuple[str | None, str | None]] = field(default_factory=list)  # (href, direct text)
    title: str | None = None
    description: str | None = None
    keywords: str | None = None


class _RefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.doc = ParsedDoc()
        self._skip = 0  # inside script/style
        self._stack: list[_TagRecord | None] = []  # parallels open TAG_WEIGHTS elems
        self._open_names: list[str] = []
        self._open_recs: list[_TagRecord] = []
        # lxml `.text` semantics: direct text before the first child element
        self._link_capture: list[list[str]] | None = None
        self._title_capture: list[str] | None = None
        self._title_done = False

    # -- helpers ---------------------------------------------------------
    def _stop_direct_captures(self) -> None:
        # a new child element terminates lxml-style `.text` capture
        if self._link_capture is not None:
            self._link_capture = None
        if self._title_capture is not None:
            self._finish_title()

    def _finish_title(self) -> None:
        if self._title_capture is not None and not self._title_done:
            text = "".join(self._title_capture)
            self.doc.title = text if text else None
            self._title_done = True
        self._title_capture = None

    # -- tag events ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._stop_direct_captures()
        if tag in _SKIP_CONTENT:
            # CDATA content mode: script/style cannot contain child elements,
            # so they are not pushed onto the element stack at all.
            self._skip += 1
            return
        if tag == "meta":
            self._handle_meta(attrs)
        rec: _TagRecord | None = None
        if tag in TAG_WEIGHTS:
            rec = _TagRecord(tag)
            self.doc.tag_records.append(rec)
            self._open_recs.append(rec)
        self._open_names.append(tag)
        self._stack.append(rec)
        if tag == "a":
            href = None
            for k, v in attrs:
                if k == "href":
                    href = v
                    break
            parts: list[str] = []
            self.doc.links.append((href, parts))  # type: ignore[arg-type]
            self._link_capture = parts  # type: ignore[assignment]
        elif tag == "title" and not self._title_done:
            self._title_capture = []

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._stop_direct_captures()
        if tag == "meta":
            self._handle_meta(attrs)
        if tag in TAG_WEIGHTS:
            rec = _TagRecord(tag)
            self.doc.tag_records.append(rec)
            if tag == "a":
                href = None
                for k, v in attrs:
                    if k == "href":
                        href = v
                        break
                self.doc.links.append((href, []))  # type: ignore[arg-type]

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._finish_title()
        if self._link_capture is not None and tag == "a":
            self._link_capture = None
        if tag in _SKIP_CONTENT and self._skip:
            self._skip -= 1
            return
        # bs4 html.parser builder: implicitly close unclosed inner tags
        if tag in self._open_names:
            while self._open_names:
                name = self._open_names.pop()
                rec = self._stack.pop()
                if rec is not None:
                    self._open_recs.remove(rec)
                if name == tag:
                    break

    # -- data events -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self.doc.text_chunks.append(data)
        for rec in self._open_recs:
            rec.chunks.append(data)
        if self._link_capture is not None:
            self._link_capture.append(data)
        if self._title_capture is not None:
            self._title_capture.append(data)

    # comments / doctype / PI excluded from every text surface (bs4>=4.9)
    def handle_comment(self, data: str) -> None:  # noqa: D102
        pass

    def handle_decl(self, decl: str) -> None:  # noqa: D102
        pass

    def handle_pi(self, data: str) -> None:  # noqa: D102
        pass

    def _handle_meta(self, attrs: list[tuple[str, str | None]]) -> None:
        d = {k: v for k, v in attrs}
        name = d.get("name")
        content = d.get("content")
        if name == "description" and self.doc.description is None and content is not None:
            self.doc.description = content.strip()
        elif name == "keywords" and self.doc.keywords is None and content is not None:
            self.doc.keywords = ",".join(k.strip() for k in content.split(","))


def parse_document(content: str) -> ParsedDoc:
    """One-pass parse; finalize direct-text captures."""
    p = _RefParser()
    p.feed(content)
    p.close()
    p._finish_title()
    doc = p.doc
    # collapse link direct-text parts → lxml `.text` (None when empty)
    doc.links = [
        (href, ("".join(parts) or None) if isinstance(parts, list) else parts)
        for href, parts in doc.links
    ]
    return doc


# ---------------------------------------------------------------------------
# text extraction (query-side pipeline) — crawler.py:113-168
# ---------------------------------------------------------------------------

def extract_text(content: str) -> str:
    """Byte-identical ``text`` column: the reference's _preprocess_document."""
    doc = parse_document(content)
    # get_text(separator=' ', strip=True)
    stripped = (c.strip() for c in doc.text_chunks)
    text = " ".join(s for s in stripped if s)
    text = text.lower()  # İ → i + U+0307 (bug preserved, crawler.py:132-135)
    text = unicodedata.normalize("NFC", text)
    text = _NON_WORD_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text).strip()
    if len(text) > _MAX_TEXT_LEN:
        text = text[:_MAX_TEXT_LEN]
    for src, dst in _TR_FOLD:  # fold AFTER truncation (crawler.py:150-163)
        text = text.replace(src, dst)
    return text


# ---------------------------------------------------------------------------
# index tokenizer — crawler.py:217-245
# ---------------------------------------------------------------------------

def tokenize(content: str) -> list[tuple[str, int, str]]:
    """Positional occurrences ``(word, location, tag)`` in emission order.

    Global location counter across all TAG_WEIGHTS tags in document order;
    nested tags double-count (an <a> inside <p> contributes under both).
    Counter increments only for kept (non-empty after cleanup) words.
    """
    if not content:
        return []
    doc = parse_document(content)
    occurrences: list[tuple[str, int, str]] = []
    index = 0
    for rec in doc.tag_records:
        # tag.get_text() with default separator '' then str.split()
        for word in "".join(rec.chunks).split():
            word = _NON_WORD_RE.sub("", word.lower())
            if word:
                occurrences.append((word, index, rec.name))
                index += 1
    return occurrences


def index_rows(url: str, content: str) -> list[tuple[str, str, int, int, str]]:
    """Indexer row stream for one page, in the reference's insertion order:
    per word in first-occurrence order, per occurrence in location order —
    rows ``(document_url, word, frequency, location, tag)`` (indexer.py:24-38).
    """
    occ = tokenize(content)
    if not occ:
        return []
    by_word: dict[str, list[tuple[int, str]]] = {}
    for word, loc, tag in occ:
        by_word.setdefault(word, []).append((loc, tag))
    rows = []
    for word, details in by_word.items():
        freq = len(details)
        for loc, tag in details:
            rows.append((url, word, freq, loc, tag))
    return rows


def partition_key(word: str) -> str:
    """Alphabet partition routing — src/models/db.py:105-109."""
    key = word.lower()[0]
    return key if key in _ASCII_LOWER else "default"


# ---------------------------------------------------------------------------
# URLs and links — crawler.py:29-66
# ---------------------------------------------------------------------------

def base_url(url: str) -> str:
    u = urlparse(url)
    return f"{u.scheme}://{u.netloc}".strip()


def link_type(page_url: str, link: str) -> str:
    """INTERNAL / EXTERNAL / INVALID — crawler.py:43-66 (order matters)."""
    base = base_url(page_url)
    if any(link.endswith(ext) for ext in INVALID_FILE_EXTENSIONS):
        return "INVALID"
    if base in link:
        return "INTERNAL"
    if base_url(link) == base:
        return "INTERNAL"
    if link.startswith("/"):
        return "INTERNAL"
    if link.startswith("http"):
        return "EXTERNAL"
    return "INVALID"


def extract_links(page_url: str, content: str) -> list[tuple[str, str, str, str | None]]:
    """``get_links`` parity (crawler.py:68-87): all <a> tags in document order
    as ``(type, base_url, href, anchor_text)``. A missing href becomes the
    literal string ``"None"`` (the reference does ``str(link)``), which then
    classifies as INVALID.
    """
    doc = parse_document(content)
    base = base_url(page_url)
    out = []
    for href, anchor in doc.links:
        href_s = str(href)  # None → "None", quirk preserved
        out.append((link_type(page_url, href_s), base, href_s, anchor))
    return out
