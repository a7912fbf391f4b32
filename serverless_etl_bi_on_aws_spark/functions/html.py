"""HTML main-text / boilerplate extraction (X5 extension; round-14
verdict Missing #2) — the first real-world stage of any crawl-corpus
curation funnel (the trafilatura/jusText class, re-expressed as a
deterministic rule set so an independent oracle can recompute it).

Every real pretraining corpus starts as HTML; the ``documents`` fixture
is already clean text, so this module owns the step that turns markup
into funnel input:

  1. parse with a tolerant event parser (stdlib ``html.parser`` — never
     throws on malformed markup, entities decoded in-stream);
  2. DROP non-content subtrees entirely: ``<script> <style> <noscript>
     <template> <svg> <head>`` and comments;
  3. split text into BLOCKS at block-level element boundaries
     (``p div li h1-h6 td ...``) — inline tags (``b i a span``) do not
     split;
  4. score each block: word count and LINK DENSITY (fraction of the
     block's characters inside ``<a>``) — the two classic boilerplate
     discriminators (navigation/footer blocks are short and ~100%
     linked, body prose is long and barely linked);
  5. keep blocks with ``words >= min_words`` and
     ``link_density <= max_link_density``; the clean text is the kept
     blocks joined with ``\\n``, whitespace-normalized within a block.

The rule set is deliberately closed-form (no ML, no global state) so
q86's oracle can re-assemble the expected clean text from planted
arithmetic alone — the q73 two-independent-implementations discipline.

Scale shape: :func:`extract_main_text` is ONE Arrow-vectorized pandas
UDF — map-only, no exchange, composes into any plan before the funnel's
quality gate (``operators/curation.curation_stages(html_input=True)``).
The parser is per-row Python inside the Arrow batch, the same accepted
shape as the image/audio codecs (a C-backed parser drops in behind the
same column contract, exactly like the codec plugin registry).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: subtrees that never contribute text
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head"})

#: elements whose start OR end tag terminates the current text block
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
        "td", "th", "tr", "table", "section", "article", "header", "footer",
        "nav", "aside", "blockquote", "pre", "br", "hr", "form", "figure",
        "figcaption", "main", "body", "html", "title", "dd", "dt", "dl",
    }
)

#: void elements that never nest (malformed-markup tolerance: an
#: unclosed <br>/<hr>/<img> must not unbalance the skip/anchor depth)
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _BlockExtractor(HTMLParser):
    """Event-driven block builder: accumulates (text, link_chars) per
    block-level boundary, entities already decoded by the parser
    (``convert_charrefs=True``), skip-subtree and anchor depths tracked
    as counters so malformed nesting degrades instead of throwing."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (normalized text, link chars)
        self._parts: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars))
        self._parts, self._link_chars = [], 0

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag, attrs):  # noqa: D102 - <br/> etc.
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip_depth = max(self._skip_depth - 1, 0)
            return
        if tag in _VOID_TAGS:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth = max(self._a_depth - 1, 0)

    def handle_data(self, data):  # noqa: D102
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_chars += len("".join(data.split()))

    def close(self):  # noqa: D102
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[tuple[str, int]]:
    """Pure-Python core (testable without Spark): the document's text
    blocks as ``(normalized_text, link_chars)`` after subtree drops."""
    p = _BlockExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # noqa: BLE001 - parser is tolerant; belt+braces
        p._flush()
    return p.blocks


def clean_html_text(
    html: str, min_words: int = 3, max_link_density: float = 0.34
) -> tuple[str, int, int]:
    """Extract main text from one document: returns
    ``(clean_text, blocks_kept, blocks_dropped)``. A block survives iff
    it has at least ``min_words`` whitespace words AND at most
    ``max_link_density`` of its non-space characters inside anchors."""
    kept, dropped = [], 0
    for text, link_chars in extract_blocks(html):
        chars = len("".join(text.split()))
        words = len(text.split())
        if words >= min_words and (
            chars == 0 or link_chars / chars <= max_link_density
        ):
            kept.append(text)
        else:
            dropped += 1
    return "\n".join(kept), len(kept), dropped


class _LinkExtractor(HTMLParser):
    """Event-driven outlink collector: every ``<a href>`` value outside
    the dropped subtrees (``_SKIP_TAGS``), in document order. The parser
    treats ``<script>``/``<style>`` content as raw text, so a literal
    ``<a href=...>`` inside a script string is never reported — pinned in
    tests. Same tolerance contract as :class:`_BlockExtractor`."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def _take(self, tag, attrs) -> None:
        if tag == "a" and not self._skip_depth:
            for name, val in attrs:
                if name == "href" and val:
                    self.hrefs.append(val)
                    break

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        self._take(tag, attrs)

    def handle_startendtag(self, tag, attrs):  # noqa: D102
        if tag not in _SKIP_TAGS:
            self._take(tag, attrs)

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP_TAGS:
            self._skip_depth = max(self._skip_depth - 1, 0)


#: schemes that are never navigable document links
_NON_NAV_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def extract_link_hrefs(html: str, base_url: str | None = None) -> list[str]:
    """Pure-Python core: the document's outlinks in order.

    Non-navigable schemes (``javascript: mailto: tel: data: about:``)
    and pure-fragment hrefs (``#top``) are dropped; everything else is
    resolved against ``base_url`` with stdlib ``urljoin`` (absolute
    hrefs pass through unchanged) and its fragment stripped. Duplicates
    are KEPT — edge dedup is the graph builder's job, not the parser's."""
    from urllib.parse import urldefrag, urljoin

    p = _LinkExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # noqa: BLE001 - tolerant parse, same as blocks
        pass
    out: list[str] = []
    for href in p.hrefs:
        h = href.strip()
        if not h or h.startswith("#"):
            continue
        low = h.lower()
        if any(low.startswith(s) for s in _NON_NAV_SCHEMES):
            continue
        resolved = urljoin(base_url, h) if base_url else h
        resolved = urldefrag(resolved)[0]
        if resolved:
            out.append(resolved)
    return out


def extract_links(
    html_col: str | Column, base_url_col: str | Column | None = None
) -> Column:
    """Column expression: ``array<string>`` of the document's outlinks
    (see :func:`extract_link_hrefs`). One Arrow-vectorized pandas UDF —
    map-only, no exchange; feeds ``operators/graph.extract_link_edges``."""
    from pyspark.sql.types import ArrayType

    col = F.col(html_col) if isinstance(html_col, str) else html_col
    if base_url_col is None:
        @F.pandas_udf(ArrayType(StringType()))
        def _links(s: pd.Series) -> pd.Series:
            return pd.Series([extract_link_hrefs(h) for h in s])

        return _links(col)

    base = F.col(base_url_col) if isinstance(base_url_col, str) else base_url_col

    @F.pandas_udf(ArrayType(StringType()))
    def _links_base(s: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_link_hrefs(h, u) for h, u in zip(s, b)]
        )

    return _links_base(col, base)


_HTML_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("blocks_kept", IntegerType()),
        StructField("blocks_dropped", IntegerType()),
    ]
)


def extract_main_text(
    html_col: str | Column,
    min_words: int = 3,
    max_link_density: float = 0.34,
) -> Column:
    """Column expression: boilerplate-stripped main text of an HTML
    column, as a struct ``(text, blocks_kept, blocks_dropped)``. One
    Arrow-vectorized pandas UDF — map-only, no exchange; select
    ``.getField("text")`` for the funnel input."""
    @F.pandas_udf(_HTML_STRUCT)
    def _extract(s: pd.Series) -> pd.DataFrame:
        rows = [clean_html_text(h, min_words, max_link_density) for h in s]
        return pd.DataFrame(rows, columns=["text", "blocks_kept", "blocks_dropped"])

    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return _extract(col)
