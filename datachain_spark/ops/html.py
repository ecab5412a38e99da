"""HTML -> text extraction for web-corpus ingestion (C4 / RefinedWeb-style
pipelines start from crawled HTML; this is the boilerplate-strip step that
feeds the line/doc gates in ``ops/c4`` and ``ops/text``).

Everything is pure Spark column expressions — a codegen'd ``regexp_replace``
chain, zero shuffles, zero Python UDFs — so the pass rides the surrounding
scan pipeline and survives a 100-TB corpus unchanged. The patterns avoid
backreferences and lookaround so the SAME regex source runs identically
under Java regex (Spark) and RE2 (DuckDB) — that's what makes the operator
oracle-able cross-engine (``html_extract_docs`` in ``__spark_entry__``).

Extraction recipe (the standard tag-strip baseline, not a DOM parser —
trafilatura/jusText-class readability models are policy layers on top):

1. drop ``<head>``/``<script>``/``<style>``/``<noscript>``/``<template>``
   blocks and HTML comments (content is never visible text; the title is
   pulled separately from the raw column before the drop),
2. turn block-level tags into newlines so line structure survives for the
   C4 line gate,
3. strip every remaining tag to a space,
4. decode the common named entities (``&amp;`` LAST so double-encoded
   text decodes exactly once),
5. normalize whitespace (spaces collapse, blank-line runs cap at one
   blank, edges trim).

No reference counterpart (spec addition for the training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block containers whose payload is never prose; no backreferences — one
# pattern per tag so RE2 can run the identical source
_DROP_BLOCK_RES = [
    r"(?is)<head\b[^>]*>.*?</head\s*>",
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<noscript\b[^>]*>.*?</noscript\s*>",
    r"(?is)<template\b[^>]*>.*?</template\s*>",
    r"(?s)<!--.*?-->",
]

# tags that terminate a text line when rendered
_BLOCK_TAG_RE = (
    r"(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|thead|tbody|"
    r"section|article|header|footer|blockquote|pre|form|hr|dt|dd)\b[^>]*>"
)

_ANY_TAG_RE = r"(?s)<[^>]+>"

_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"

# decode order matters: &amp; must be LAST so "&amp;lt;" -> "&lt;" (text),
# never "<" (double decode)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col) -> Column:
    """Extracted visible text of an HTML string as a column expression."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in _DROP_BLOCK_RES:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, _BLOCK_TAG_RE, "\n")
    c = F.regexp_replace(c, _ANY_TAG_RE, " ")
    for ent, repl in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    # whitespace normalization: spaces collapse, space runs around newlines
    # drop, 2+ blank lines become one blank, edges trim
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # trim() strips spaces only — edges may hold newlines from block tags
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_title(col) -> Column:
    """``<title>`` payload (entity-decoded, whitespace-collapsed); empty
    string when the document has none."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, _TITLE_RE, 1)
    for ent, repl in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_extract(
    df: DataFrame,
    id_col: str,
    html_col: str = "html",
    text_col: str = "text",
    with_signals: bool = True,
) -> DataFrame:
    """Extract text + structural signals from an HTML column.

    Returns (id_col, text_col, title[, n_tags, n_links, html_chars,
    text_chars, text_ratio]). ``text_ratio`` (visible chars / raw chars)
    is the standard boilerplate-density signal — low-ratio pages are
    navigation/chrome-heavy and typically gated out downstream. NULL html
    yields NULL text and zeroed signals.
    """
    text = html_to_text(html_col)
    out = df.select(
        F.col(id_col),
        text.alias(text_col),
        html_title(html_col).alias("title"),
    )
    if not with_signals:
        return out
    html_chars = F.coalesce(F.length(html_col), F.lit(0)).cast("long")
    text_chars = F.coalesce(F.length(text), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col),
        text.alias(text_col),
        html_title(html_col).alias("title"),
        F.coalesce(F.regexp_count(F.col(html_col), F.lit(r"(?s)<[a-zA-Z][^>]*>")), F.lit(0))
        .cast("long")
        .alias("n_tags"),
        F.coalesce(F.regexp_count(F.col(html_col), F.lit(r"(?is)<a\s[^>]*href")), F.lit(0))
        .cast("long")
        .alias("n_links"),
        html_chars.alias("html_chars"),
        text_chars.alias("text_chars"),
        F.when(html_chars > 0, text_chars / html_chars)
        .otherwise(F.lit(0.0))
        .alias("text_ratio"),
    )


# RE2-compatible (no backreferences/lookaround) so the DuckDB oracle shares
# it verbatim; Java regex accepts the same syntax. The optional quote also
# captures UNQUOTED hrefs (<a href=foo> — valid HTML5, common in crawls);
# the cost is that a quoted URL containing a literal space truncates at it
# (invalid per the URL spec — browsers require %20 — so the trade is right
# for web-scale extraction).
LINK_PATTERN = r"""(?i)<a\s[^>]*href\s*=\s*["']?([^"'\s<>]+)"""


def extract_links(
    df: DataFrame,
    id_col: str,
    html_col: str = "html",
    absolute_only: bool = False,
    url_col: str = "url",
) -> DataFrame:
    """One (id, url) row per anchor href — the web-graph edge builder that
    feeds ``ops.graph.pagerank``/``degrees`` and per-domain link stats.

    Extraction is a single codegen regexp pass per document + one
    posexplode (``pos`` preserves in-document link order, making rows
    unique even for repeated hrefs); no shuffle — edges stay co-located
    with their source document until the consumer decides a partitioning.
    ``absolute_only`` keeps http(s):// targets only (relative hrefs rarely
    matter for cross-site graphs). NULL/linkless docs yield no rows.
    """
    links = F.regexp_extract_all(F.col(html_col), F.lit(LINK_PATTERN), 1)
    out = df.select(
        F.col(id_col),
        F.posexplode(links).alias("pos", url_col),
    )
    if absolute_only:
        out = out.filter(F.col(url_col).rlike(r"(?i)^https?://"))
    return out
