"""C4-style line-level cleaning + document gate (Raffel et al. 2020, §2.2).

The public C4 recipe, re-expressed as pure Spark column expressions (zero
shuffles, zero Python UDFs — the whole pass is a per-row projection that
rides whatever scan/filter pipeline surrounds it):

Line rules (a line is kept only if ALL hold):
  - ends in terminal punctuation (. ! ? or closing quote after one)
  - has at least ``min_words_per_line`` words (paper: 3 for the word gate
    on lines; common reimplementations use 5 — parameterized)
  - does not contain the word "javascript" (case-insensitive)
Document rules (the doc is kept only if ALL hold):
  - at least ``min_kept_lines`` surviving lines (paper: 3 "sentences")
  - does not contain "lorem ipsum" (case-insensitive)
  - does not contain a curly brace '{' (code pages)

Output columns: the cleaned text (surviving lines re-joined), per-doc
signals, and the gate verdict — callers either ``.filter("c4_keep")`` or
keep the signals for analysis. The bad-words list of the original paper is
a policy choice and intentionally NOT bundled; pass extra patterns via
``filter_by_domain_blocklist``-style filters upstream.

No reference counterpart (spec addition). Oracle: __spark_entry__
``c4_gate`` replicates every rule in DuckDB list expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# terminal punctuation per C4: . ! ? optionally followed by a closing quote
_TERMINAL_RE = r'[.!?]["”\']?$'


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
    with_signals: bool = False,
) -> DataFrame:
    """Apply the C4 line filters and document gate.

    Returns (id_col, text_col cleaned, n_lines, n_kept_lines, c4_keep
    [, has_lorem_ipsum, has_brace]) with only ``c4_keep`` rows retained
    unless ``with_signals=True`` (then every row is returned with its
    verdict — the gopher_quality_filter convention)."""
    if min_words_per_line < 1:
        raise ValueError("c4_clean: min_words_per_line must be >= 1")
    if min_kept_lines < 1:
        raise ValueError("c4_clean: min_kept_lines must be >= 1")

    def _line_ok(line):
        words = F.split(F.trim(line), r"\s+")
        return (
            (F.trim(line) != "")
            & F.trim(line).rlike(_TERMINAL_RE)
            & (F.size(words) >= min_words_per_line)
            & ~F.lower(line).contains("javascript")
        )

    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, _line_ok)
    nonempty = F.filter(lines, lambda l: F.trim(l) != "")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(nonempty).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        (
            (F.size(kept) >= min_kept_lines) & ~has_lorem & ~has_brace
        ).alias("c4_keep"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
    )
    if with_signals:
        return out
    return out.filter(F.col("c4_keep")).drop(
        "has_lorem_ipsum", "has_brace", "c4_keep"
    )
