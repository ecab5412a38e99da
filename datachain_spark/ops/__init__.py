"""Operator library beyond the core chain: diff, dedup, similarity search,
text analysis, retrieval, data selection, multimodal plumbing."""

from . import (
    asof,
    c4,
    dedup,
    diff,
    interval,
    multimodal,
    packing,
    pq,
    retrieval,
    selection,
    semdedup,
    similarity,
    sketches,
    text,
    zorder,
)

__all__ = [
    "asof",
    "c4",
    "dedup",
    "diff",
    "interval",
    "multimodal",
    "packing",
    "pq",
    "retrieval",
    "selection",
    "semdedup",
    "similarity",
    "sketches",
    "text",
    "zorder",
]
