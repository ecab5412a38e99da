"""Operator library beyond the core chain: diff, dedup, similarity search,
text analysis, multimodal plumbing."""

from . import asof, dedup, diff, interval, multimodal, packing, similarity, text

__all__ = [
    "asof",
    "dedup",
    "diff",
    "interval",
    "multimodal",
    "packing",
    "similarity",
    "text",
]
