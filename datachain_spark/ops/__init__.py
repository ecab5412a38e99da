"""Operator library beyond the core chain: diff, dedup, similarity search,
text analysis, multimodal plumbing."""

from . import dedup, diff, multimodal, similarity, text

__all__ = ["dedup", "diff", "multimodal", "similarity", "text"]
