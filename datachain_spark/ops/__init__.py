"""Operator library beyond the core chain: diff, dedup, similarity search,
text analysis, multimodal plumbing."""
