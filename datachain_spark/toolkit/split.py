"""Free-function split API. Parity:
/root/reference/src/datachain/toolkit/split.py:9-105 — same signature
(chain, weights, seed); delegates to DataChain.train_test_split, whose
deterministic seeded-hash boundaries replace the reference's sys__rand
buckets (partition-stable under retries; see chain.py)."""

from __future__ import annotations

from typing import Optional, Sequence

from ..chain import DataChain


def train_test_split(
    dc: DataChain,
    weights: Sequence[float],
    seed: Optional[int] = None,
) -> list[DataChain]:
    """Split ``dc`` into disjoint subsets sized by ``weights`` (e.g.
    ``[0.7, 0.2, 0.1]`` for train/val/test)."""
    return dc.train_test_split(list(weights), seed=42 if seed is None else seed)
