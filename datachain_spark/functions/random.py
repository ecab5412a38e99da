"""Random / literal helpers.

Parity: /root/reference/src/datachain/func/random.py:6 — ``rand()`` is SQLite
``abs(random())`` (a random 63-bit int). Spark's ``F.rand()`` is U[0,1); we
scale to the reference's integer contract and also expose a seeded,
retry-deterministic variant built on xxhash64 (SURVEY.md §7 determinism note:
Spark rand() is per-task nondeterministic under retries — prefer hashing
stable key columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column

TWO_63 = 2**63


def rand() -> Column:
    """Random non-negative 63-bit integer (reference contract)."""
    return (F.rand() * F.lit(float(TWO_63))).cast("long")


def rand_double(seed: int | None = None) -> Column:
    return F.rand(seed) if seed is not None else F.rand()


def hash_rand(*cols, seed: int = 42) -> Column:
    """Deterministic pseudo-random 63-bit int from stable key columns —
    replaces the reference's sys__rand
    (/root/reference/src/datachain/data_storage/schema.py:269-274) for
    repeatable sample/shuffle/chunk/split at scale."""
    h = F.xxhash64(*[to_column(c) for c in cols], F.lit(seed))
    return F.abs(h)
