"""Numeric / bitwise functions.

Parity: /root/reference/src/datachain/func/numeric.py (SQLite compile rules at
/root/reference/src/datachain/sql/sqlite/base.py:416-450).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column

ColumnLike = Union[str, Column]


def bit_and(a: ColumnLike, b) -> Column:
    """func/numeric.py:7."""
    return to_column(a).bitwiseAND(to_column(b))


def bit_or(a: ColumnLike, b) -> Column:
    """func/numeric.py:52."""
    return to_column(a).bitwiseOR(to_column(b))


def bit_xor(a: ColumnLike, b) -> Column:
    """func/numeric.py:97."""
    return to_column(a).bitwiseXOR(to_column(b))


def int_hash_64(col: ColumnLike) -> Column:
    """func/numeric.py:142 — 64-bit integer hash. The reference implements an
    xxhash-style mix in Python (sql/sqlite/base.py:187-198); we use Spark's
    native xxhash64 (different hash family, same contract: deterministic
    64-bit dispersion)."""
    return F.xxhash64(to_column(col))


def bit_hamming_distance(a: ColumnLike, b) -> Column:
    """func/numeric.py:178 — popcount(a XOR b)
    (sql/sqlite/base.py:200-204). Native bit_count, JVM-side."""
    return F.bit_count(to_column(a).bitwiseXOR(to_column(b)))
