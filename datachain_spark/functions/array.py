"""Array / vector functions.

Parity: /root/reference/src/datachain/func/array.py. The reference stores
arrays as JSON text in SQLite and computes distances with numpy inside
registered Python functions (/root/reference/src/datachain/sql/sqlite/vector.py);
here arrays are native ArrayType columns and distances are Spark higher-order
functions — vectorized JVM execution, no Python in the hot path.

Index convention: reference is 0-based (func/array.py:198,325); Spark's
element_at/slice are 1-based — converted here so the user-facing API matches.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column

ColumnLike = Union[str, Column]


def _vec(col) -> Column:
    if isinstance(col, (list, tuple)):
        return F.array(*[F.lit(float(v)) for v in col])
    return to_column(col)


def length(col: ColumnLike) -> Column:
    """func/array.py:118."""
    return F.size(to_column(col))


def contains(col: ColumnLike, elem) -> Column:
    """func/array.py:154."""
    return F.array_contains(to_column(col), elem)


def slice(col: ColumnLike, offset: int, length: int | None = None) -> Column:  # noqa: A001
    """func/array.py:198 — 0-based offset (Spark slice is 1-based)."""
    c = to_column(col)
    if length is None:
        length_col = F.size(c) - F.lit(offset)
        return F.slice(c, F.lit(offset + 1), F.greatest(length_col, F.lit(0)))
    return F.slice(c, offset + 1, length)


def join(col: ColumnLike, sep: str = ",") -> Column:
    """func/array.py:274."""
    return F.array_join(to_column(col), sep)


def get_element(col: ColumnLike, index: int) -> Column:
    """func/array.py:325 — 0-based; null when out of bounds
    (sql/sqlite/base.py:462-469)."""
    return F.get(to_column(col), index)


def sip_hash_64(col: ColumnLike) -> Column:
    """func/array.py:382 — ClickHouse-only in the reference; we provide
    xxhash64 as the 64-bit hash family (documented difference)."""
    return F.xxhash64(to_column(col))


def dot_product(a, b) -> Column:
    """Elementwise dot product via zip_with/aggregate (JVM-side)."""
    ca, cb = _vec(a), _vec(b)
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    ca = _vec(a)
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_distance(a, b) -> Column:
    """func/array.py:10 — 1 - cosine similarity
    (numpy impl: sql/sqlite/vector.py:13-23). Accepts columns or Python
    sequences (query vectors become literal arrays)."""
    ca, cb = _vec(a), _vec(b)
    # try_divide: a zero-norm operand yields NULL distance instead of a
    # DIVIDE_BY_ZERO abort under ANSI mode (non-ANSI division already
    # returned NULL — semantics unchanged there); consumers order with
    # asc_nulls_last / guard the argmin so NULL never ranks first
    return (
        F.lit(1.0) - F.try_divide(dot_product(ca, cb), norm(ca) * norm(cb))
    ).alias("cosine_distance")


def euclidean_distance(a, b) -> Column:
    """func/array.py:65 (sql/sqlite/vector.py:6-10)."""
    ca, cb = _vec(a), _vec(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(ca, cb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    ).alias("euclidean_distance")
