"""String functions. Parity: /root/reference/src/datachain/func/string.py.

All are native Spark SQL expressions (JVM whole-stage codegen) — the reference
implements several as registered Python callables in SQLite
(/root/reference/src/datachain/sql/sqlite/base.py:183-260); here they're free.
"""

from __future__ import annotations

import re as _re
from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column

ColumnLike = Union[str, Column]


def length(col: ColumnLike) -> Column:
    """func/string.py:18 — character length."""
    return F.length(to_column(col))


def split(col: ColumnLike, sep: str, limit: Optional[int] = None) -> Column:
    """func/string.py:47 — literal-separator split (reference uses
    str.split, not regex), optional limit."""
    pattern = _re.escape(sep)
    if limit is not None:
        # python's str.split(sep, limit) yields limit+1 parts max
        return F.split(to_column(col), pattern, limit + 1)
    return F.split(to_column(col), pattern)


def replace(col: ColumnLike, pattern: str, replacement: str) -> Column:
    """func/string.py:91 — literal substring replace."""
    return F.replace(to_column(col), F.lit(pattern), F.lit(replacement))


def regexp_replace(col: ColumnLike, regex: str, replacement: str) -> Column:
    """func/string.py:133."""
    return F.regexp_replace(to_column(col), regex, replacement)


def levenshtein(a: ColumnLike, b: ColumnLike) -> Column:
    """Edit distance (no reference counterpart; native in Spark and DuckDB —
    useful for fuzzy dedup at the candidate-verification stage)."""
    return F.levenshtein(to_column(a), to_column(b))


def byte_hamming_distance(a: ColumnLike, b: ColumnLike) -> Column:
    """func/string.py:179 — count of differing positions of two equal-length
    strings (reference zips and compares bytes,
    sql/sqlite/base.py:206-216). Implemented with higher-order functions —
    stays JVM-side, no Python UDF."""
    ca, cb = to_column(a), to_column(b)
    pairs = F.zip_with(
        F.split(ca, ""), F.split(cb, ""), lambda x, y: (x != y).cast("int")
    )
    diff = F.aggregate(pairs, F.lit(0), lambda acc, v: acc + F.coalesce(v, F.lit(1)))
    # differing lengths count the overhang as all-different (zip_with pads nulls)
    return diff
