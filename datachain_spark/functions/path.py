"""POSIX-path string functions. Parity: /root/reference/src/datachain/func/path.py
(SQLite impls at /root/reference/src/datachain/sql/sqlite/base.py:326-376).

Pure Spark built-ins (substring_index / regexp) — codegen-friendly.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column

ColumnLike = Union[str, Column]


def parent(col: ColumnLike) -> Column:
    """func/path.py:6 — everything before the last '/'; '' if no '/'."""
    c = to_column(col)
    return F.when(
        c.contains("/"),
        F.substring(c, F.lit(1), F.length(c) - F.length(F.substring_index(c, "/", -1)) - F.lit(1)),
    ).otherwise(F.lit(""))


def name(col: ColumnLike) -> Column:
    """func/path.py:35 — final path component."""
    return F.substring_index(to_column(col), "/", -1)


def file_stem(col: ColumnLike) -> Column:
    """func/path.py:65 — file name without the last extension
    (sql/sqlite/base.py:346-373: dot in position 0 is not an extension)."""
    n = name(col)
    return F.when(
        F.regexp_like(n, F.lit(r"^.+\.[^.]*$")), F.regexp_replace(n, r"\.[^.]*$", "")
    ).otherwise(n)


def file_ext(col: ColumnLike) -> Column:
    """func/path.py:95 — extension after the last dot ('' when none)."""
    n = name(col)
    return F.when(
        F.regexp_like(n, F.lit(r"^.+\.[^.]*$")), F.regexp_extract(n, r"\.([^.]*)$", 1)
    ).otherwise(F.lit(""))
