"""Conditional functions.

Parity: /root/reference/src/datachain/func/conditional.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..columns import to_column, unwrap

ColumnLike = Union[str, Column]


def greatest(*cols: ColumnLike) -> Column:
    """func/conditional.py:16 (sqlite max compile base.py:525-576).
    Single arg returns it unchanged, like the reference."""
    cs = [to_column(c) for c in cols]
    return cs[0] if len(cs) == 1 else F.greatest(*cs)


def least(*cols: ColumnLike) -> Column:
    """func/conditional.py:57."""
    cs = [to_column(c) for c in cols]
    return cs[0] if len(cs) == 1 else F.least(*cs)


def case(*args: tuple[Any, Any], else_: Any = None) -> Column:
    """func/conditional.py:94 — chained (condition, value) pairs."""
    if not args:
        raise ValueError("case() requires at least one (condition, value) pair")
    cond, val = args[0]
    expr = F.when(unwrap(cond), unwrap(val))
    for cond, val in args[1:]:
        expr = expr.when(unwrap(cond), unwrap(val))
    return expr.otherwise(unwrap(else_))


def ifelse(condition, if_val, else_val) -> Column:
    """func/conditional.py:164."""
    return F.when(unwrap(condition), unwrap(if_val)).otherwise(unwrap(else_val))


def isnone(col: ColumnLike) -> Column:
    """func/conditional.py:192."""
    return to_column(col).isNull()


def or_(*conds) -> Column:
    """func/conditional.py:220."""
    out = unwrap(conds[0])
    for c in conds[1:]:
        out = out | unwrap(c)
    return out


def and_(*conds) -> Column:
    """func/conditional.py:255."""
    out = unwrap(conds[0])
    for c in conds[1:]:
        out = out & unwrap(c)
    return out


def not_(cond) -> Column:
    """func/conditional.py:290."""
    return ~unwrap(cond)
