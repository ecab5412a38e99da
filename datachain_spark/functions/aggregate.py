"""Aggregate + window functions.

Parity: /root/reference/src/datachain/func/aggregate.py:9-379 and
/root/reference/src/datachain/func/window.py:7-48. The reference's aggregate
surface is: count, sum, avg, min, max, any_value, collect, concat
(group_concat), plus window row_number/rank/dense_rank/first.

Spark extras the reference lacks (SURVEY.md §2.6 — "Spark gives these free,
expose them"): lag, lead, ntile, percent_rank, cume_dist, approx quantiles,
count_distinct, stddev/variance, grouping sets via native DataFrame API.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from ..columns import to_column

ColumnLike = Union[str, Column]


def count(col: Optional[ColumnLike] = None) -> Column:
    """func/aggregate.py:9."""
    return F.count(to_column(col)) if col is not None else F.count(F.lit(1))


def sum(col: ColumnLike) -> Column:  # noqa: A001
    """func/aggregate.py:42."""
    return F.sum(to_column(col))


def avg(col: ColumnLike) -> Column:
    """func/aggregate.py:68 (sqlite compile base.py:585-587)."""
    return F.avg(to_column(col))


def min(col: ColumnLike) -> Column:  # noqa: A001
    """func/aggregate.py:94."""
    return F.min(to_column(col))


def max(col: ColumnLike) -> Column:  # noqa: A001
    """func/aggregate.py:120."""
    return F.max(to_column(col))


def any_value(col: ColumnLike) -> Column:
    """func/aggregate.py:146 (sqlite base.py:593-598)."""
    return F.any_value(to_column(col))


def collect(col: ColumnLike) -> Column:
    """func/aggregate.py:177 — collect group values into an array
    (sqlite json_group_array, base.py:600-603). Order within the array is
    nondeterministic, as in the reference."""
    return F.collect_list(to_column(col))


def concat(col: ColumnLike, separator: str = "") -> Column:
    """func/aggregate.py:210 — group_concat (sqlite base.py:589-591).
    Unordered in the reference; callers needing determinism should sort first
    or use sorted_concat."""
    return F.array_join(F.collect_list(to_column(col).cast("string")), separator)


def sorted_concat(col: ColumnLike, separator: str = "") -> Column:
    """Deterministic variant of concat (element-sorted) — useful for
    oracle-comparable output where the reference's group_concat order is
    undefined."""
    return F.array_join(
        F.array_sort(F.collect_list(to_column(col).cast("string"))), separator
    )


# ---- window ----------------------------------------------------------------

def window(partition_by: ColumnLike, order_by: ColumnLike, desc: bool = False) -> WindowSpec:
    """func/window.py:7-48 — single partition + order column in the
    reference; we accept the same signature (lists also work)."""
    parts = partition_by if isinstance(partition_by, (list, tuple)) else [partition_by]
    orders = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    ocols = [to_column(o).desc() if desc else to_column(o) for o in orders]
    return Window.partitionBy(*[to_column(p) for p in parts]).orderBy(*ocols)


def row_number() -> Column:
    """func/aggregate.py:267."""
    return F.row_number()


def rank() -> Column:
    """func/aggregate.py:294."""
    return F.rank()


def dense_rank() -> Column:
    """func/aggregate.py:321."""
    return F.dense_rank()


def first(col: ColumnLike) -> Column:
    """func/aggregate.py:349 — first value in window order."""
    return F.first(to_column(col))


# Spark-native extras (no reference counterpart — SURVEY.md §2.6)
lag = F.lag
lead = F.lead
ntile = F.ntile
percent_rank = F.percent_rank
cume_dist = F.cume_dist


# Approximate aggregates (SURVEY.md §2.5 "not present" in the reference;
# essential at 100 TB — sketch-based, fixed memory)
def approx_count_distinct(col: ColumnLike, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count."""
    return F.approx_count_distinct(to_column(col), rsd)


def approx_percentile(col: ColumnLike, percentage, accuracy: int = 10000) -> Column:
    """Approximate quantile(s) with bounded error."""
    return F.percentile_approx(to_column(col), percentage, accuracy)


def stddev(col: ColumnLike) -> Column:
    return F.stddev(to_column(col))


def variance(col: ColumnLike) -> Column:
    return F.variance(to_column(col))


def count_distinct(*cols: ColumnLike) -> Column:
    return F.count_distinct(*[to_column(c) for c in cols])
