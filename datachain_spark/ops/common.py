"""Shared column/plan idioms used across operator modules, single-sourced
so the NULL-group and numeric-policy details live in one place:

- :func:`broadcast_group_join` — the per-group-statistic join-back:
  NULL-SAFE on every group key (NULL group values form their own group —
  the convention flag_outliers/impute/perplexity_buckets share), stats
  side broadcast, helper key columns dropped after the join.
- :func:`exact_mean` — the repo numeric policy for means:
  CAST(exact DECIMAL sum AS DOUBLE) / COUNT, fold-order independent and
  therefore bit-reproducible cross-engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_group_join(
    df: DataFrame,
    groups: Sequence[str],
    stats: DataFrame,
    how: str = "left",
) -> DataFrame:
    """Join per-group ``stats`` (group columns + stat columns) back onto
    ``df``: null-safe on every group key, broadcast, stat columns land
    under their own names. With ``groups`` empty, ``stats`` must be a
    single global row (cross join)."""
    if not groups:
        return df.crossJoin(F.broadcast(stats))
    right = stats.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        *[c for c in stats.columns if c not in groups],
    )
    cond = None
    for g in groups:
        eq = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(F.broadcast(right), cond, how).drop(
        *[f"__g_{g}" for g in groups]
    )


def exact_mean(col: Column) -> Column:
    """Fold-order-independent mean: exact DECIMAL(30,6) sum, one terminal
    double division."""
    return F.sum(col.cast("decimal(30,6)")).cast("double") / F.count(col)
