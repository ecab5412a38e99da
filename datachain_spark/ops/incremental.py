"""Incremental aggregate maintenance: keep a grouped rollup current by
scanning ONLY new data.

No reference counterpart (spec addition): the reference's delta flow
re-runs per-row transforms incrementally but cannot maintain aggregates
without a full recompute. This module stores the MERGEABLE state of a
groupBy (per-group additive primitives) so each refresh is

    state' = merge(state, build(delta))        # scans only the delta
    result = finalize(state')                  # projection, no scan

— the materialized-view-refresh shape: at 100 TB the historical corpus is
never rescanned; a refresh shuffles just the delta plus the (#groups)-row
state table on the group key. min/max make the state append-only (no
retractions); count/sum/avg merge under inserts. All semantics match a
full recompute exactly (NULLs ignored per SQL aggregate rules) — the
oracle proves merge(build(a), build(b)) == groupBy(a UNION ALL b).

Spec: ``aggs`` maps output name -> (kind, column), kinds ``count`` (rows;
column ignored), ``count_col`` (non-null), ``sum``, ``min``, ``max``,
``avg``. ``avg`` stores (sum, count) primitives in hidden state columns
and only ``finalize_agg`` divides them out.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("count", "count_col", "sum", "min", "max", "avg")


def _norm(aggs: Mapping[str, Tuple[str, Optional[str]]]) -> dict:
    out = {}
    for name, spec in aggs.items():
        kind, col = (spec if isinstance(spec, (tuple, list)) else (spec, None))
        if kind not in _KINDS:
            raise ValueError(f"unknown agg kind {kind!r} for {name!r}; use {_KINDS}")
        if kind != "count" and col is None:
            raise ValueError(f"agg {name!r} of kind {kind!r} needs a column")
        out[name] = (kind, col)
    return out


def _state_cols(aggs: dict) -> list[str]:
    cols = []
    for name, (kind, _) in aggs.items():
        if kind == "avg":
            cols += [f"{name}__sum", f"{name}__cnt"]
        else:
            cols.append(name)
    return cols


def build_agg_state(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Aggregate a (delta) frame into mergeable per-group state — one
    groupBy on the keys, map-side partial combine does the heavy lifting."""
    aggs = _norm(aggs)
    exprs = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            exprs.append(F.count(F.lit(1)).alias(name))
        elif kind == "count_col":
            exprs.append(F.count(F.col(col)).alias(name))
        elif kind == "sum":
            exprs.append(F.sum(F.col(col)).alias(name))
        elif kind == "min":
            exprs.append(F.min(F.col(col)).alias(name))
        elif kind == "max":
            exprs.append(F.max(F.col(col)).alias(name))
        else:  # avg -> additive primitives
            exprs.append(F.sum(F.col(col)).alias(f"{name}__sum"))
            exprs.append(F.count(F.col(col)).alias(f"{name}__cnt"))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*exprs)


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Combine state tables (old state + new-delta state, or per-shard
    states) into one — union + one groupBy over (#groups)-sized frames;
    the underlying data is NOT rescanned."""
    aggs = _norm(aggs)
    if not states:
        raise ValueError("merge_agg_states: need at least one state")
    expected = list(keys) + _state_cols(aggs)
    unioned = None
    for s in states:
        missing = [c for c in expected if c not in s.columns]
        if missing:
            raise ValueError(f"state missing columns {missing}")
        part = s.select(*expected)
        unioned = part if unioned is None else unioned.unionByName(part)
    exprs = []
    for name, (kind, _) in aggs.items():
        if kind in ("count", "count_col"):
            exprs.append(F.sum(F.col(name)).alias(name))
        elif kind == "sum":
            exprs.append(F.sum(F.col(name)).alias(name))
        elif kind == "min":
            exprs.append(F.min(F.col(name)).alias(name))
        elif kind == "max":
            exprs.append(F.max(F.col(name)).alias(name))
        else:
            exprs.append(F.sum(F.col(f"{name}__sum")).alias(f"{name}__sum"))
            exprs.append(F.sum(F.col(f"{name}__cnt")).alias(f"{name}__cnt"))
    return unioned.groupBy(*[F.col(k) for k in keys]).agg(*exprs)


def finalize_agg(
    state: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Project the user-facing aggregate values out of a state table —
    pure projection, no shuffle, no scan of the underlying data."""
    aggs = _norm(aggs)
    cols = [F.col(k) for k in keys]
    for name, (kind, _) in aggs.items():
        if kind == "avg":
            cnt = F.col(f"{name}__cnt")
            val = F.when(
                cnt > 0, F.col(f"{name}__sum").cast("double") / cnt
            ).alias(name)
            cols.append(val)
        else:
            cols.append(F.col(name))
    return state.select(*cols)


def incremental_agg(
    prev_state: Optional[DataFrame],
    delta: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """One refresh step: fold a new delta into the running state (pass
    ``prev_state=None`` to bootstrap). Returns the NEW state — call
    ``finalize_agg`` for the user-facing rollup; persist the state (e.g.
    ``save()``) between loads."""
    fresh = build_agg_state(delta, keys, aggs)
    if prev_state is None:
        return fresh
    return merge_agg_states([prev_state, fresh], keys, aggs)
