"""Physical-plan introspection helpers.

Design note: this engine deliberately has NO plan IR of its own — the
DataFrame *is* the plan and Catalyst is the optimizer (SURVEY.md §4: the
reference has no optimizer either; it delegates to SQLite). What a
performance-conscious user needs instead is *visibility*: did my filter reach
the scan, which joins broadcast, how many shuffles will run. These helpers
parse `explain("formatted")` output into structured facts, and back the
plan-regression tests in tests/test_plans.py (the "is this the plan I'd want
at 100 TB" check, automated).
"""

from __future__ import annotations

import contextlib
import io
import re
from typing import Union

from pyspark.sql import DataFrame


def _formatted(df_or_chain) -> str:
    df: DataFrame = getattr(df_or_chain, "df", df_or_chain)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df_or_chain) -> list[str]:
    """All PushedFilters entries across parquet scans (non-empty lists only)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", _formatted(df_or_chain)):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def scan_read_schemas(df_or_chain) -> list[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", _formatted(df_or_chain))
    ]


def join_strategies(df_or_chain) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin, SortMergeJoin…)."""
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b",
        _formatted(df_or_chain),
    )


def shuffle_count(df_or_chain) -> int:
    """Number of Exchange nodes (shuffles) in the physical plan."""
    return len(re.findall(r"\(\d+\) Exchange", _formatted(df_or_chain)))


def explain_summary(df_or_chain) -> dict:
    """One-call plan audit: filters pushed, schemas pruned, join strategies,
    shuffle count, codegen span count."""
    text = _formatted(df_or_chain)
    return {
        "pushed_filters": pushed_filters(df_or_chain),
        "read_schemas": scan_read_schemas(df_or_chain),
        "joins": join_strategies(df_or_chain),
        "shuffles": shuffle_count(df_or_chain),
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", text))),
    }
