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


def _df(df_or_chain) -> DataFrame:
    # isinstance, NOT getattr(x, "df", x): on a DataFrame that carries a
    # COLUMN literally named "df" (tf-idf outputs a document-frequency
    # column), getattr returns the Column and everything downstream
    # explodes with "'Column' object is not callable"
    if isinstance(df_or_chain, DataFrame):
        return df_or_chain
    return df_or_chain.df


def _formatted(df_or_chain) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _df(df_or_chain).explain("formatted")
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


def lint_plan(df_or_chain, max_shuffles: int = 10) -> list[dict]:
    """Static 100-TB plan lint: inspect the physical plan for the shapes
    that melt at scale and return findings as
    ``[{"rule", "severity", "message"}, ...]`` (empty = clean).

    Rules:

    - ``cartesian-product`` (error): a CartesianProduct join — |L|x|R|
      rows; at corpus scale this never finishes.
    - ``single-partition-window`` (error): a window function with an
      EMPTY partition spec — the whole dataset sorts through one task
      (the row_number()-without-partitionBy trap; see assign_row_ids for
      the distributed two-pass alternative).
    - ``row-python-udf`` (warning): BatchEvalPython — a row-at-a-time
      Python UDF in the hot path; Arrow-batched pandas_udfs are 10-100x
      faster (ArrowEvalPython is NOT flagged).
    - ``broadcast-nested-loop`` (warning): non-equi join fallback;
      legitimate for 1-row scalar cross joins, catastrophic when both
      sides are large.
    - ``single-partition-exchange`` (warning): Exchange SinglePartition
      — fine when the upstream result is scalar/tiny, a serialization
      point otherwise.
    - ``unpushed-filter`` (info): a file scan with an empty PushedFilters
      while Filter nodes exist in the plan — the predicate may be
      evaluated post-scan (expected for derived columns; worth a look
      for raw ones).
    - ``many-shuffles`` (info): more than ``max_shuffles`` Exchange
      nodes — often a missed reuse or an unconsolidated pipeline.

    This is advice, not enforcement — the plan-regression tests
    (tests/test_plans.py) are the hard guards.
    """
    df = _df(df_or_chain)
    text = _formatted(df_or_chain)
    physical = df._jdf.queryExecution().executedPlan().toString()
    findings: list[dict] = []

    def add(rule: str, severity: str, message: str) -> None:
        findings.append({"rule": rule, "severity": severity, "message": message})

    n_cart = len(re.findall(r"\bCartesianProduct\b", text))
    if n_cart:
        add("cartesian-product", "error",
            f"{n_cart} CartesianProduct join(s): |L|x|R| output — add an "
            "equi-key, broadcast the small side, or bucket/bin the range")
    # a PARTITIONED physical Window prints [exprs], [partCols], [orderCols]
    # (three top-level bracket groups) or [exprs], [partCols] when
    # unordered; an UNPARTITIONED ordered window prints [exprs],
    # [col ASC ...] — two groups with ordering keywords in the second.
    # Only the latter sorts the whole dataset through ONE task.
    for line in physical.splitlines():
        stripped = line.strip().lstrip("+-: ").strip()
        if not stripped.startswith("Window ["):
            continue
        groups = stripped.split("], [")
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            add("single-partition-window", "error",
                "window function with an empty partition spec: the whole "
                "dataset sorts through ONE task — partition the window or "
                "use a two-pass prefix aggregate (assign_row_ids pattern)")
            break
    n_row_udf = len(re.findall(r"\bBatchEvalPython\b", text))
    if n_row_udf:
        add("row-python-udf", "warning",
            f"{n_row_udf} row-at-a-time Python UDF stage(s) "
            "(BatchEvalPython): prefer Arrow-batched pandas_udf / "
            "mapInPandas (10-100x)")
    n_bnl = len(re.findall(r"\bBroadcastNestedLoopJoin\b", text))
    if n_bnl:
        add("broadcast-nested-loop", "warning",
            f"{n_bnl} BroadcastNestedLoopJoin(s): fine for 1-row scalar "
            "cross joins, catastrophic when both sides are large")
    n_single = len(re.findall(r"Exchange SinglePartition", text))
    if n_single:
        add("single-partition-exchange", "warning",
            f"{n_single} Exchange SinglePartition node(s): a global "
            "serialization point unless the upstream result is scalar")
    empty_pushed = len(re.findall(r"PushedFilters: \[\]", text))
    has_filter = bool(re.search(r"\(\d+\) Filter\b", text))
    if empty_pushed and has_filter:
        add("unpushed-filter", "info",
            f"{empty_pushed} file scan(s) with no pushed filters while "
            "Filter nodes exist: predicates may run post-scan (expected "
            "for derived columns)")
    shuffles = len(re.findall(r"\(\d+\) Exchange", text))
    if shuffles > max_shuffles:
        add("many-shuffles", "info",
            f"{shuffles} Exchange nodes (> {max_shuffles}): check for "
            "missed exchange reuse or an unconsolidated pipeline")
    return findings


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
