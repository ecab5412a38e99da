"""Corpus-curation audit report: run the standard training-data gate
sequence — quality gates, dedup, decontamination — and emit ONE tiny
summary frame saying what each stage removed.

The examples/corpus_curation.py pipeline hand-rolled exactly this
composition with driver-side counts; this op productizes it (r06 verdict
task 7a) as a single lazy DataFrame so the report itself can be saved,
diffed across corpus versions (``dataset_diff``), or charted.

Composition, not reimplementation: every stage IS the already-oracled
operator (``gopher_quality_filter``, ``quality_score``, ``exact_dedup``,
``minhash_dedup``, ``decontaminate``) applied to the previous stage's
survivors, so stage semantics match running the pipeline by hand — the
dedup_eval precedent of composing verified templates.

Scale shape: the output is one aggregation branch per stage unioned into a
#stages-row frame. Branch k re-evaluates stages 1..k, so the INPUT is
persisted when re-evaluating it would be expensive — ``persist=None``
(default) auto-detects: a bare storage scan (Relation + Project/Filter
only) is NOT cached because Spark re-reads it per branch at scan cost,
while any plan containing a join/aggregate/window/generate IS cached
(MEMORY_AND_DISK) so the gates don't recompute it per stage. The stage
counts themselves never touch the driver until the caller collects the
(tiny) report.

Cache lifetime is the CALLER's: the persisted handle is the ``df`` you
passed in (persistence attaches to the underlying plan), so call
``df.unpersist()`` once the report is materialized — repeated audit
calls with ``persist=True`` otherwise accumulate cached blocks for the
application's lifetime.

No reference counterpart; public methodology (C4/Gopher/CCNet curation
pipelines).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# logical-plan node names whose presence means re-evaluating the input per
# stage branch would repeat real work (vs a storage scan Spark re-reads at
# plain scan cost, which a MEMORY_AND_DISK cache of the full corpus would
# not beat)
_EXPENSIVE_NODES = (
    "Join", "Aggregate", "Window", "Generate", "Sort", "Distinct",
    "Union", "Deduplicate", "MapInPandas", "FlatMapGroupsInPandas",
)


def _needs_cache(df: DataFrame) -> bool:
    """True when df's analyzed plan contains a wide/expensive node. On any
    introspection failure, err toward caching (the previous default)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True
    return any(node in plan for node in _EXPENSIVE_NODES)


def curation_report(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    gopher: bool = True,
    gopher_kw: Optional[dict[str, Any]] = None,
    quality_threshold: Optional[float] = None,
    exact: bool = True,
    minhash_kw: Optional[dict[str, Any]] = None,
    probes: Optional[DataFrame] = None,
    decontaminate_kw: Optional[dict[str, Any]] = None,
    persist: Optional[Any] = None,
) -> DataFrame:
    """One row per pipeline stage: ``(stage_idx, stage, rows_in, rows_out,
    removed, pct_removed)`` for the gate sequence

        input -> gopher_gate -> quality_gate -> exact_dedup ->
        minhash_dedup -> decontaminate

    Stages toggle independently: ``gopher=False`` skips the Gopher gate,
    ``quality_threshold=None`` skips the score gate, ``minhash_kw=None``
    skips near-dup removal (pass e.g. ``{"num_hashes": 8, "bands": 4,
    "jaccard_threshold": 0.25}`` to enable), ``probes=None`` skips
    decontamination. ``pct_removed`` is NULL when a stage saw zero rows.

    ``persist``: ``None`` (default) caches the input ONLY when its plan
    is more than a bare storage scan (see module note); ``True``/
    ``False`` force it; a ``pyspark.StorageLevel`` both forces it and
    picks the level (forced True uses MEMORY_AND_DISK). The caller owns
    the cache lifetime — unpersist the input once the report is
    materialized.
    """
    from .dedup import decontaminate as _decon
    from .dedup import exact_dedup as _exact
    from .dedup import minhash_dedup as _minhash
    from .text import gopher_quality_filter, quality_score

    if persist is None:
        persist = _needs_cache(df)
    if persist is not False and persist is not None:
        from pyspark import StorageLevel

        level = (
            persist
            if isinstance(persist, StorageLevel)
            else StorageLevel.MEMORY_AND_DISK
        )
        df = df.persist(level)

    stages: list[tuple[str, DataFrame]] = [("input", df)]
    cur = df
    if gopher:
        cur = gopher_quality_filter(
            cur, id_col, text_col=text_col, **(gopher_kw or {})
        )
        stages.append(("gopher_gate", cur))
    if quality_threshold is not None:
        cur = cur.filter(
            quality_score(F.col(text_col)) > F.lit(float(quality_threshold))
        )
        stages.append(("quality_gate", cur))
    if exact:
        cur = _exact(cur, text_col=text_col, id_col=id_col)
        stages.append(("exact_dedup", cur))
    if minhash_kw is not None:
        cur = _minhash(cur, id_col, text_col, **minhash_kw)
        stages.append(("minhash_dedup", cur))
    if probes is not None:
        cur = _decon(
            cur, probes, id_col, text_col=text_col,
            **(decontaminate_kw or {}),
        )
        stages.append(("decontaminate", cur))

    counts = None
    for i, (name, frame) in enumerate(stages):
        branch = frame.agg(
            F.count(F.lit(1)).cast("long").alias("rows_out")
        ).select(
            F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"),
            "rows_out",
        )
        counts = branch if counts is None else counts.unionByName(branch)

    # rows_in = previous stage's rows_out, via a tiny self-join on the
    # stage index (a lag() window here would be an empty partition spec —
    # the exact shape the plan linter flags as an error)
    prev = counts.select(
        (F.col("stage_idx") + 1).alias("stage_idx"),
        F.col("rows_out").alias("__prev_out"),
    )
    return counts.join(F.broadcast(prev), "stage_idx", "left").select(
        "stage_idx", "stage",
        F.coalesce(F.col("__prev_out"), F.col("rows_out")).alias("rows_in"),
        "rows_out",
    ).select(
        "stage_idx", "stage", "rows_in", "rows_out",
        (F.col("rows_in") - F.col("rows_out")).alias("removed"),
        F.when(
            F.col("rows_in") > 0,
            (F.col("rows_in") - F.col("rows_out"))
            / F.col("rows_in").cast("double"),
        ).alias("pct_removed"),
    )
