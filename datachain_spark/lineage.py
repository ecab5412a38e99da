"""Lineage-driven cascade refresh (r10 verdict task 2).

Every save records which datasets and storage paths the saved chain
read (``DatasetVersion.dependencies`` — catalog/metastore.py
save_dataset; reference parity query/dataset.py:1882-1916 records the
same dataset+storage dependency rows). This module is the CONSUMER of
that graph: it finds saved datasets whose recorded upstream pin is
behind the upstream's current head and re-runs their REGISTERED
pipelines in dependency order, so a multi-stage publish chain
(source -> derived -> released, each stage a ``delta_save`` with its
index/profile maintenance) heals end-to-end from one call after an
upstream append — instead of each downstream being re-run by hand in
the right order.

- :func:`register_pipeline` — bind a dataset name to the zero-arg
  callable that (re)builds it; delta pipelines are just
  ``lambda: delta_save(...)`` / ``DeltaChain.save`` closures, so a
  re-run is incremental by construction (the checkpointed job hash
  no-ops untouched stages).
- :func:`stale_datasets` — one row per (dataset, upstream) edge whose
  pinned version is behind the upstream head. ``dc.datasets(
  stale=True)`` is the chain-level face of the same walk.
- :func:`refresh_downstream` — topological cascade: walk the reverse
  dependency graph from an upstream, re-run every registered stale
  pipeline in dependency order, return the action report.

100-TB shape: the walk itself reads only manifest JSON (KB-sized, no
data is touched until a pipeline actually re-runs), and each re-run is
the pipeline's own incremental path — cost tracks churn, never the
corpus. Internal per-version state datasets (profiles, IVF/BM25/gram
index shards, delta snapshots, storage listings) are maintained BY
their pipelines, so the graph excludes them.

No direct reference counterpart: the reference records the same
dependency rows but exposes them read-only (DatasetVersion.dependencies
property) — cascade refresh is a spec addition for warehouse-scale
scheduled pipelines.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from .catalog.metastore import parse_version, split_name
from .session import Session

#: internal datasets maintained by their OWNING pipeline (index shards,
#: profiles, delta snapshots) — never independent nodes in the lineage
#: graph. Storage-listing caches carry the lst__ prefix instead.
AUX_SUFFIXES = (
    "__delta_source", "__profile", "__zones", "__ivf", "__ivf_centroids",
    "__bm25", "__bm25_docs", "__grams", "__grams_docs", "__promotions",
)
LISTING_PREFIX = "lst__"


def _is_aux(base: str) -> bool:
    return base.startswith(LISTING_PREFIX) or base.endswith(AUX_SUFFIXES)


def _full(name: str) -> str:
    ns, proj, base = split_name(name)
    return f"{ns}.{proj}.{base}"


def _registry(sess: Session) -> dict:
    reg = getattr(sess, "_lineage_pipelines", None)
    if reg is None:
        reg = {}
        sess._lineage_pipelines = reg
    return reg


def register_pipeline(
    name: str, fn: Callable[[], object], session: Optional[Session] = None
) -> None:
    """Register ``fn`` as the pipeline that (re)builds dataset ``name``.

    ``fn`` takes no arguments and performs the full save — typically a
    closure over ``delta_save(source_fn(), process, name, ...)`` so the
    re-run is incremental. Registrations are session-scoped (pipelines
    are live Python callables; persisting code is out of scope — the
    scheduler that owns the session re-registers on startup, exactly
    like it owns the pipeline definitions today).
    """
    sess = Session.get() if session is None else session
    _registry(sess)[_full(name)] = fn


def _upstream_deps(rec) -> list[dict]:
    """The head version's UPSTREAM dataset dependencies — self-pins
    (compaction rewrite provenance) are never upstream edges. A head
    whose own record carries no upstream deps (a copy compacted before
    deps were carried forward) resolves through its ``compacted_from``
    ancestry: the rewrite has identical rows, so the source version's
    lineage IS its lineage."""
    head = rec.latest_version()
    if head is None:
        return []
    full = rec.full_name
    seen_versions = set()
    dv = head
    while dv is not None:
        ups = [
            d for d in dv.dependencies
            if d.get("dataset") and _full(d["dataset"]) != full
        ]
        if ups:
            return ups
        src = dv.attrs.get("compacted_from")
        if not src or src in seen_versions:
            return []
        seen_versions.add(src)
        try:
            dv = rec.get_version(src)
        except Exception:  # noqa: BLE001 - vacuumed ancestor
            return []
    return []


def _dataset_edges(sess: Session):
    """(records_by_full_name, edges) where ``edges[upstream_full]`` is
    the sorted list of downstream full names whose LATEST version
    recorded a dependency on that upstream. Aux/listing datasets are
    excluded as nodes on both sides."""
    recs = {}
    for rec in sess.metastore.list_datasets():
        if not _is_aux(rec.name):
            recs[rec.full_name] = rec
    edges: dict[str, list[str]] = {}
    for full, rec in recs.items():
        for dep in _upstream_deps(rec):
            up_full = _full(dep["dataset"])
            if up_full not in recs:
                continue
            edges.setdefault(up_full, [])
            if full not in edges[up_full]:
                edges[up_full].append(full)
    for k in edges:
        edges[k].sort()
    return recs, edges


def _stale_edges(rec, recs_by_full) -> list[tuple[str, str, str]]:
    """(upstream_full, pinned_version, upstream_head) for every upstream
    dependency of ``rec``'s head whose pin is behind the upstream head."""
    out = []
    for dep in _upstream_deps(rec):
        up_full = _full(dep["dataset"])
        up_rec = recs_by_full.get(up_full)
        if up_rec is None:
            continue  # upstream deleted: nothing to refresh against
        up_head = up_rec.latest_version()
        if up_head is None:
            continue
        pinned = dep.get("version")
        if pinned is None or parse_version(up_head.version) > parse_version(pinned):
            out.append((up_full, pinned or "", up_head.version))
    return out


def stale_datasets(session: Optional[Session] = None) -> list[dict]:
    """One dict per (dataset, upstream) edge where the dataset's head was
    built from an upstream version that is no longer that upstream's
    head: ``{dataset, version, upstream, pinned_version, upstream_head}``.
    Driver-sized by construction (one row per recorded dependency edge —
    manifest metadata, no data scanned)."""
    sess = Session.get() if session is None else session
    recs, _ = _dataset_edges(sess)
    rows = []
    for full in sorted(recs):
        rec = recs[full]
        for up_full, pinned, up_head in _stale_edges(rec, recs):
            rows.append({
                "dataset": full,
                "version": rec.latest_version().version,
                "upstream": up_full,
                "pinned_version": pinned,
                "upstream_head": up_head,
            })
    return rows


#: report schema shared by refresh_downstream and its chain/CLI faces
REPORT_SCHEMA = (
    "dataset string, action string, old_version string, "
    "new_version string, stale_upstreams string"
)


def refresh_downstream(
    name: str,
    session: Optional[Session] = None,
    dry_run: bool = False,
    strict: bool = True,
):
    """Re-run every downstream pipeline of ``name`` whose recorded
    upstream pin is behind the upstream head, in dependency order.

    Walks the reverse dependency graph from ``name`` (breadth across
    every recorded edge, Kahn topological order so a diamond's join
    stage runs after BOTH parents refreshed), re-reads each node's
    staleness against CURRENT heads as the cascade advances, and runs
    the pipeline registered via :func:`register_pipeline` for each stale
    node. Returns a ``DataFrame`` report, one row per downstream:
    ``(dataset, action, old_version, new_version, stale_upstreams)``
    with action in ``refreshed | converged | up_to_date |
    would_refresh | no_pipeline`` (``converged`` = the pipeline ran but
    produced no new version — the upstream bump carried no effective
    change, and the delta path re-pinned the head's dependencies).

    - ``dry_run=True`` reports ``would_refresh`` without running
      anything (later stages are judged against pre-refresh heads —
      a dry run cannot know what a parent refresh would produce).
    - ``strict=True`` (default) raises on a STALE downstream with no
      registered pipeline: silently leaving one stage behind while
      refreshing the rest is how a cascade quietly forks; pass
      ``strict=False`` to record ``no_pipeline`` rows instead.
    """
    sess = Session.get() if session is None else session
    start = _full(name)
    recs, edges = _dataset_edges(sess)
    if start not in recs:
        from .error import DatasetNotFoundError

        raise DatasetNotFoundError(f"refresh_downstream: no dataset {name!r}")

    # downstream closure of `start`
    reach: set[str] = set()
    frontier = [start]
    while frontier:
        nxt = []
        for up in frontier:
            for d in edges.get(up, []):
                if d not in reach and d != start:
                    reach.add(d)
                    nxt.append(d)
        frontier = nxt

    # Kahn order over the reachable subgraph: in-edges counted only from
    # within the closure — the start node is the (already-current) root,
    # and unrelated parents outside the cascade must not deadlock it
    indeg = {d: 0 for d in reach}
    for up in reach:
        for d in edges.get(up, []):
            if d in indeg:
                indeg[d] += 1
    ready = sorted(d for d, n in indeg.items() if n == 0)
    order: list[str] = []
    while ready:
        node = ready.pop(0)
        order.append(node)
        added = False
        for d in edges.get(node, []):
            if d in indeg:
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
                    added = True
        if added:
            ready.sort()
    if len(order) != len(reach):
        cyc = sorted(d for d, n in indeg.items() if n > 0)
        raise ValueError(
            f"refresh_downstream: dependency cycle among {cyc} — a saved "
            "dataset cannot (transitively) read its own downstream"
        )

    # Topological LEVELS over the same order (longest path from the
    # root): a node's in-closure parents all sit in strictly earlier
    # levels, so nodes sharing a level share no edges — refreshing them
    # concurrently is semantics-preserving (each sees exactly the
    # upstream heads the sequential walk would have shown it). Sibling
    # pipelines of a diamond then overlap their Spark jobs instead of
    # serializing driver-synced tails (guide §2.6: the scheduler happily
    # back-fills executors freed by one job's tail with the next job's
    # tasks; actions are only sequential when the driver calls them
    # sequentially).
    level = {d: 0 for d in order}
    for up in order:
        for d in edges.get(up, []):
            if d in level:
                level[d] = max(level[d], level[up] + 1)

    registry = _registry(sess)
    results: dict[str, tuple] = {}

    def _classify(node):
        """Staleness + action decision for one node (manifest-only)."""
        rec = recs[node]
        stale = _stale_edges(rec, recs)
        old_head = rec.latest_version().version
        ups = ",".join(f"{u}@{p}<{h}" for u, p, h in stale)
        if not stale:
            return None, (node, "up_to_date", old_head, old_head, "")
        fn = registry.get(node)
        if fn is None:
            if strict and not dry_run:
                raise ValueError(
                    f"refresh_downstream: {node} is stale ({ups}) but has "
                    "no registered pipeline — register_pipeline(name, fn) "
                    "or pass strict=False to skip it"
                )
            return None, (node, "no_pipeline", old_head, old_head, ups)
        if dry_run:
            return None, (node, "would_refresh", old_head, old_head, ups)
        return (fn, old_head, ups), None

    def _run(node, fn, old_head, ups):
        fn()
        fresh = sess.metastore.get_record(node)
        new_head = fresh.latest_version().version
        # a pipeline may converge without a new version (the upstream
        # bump carried no effective change — delta re-pins the head's
        # dependencies instead of re-saving); report it distinctly
        action = "refreshed" if new_head != old_head else "converged"
        return fresh, (node, action, old_head, new_head, ups)

    max_workers = int(
        os.environ.get("DATACHAIN_SPARK_REFRESH_PARALLELISM", "3")
    )
    for lvl in range(max(level.values(), default=-1) + 1):
        batch = [d for d in order if level[d] == lvl]
        runnable: list[tuple[str, Callable, str, str]] = []
        for node in batch:
            run, row = _classify(node)
            if row is not None:
                results[node] = row
            else:
                runnable.append((node, *run))
        if not runnable:
            continue
        if len(runnable) == 1 or max_workers <= 1:
            for node, fn, old_head, ups in runnable:
                fresh, row = _run(node, fn, old_head, ups)
                recs[node] = fresh
                results[node] = row
        else:
            # job groups/descriptions are JVM-thread-local: wrap each
            # worker so the caller's local properties (e.g. a bench job
            # group) are inherited and its jobs stay attributed
            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target

            # passing the session makes tags inherit too (Spark 4 warns
            # otherwise); it returns a decorator rather than the wrapped fn
            wrap = inheritable_thread_target(sess.spark)
            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(runnable))
            ) as pool:
                futs = [
                    (node, pool.submit(
                        wrap(_run), node, fn, old_head, ups,
                    ))
                    for node, fn, old_head, ups in runnable
                ]
                for node, fut in futs:
                    fresh, row = fut.result()
                    recs[node] = fresh
                    results[node] = row
    rows = [results[node] for node in order]
    return sess.spark.createDataFrame(rows, REPORT_SCHEMA)
