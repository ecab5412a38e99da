"""Link-graph ops (ops/graph) — PageRank vs a from-scratch Python
reference (incl. dangling redistribution and edge multiplicity), degree
counts, edge cases, and the lineage-truncation behavior."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import graph


def _edges(session, pairs):
    return session.spark.createDataFrame(pairs, "src string, dst string")


def _ref_pagerank(edges, n_iter, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    N = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: 1.0 / N for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] / out[u]
        dm = sum(r[v] for v in nodes if v not in out)
        r = {v: (1 - d) / N + d * (contrib[v] + dm / N) for v in nodes}
    return r


def test_pagerank_matches_reference_with_dangling(session):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    # d is dangling-free (has out-edge); b's only inlink is a; no out: none
    got = {r["node"]: r["rank"] for r in
           graph.pagerank(_edges(session, pairs), iterations=20).collect()}
    want = _ref_pagerank(pairs, 20)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_pure_sink_redistributes(session):
    # 'sink' has no out-edges: its mass must redistribute, ranks sum to 1
    pairs = [("a", "sink"), ("b", "sink"), ("a", "b")]
    got = {r["node"]: r["rank"] for r in
           graph.pagerank(_edges(session, pairs), iterations=15).collect()}
    want = _ref_pagerank(pairs, 15)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_edge_multiplicity_counts(session):
    # parallel edges weigh more: a->b twice vs a->c once
    pairs = [("a", "b"), ("a", "b"), ("a", "c")]
    got = {r["node"]: r["rank"] for r in
           graph.pagerank(_edges(session, pairs), iterations=5).collect()}
    want = _ref_pagerank(pairs, 5)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    assert got["b"] > got["c"]


def test_pagerank_zero_iterations_uniform_and_validation(session):
    e = _edges(session, [("a", "b")])
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=0).collect()}
    assert got == {"a": 0.5, "b": 0.5}
    with pytest.raises(ValueError):
        graph.pagerank(e, damping=1.0)
    with pytest.raises(ValueError):
        graph.pagerank(e, iterations=-1)


def test_pagerank_checkpoint_interval_equivalence(session):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")]
    e = _edges(session, pairs)
    r1 = {r["node"]: r["rank"] for r in
          graph.pagerank(e, iterations=7, checkpoint_every=2).collect()}
    r2 = {r["node"]: r["rank"] for r in
          graph.pagerank(e, iterations=7, checkpoint_every=100).collect()}
    for k in r1:
        assert r1[k] == pytest.approx(r2[k], abs=1e-12)


def test_degrees(session):
    e = _edges(session, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in
           graph.degrees(e).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 2)}
