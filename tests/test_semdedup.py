"""SemDeDup (ops/semdedup) — known-value checks, a pure-Python differential
reference, literal-vs-join assignment-path equivalence, and the
within-cell-only scale-shape guarantee."""

import math
import random

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import semdedup as sd


def _vecs(session, rows):
    return session.spark.createDataFrame(rows, "vid long, embedding array<double>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _py_semdedup(vecs, centroids, eps, keep):
    """Plain-Python reference: assign argmin-cosine cell (ties -> lowest
    cell), rank within cell by centroid distance (keep='far' descending),
    drop anything >= 1-eps similar to ANY earlier-ranked member."""
    cells = {}
    for vid, v in vecs:
        dists = [1.0 - _cos(v, c) for c in centroids]
        cell = min(range(len(centroids)), key=lambda i: (dists[i], i))
        cells.setdefault(cell, []).append((vid, v, dists[cell]))
    drops = set()
    pairs = set()
    for cell, members in cells.items():
        members.sort(key=lambda t: (-t[2], t[0]) if keep == "far" else (t[2], t[0]))
        for j in range(len(members)):
            for i in range(j):
                if _cos(members[i][1], members[j][1]) >= 1.0 - eps:
                    pairs.add((cell, members[i][0], members[j][0]))
                    drops.add(members[j][0])
    survivors = {vid for vid, _ in vecs} - drops
    return pairs, survivors


def test_semdedup_known_values(session):
    # two obvious clusters on the axes; b is a near-copy of a, d of c
    rows = [
        (1, [1.0, 0.0]),        # a — farther from centroid than b
        (2, [0.98, 0.02]),      # b ~ a (cos ≈ 0.9998)
        (3, [0.0, 1.0]),        # c
        (4, [0.02, 0.98]),      # d ~ c
        (5, [0.7, 0.7]),        # e — similar to centroid-ish but alone-ish
    ]
    cents = [[1.0, 0.1], [0.1, 1.0]]
    df = _vecs(session, rows)
    pairs = sd.semdedup_pairs(
        df, "vid", centroids=cents, eps=0.01, keep="far"
    ).collect()
    got = {(r["cell"], r["id_keep"], r["id_drop"]) for r in pairs}
    exp_pairs, exp_surv = _py_semdedup(
        [(r[0], r[1]) for r in rows], cents, 0.01, "far"
    )
    assert got == exp_pairs
    surv = sd.semdedup(df, "vid", centroids=cents, eps=0.01, keep="far")
    assert {r["vid"] for r in surv.collect()} == exp_surv
    # each near-duplicate pair collapsed to one representative
    assert len(exp_surv) == 3


def test_semdedup_keep_policy(session):
    # keep="far" must keep the member FARTHEST from the centroid,
    # keep="near" the closest
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1])]
    cents = [[1.0, 0.0]]
    df = _vecs(session, rows)
    far = sd.semdedup(df, "vid", centroids=cents, eps=0.5, keep="far")
    near = sd.semdedup(df, "vid", centroids=cents, eps=0.5, keep="near")
    assert {r["vid"] for r in far.collect()} == {2}   # 2 is farther from cent
    assert {r["vid"] for r in near.collect()} == {1}
    with pytest.raises(ValueError):
        sd.semdedup_pairs(df, "vid", centroids=cents, keep="middle")
    with pytest.raises(ValueError):
        sd.semdedup_pairs(df, "vid", centroids=cents, eps=1.5)


def test_semdedup_differential_random(session):
    rng = random.Random(7)
    dim = 8
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(6)]
    vecs = []
    vid = 0
    for b in base:
        for _ in range(rng.randint(1, 5)):
            v = [x + rng.gauss(0, 0.05) for x in b]
            vecs.append((vid, v))
            vid += 1
    cents = [list(b) for b in base[:3]]
    for eps, keep in [(0.02, "far"), (0.1, "near")]:
        exp_pairs, exp_surv = _py_semdedup(vecs, cents, eps, keep)
        df = _vecs(session, vecs)
        surv = sd.semdedup(df, "vid", centroids=cents, eps=eps, keep=keep)
        assert {r["vid"] for r in surv.collect()} == exp_surv
        got = {
            (r["cell"], r["id_keep"], r["id_drop"])
            for r in sd.semdedup_pairs(
                df, "vid", centroids=cents, eps=eps, keep=keep
            ).collect()
        }
        assert got == exp_pairs


def test_semdedup_paths_agree(session):
    """All three assignment paths — arrow (default), expr with inlined
    centroid literals, and expr forced onto the broadcast-join argmin
    (literal_cap=0) — must produce identical survivors and cells, ties
    included (the bit-exactness claim in the module docstring)."""
    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(40)]
    cents = [vecs[i][1] for i in range(5)]
    df = _vecs(session, vecs)
    outs = [
        sd.semdedup(df, "vid", centroids=cents, eps=0.3, cell_col="cell", **kw)
        for kw in (
            {"method": "arrow"},
            {"method": "expr"},
            {"method": "expr", "literal_cap": 0},
        )
    ]
    rows = [sorted(map(tuple, o.select("vid", "cell").collect())) for o in outs]
    assert rows[0] == rows[1] == rows[2]


def test_semdedup_trained_centroids_and_cell_col(session):
    """Default path (no centroids): seeded bootstrap + kmeans_refine runs,
    survivors are a subset with the cluster id attached and deterministic
    across two invocations."""
    rng = random.Random(3)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(30)]
    df = _vecs(session, vecs)
    out1 = sd.semdedup(df, "vid", num_cells=4, eps=0.6, cell_col="cell")
    out2 = sd.semdedup(df, "vid", num_cells=4, eps=0.6, cell_col="cell")
    r1 = sorted(map(tuple, out1.select("vid", "cell").collect()))
    r2 = sorted(map(tuple, out2.select("vid", "cell").collect()))
    assert r1 == r2
    assert 0 < len(r1) <= 30
    assert {c for _, c in r1} <= {0, 1, 2, 3}


def test_semdedup_invalid_vectors_survive(session):
    """Null / ragged / null-element vectors must not abort the job: they
    get NULL cells, join no pairs, and always survive (pq precedent)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.99, 0.01]),      # near-dup of 1 — dropped
        (3, None),              # null vector
        (4, [1.0]),             # ragged
        (5, [1.0, None]),       # null element
    ]
    cents = [[1.0, 0.05]]
    df = _vecs(session, rows)
    out = sd.semdedup(df, "vid", centroids=cents, eps=0.5, cell_col="cell")
    got = {r["vid"]: r["cell"] for r in out.collect()}
    # 2 sits closer to the centroid, so keep="far" ranks 1 first and drops 2
    assert set(got) == {1, 3, 4, 5}
    assert got[1] == 0
    assert got[3] is None and got[4] is None and got[5] is None
    pairs = sd.semdedup_pairs(df, "vid", centroids=cents, eps=0.5).collect()
    assert {(r["id_keep"], r["id_drop"]) for r in pairs} == {(1, 2)}


def test_semdedup_pairs_stay_within_cell(session):
    """No cross-cluster pair may ever appear — the quadratic is bounded by
    the cell, which is the whole scale argument."""
    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(50)]
    cents = [vecs[i][1] for i in range(4)]
    df = _vecs(session, vecs)
    pairs = sd.semdedup_pairs(df, "vid", centroids=cents, eps=1.0)
    assigned = sd._ranked(
        df, "vid", "embedding", sd._normalize_centroids(cents), "far", "arrow", 32768
    ).withColumnRenamed("__id", "vid")
    cell_of = {r["vid"]: r["cell"] for r in assigned.collect()}
    for r in pairs.collect():
        assert cell_of[r["id_keep"]] == r["cell"]
        assert cell_of[r["id_drop"]] == r["cell"]
    # eps=1.0 (threshold 0.0) keeps every non-negative-sim within-cell
    # pair; the Python reference gives the exact expected count
    exp_pairs, _ = _py_semdedup(vecs, cents, 1.0, "far")
    assert pairs.count() == len(exp_pairs)


def test_semdedup_max_cell_size_caps_the_quadratic(session):
    """One degenerate near-duplicate cluster: uncapped semdedup collapses it
    to a single survivor; with max_cell_size the comparison stays within
    hash sub-cells (bounded pair join), each sub-cell keeping >= 1 — more
    survivors, never fewer, and a cap >= the cell size changes nothing."""
    rng = random.Random(13)
    base = [1.0, 0.5, -0.25, 0.125]
    vecs = [
        (i, [x + rng.gauss(0, 1e-4) for x in base]) for i in range(60)
    ]
    cents = [base]
    df = _vecs(session, vecs)
    uncapped = sd.semdedup(df, "vid", centroids=cents, eps=0.5)
    assert uncapped.count() == 1
    capped = sd.semdedup(df, "vid", centroids=cents, eps=0.5, max_cell_size=10)
    n_capped = capped.count()
    assert 2 <= n_capped <= 12  # ceil(60/10)=6 sub-cells, each keeps >=1
    # pairs stay within a sub-cell: per-(keep,drop) hash groups agree
    pairs = sd.semdedup_pairs(
        df, "vid", centroids=cents, eps=0.5, max_cell_size=10
    ).collect()
    # pairs still report the TRUE cell id (sub-cell salting is internal),
    # and the drop set accounts exactly for the missing survivors
    assert all(r["cell"] == 0 for r in pairs)
    assert len({r["id_drop"] for r in pairs}) == 60 - n_capped
    # a cap larger than the cell is a no-op
    same = sd.semdedup(df, "vid", centroids=cents, eps=0.5, max_cell_size=1000)
    assert {r["vid"] for r in same.collect()} == {
        r["vid"] for r in uncapped.collect()
    }


def test_semdedup_zero_norm_vector_degrades(session):
    """An all-zero embedding has no cosine direction: it must degrade to a
    NULL cell (never abort under ANSI division, never NaN-poison the rank
    order or drop other rows) — on every assignment path."""
    rows = [
        (1, [0.0, 0.0]),        # zero norm — invalid
        (2, [1.0, 0.0]),
        (3, [0.99, 0.01]),      # near-dup of 2 — the only legit drop
        (4, [0.0, 1.0]),
    ]
    cents = [[1.0, 0.05], [0.05, 1.0]]
    df = _vecs(session, rows)
    for kw in ({"method": "arrow"}, {"method": "expr"},
               {"method": "expr", "literal_cap": 0}):
        out = sd.semdedup(df, "vid", centroids=cents, eps=0.5,
                          cell_col="cell", **kw)
        got = {r["vid"]: r["cell"] for r in out.collect()}
        assert set(got) == {1, 2, 4}, (kw, got)
        assert got[1] is None
        assert got[2] is not None and got[4] is not None
        pairs = sd.semdedup_pairs(df, "vid", centroids=cents, eps=0.5, **kw)
        assert {(r["id_keep"], r["id_drop"]) for r in pairs.collect()} == {(2, 3)}, kw


def test_semdedup_invalid_vectors_null_cell_on_expr_paths(session):
    """The expr argmin must mirror arrow's NULL-cell degradation — a null
    distance field would otherwise sort FIRST through min(struct) and
    silently land invalid rows in cell 0."""
    rows = [
        (1, [1.0, 0.0]),
        (3, None),
        (4, [1.0]),
        (5, [1.0, None]),
    ]
    cents = [[1.0, 0.05]]
    df = _vecs(session, rows)
    for kw in ({"method": "expr"}, {"method": "expr", "literal_cap": 0}):
        out = sd.semdedup(df, "vid", centroids=cents, eps=0.5,
                          cell_col="cell", **kw)
        got = {r["vid"]: r["cell"] for r in out.collect()}
        assert got[1] == 0, kw
        assert got[3] is None and got[4] is None and got[5] is None, (kw, got)


def test_semdedup_nonfinite_centroid_rejected(session):
    """A NaN or Inf centroid element would capture every row's argmin
    (NaN propagates through np.argmin) — reject at normalization."""
    with pytest.raises(ValueError):
        sd._normalize_centroids([[1.0, float("nan")]])
    with pytest.raises(ValueError):
        sd._normalize_centroids([[float("inf"), 0.0]])
    with pytest.raises(ValueError):
        sd._normalize_centroids([[0.0, 0.0]])


def test_semdedup_inf_element_degrades_on_all_paths(session):
    """An Inf element gives an Inf norm: isnan alone misses it, __cd goes
    NaN, NaN sorts first under desc AND NaN>=tau is true — without the
    finite-norm guard the Inf row would keeper-drop its whole cell."""
    rows = [
        (1, [float("inf"), 0.0]),   # overflowed vector — invalid
        (2, [1.0, 0.0]),
        (3, [0.99, 0.01]),          # near-dup of 2 — the only legit drop
    ]
    cents = [[1.0, 0.05]]
    df = _vecs(session, rows)
    for kw in ({"method": "arrow"}, {"method": "expr"},
               {"method": "expr", "literal_cap": 0}):
        out = sd.semdedup(df, "vid", centroids=cents, eps=0.5,
                          cell_col="cell", **kw)
        got = {r["vid"]: r["cell"] for r in out.collect()}
        assert set(got) == {1, 2}, (kw, got)
        assert got[1] is None and got[2] == 0, (kw, got)
