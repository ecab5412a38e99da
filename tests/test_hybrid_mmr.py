"""Hybrid retrieval (ops/retrieval.ranked_list / rrf_fuse / hybrid_topk)
and MMR diversification (ops/similarity.mmr_rerank) — hand-computed
fusion values, tie/NULL contracts, the diversity-beats-relevance planted
case, and plan-lint cleanliness."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.retrieval import hybrid_topk, ranked_list, rrf_fuse
from datachain_spark.ops.similarity import mmr_rerank
from datachain_spark.plans import lint_plan


def _scored(session, rows, schema="id long, score double"):
    return session.spark.createDataFrame(rows, schema)


# ------------------------------------------------------------ ranked_list
def test_ranked_list_order_ties_and_nulls(session):
    df = _scored(session, [
        (3, 5.0), (1, 5.0), (2, 7.0), (4, None), (5, 1.0),
    ])
    out = ranked_list(df, "score", "id", n=10).collect()
    # desc by score, ties by id asc, NULL dropped
    assert [(r["id"], r["rank"]) for r in out] == [
        (2, 1), (1, 2), (3, 3), (5, 4)]
    asc = ranked_list(df, "score", "id", n=2, ascending=True).collect()
    assert [(r["id"], r["rank"]) for r in asc] == [(5, 1), (1, 2)]
    with pytest.raises(ValueError):
        ranked_list(df, "score", "id", n=0)


def test_ranked_list_no_global_window(session):
    df = _scored(session, [(i, float(i)) for i in range(100)])
    out = ranked_list(df, "score", "id", n=5)
    errs = [f for f in lint_plan(out) if f["severity"] == "error"]
    assert errs == []


# --------------------------------------------------------------- rrf_fuse
def test_rrf_fuse_hand_values(session):
    rel = _scored(session, [(1, 3.0), (2, 2.0), (3, 1.0)])
    dist = _scored(session, [(2, 0.1), (4, 0.2)])
    out = rrf_fuse(
        [(rel, "score", False), (dist, "score", True)],
        id_col="id", k=10, rank_const=60.0,
    ).collect()
    got = {r["id"]: r for r in out}
    assert [r["id"] for r in out] == [2, 1, 4, 3]
    assert got[2]["rank_0"] == 2 and got[2]["rank_1"] == 1
    assert got[4]["rank_0"] is None and got[4]["rank_1"] == 2
    assert abs(got[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(got[4]["rrf_score"] - 1 / 62) < 1e-12
    assert abs(got[3]["rrf_score"] - 1 / 63) < 1e-12


def test_rrf_fuse_weights_and_validation(session):
    rel = _scored(session, [(1, 3.0)])
    dist = _scored(session, [(2, 0.1)])
    out = rrf_fuse(
        [(rel, "score", False), (dist, "score", True)],
        id_col="id", k=2, weights=[2.0, 1.0],
    ).collect()
    got = {r["id"]: r["rrf_score"] for r in out}
    assert abs(got[1] - 2.0 / 61) < 1e-12
    assert abs(got[2] - 1.0 / 61) < 1e-12
    with pytest.raises(ValueError):
        rrf_fuse([], id_col="id")
    with pytest.raises(ValueError):
        rrf_fuse([(rel, "score", False)], id_col="id", weights=[1.0, 2.0])


# ------------------------------------------------------------ hybrid_topk
def test_hybrid_topk_end_to_end(session):
    docs = session.spark.createDataFrame(
        [(1, "apple pie recipe"), (2, "apple orchard"), (3, "car engine")],
        "doc_id long, text string",
    )
    vecs = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_topk(
        docs, vecs, "apple", [1.0, 0.0], k=3, n_per_branch=3,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    # lexical list: docs 1,2 match "apple" (3 never retrieved lexically);
    # dense list ranks 1,2,3 by distance to [1,0]
    assert got[1]["bm25_rank"] is not None and got[1]["cos_rank"] == 1
    assert got[3]["bm25_rank"] is None and got[3]["cos_rank"] == 3
    # doc with both strong branches fuses highest
    assert out[0]["doc_id"] in (1, 2)
    errs = [f for f in lint_plan(
        hybrid_topk(docs, vecs, "apple", [1.0, 0.0], k=3)
    ) if f["severity"] == "error"]
    assert errs == []


# ------------------------------------------------------------- mmr_rerank
def test_mmr_diversity_beats_relevance(session):
    # b is a near-duplicate of a; with a diversity-heavy lambda MMR must
    # pick the orthogonal c before b, although b is more relevant
    vecs = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=3, lambda_=0.3, pool=3)
    assert [r["vec_id"] for r in out.collect()] == [1, 3, 2]
    # relevance-only ordering keeps the duplicate adjacent
    rel_only = mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=3, lambda_=1.0, pool=3)
    assert [r["vec_id"] for r in rel_only.collect()] == [1, 2, 3]


def test_mmr_contracts(session):
    vecs = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # NULL and zero-norm rows never become candidates
    out = mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=2, pool=3).collect()
    assert [r["vec_id"] for r in out] == [1]
    assert out[0]["mmr_rank"] == 1
    # step-1 score is lambda*rel (empty-selected redundancy is 0)
    assert abs(out[0]["mmr_score"] - 0.7 * out[0]["relevance"]) < 1e-9
    with pytest.raises(ValueError):
        mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=5, pool=3)
    with pytest.raises(ValueError):
        mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=0)
    with pytest.raises(ValueError):
        mmr_rerank(vecs, [1.0, 0.0], "vec_id", lambda_=1.5)


def test_mmr_empty_input(session):
    vecs = session.spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    out = mmr_rerank(vecs, [1.0, 0.0], "vec_id", k=3, pool=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "mmr_rank", "vec_id", "relevance", "mmr_score"]


def test_ranked_list_drops_nan(session):
    df = _scored(session, [
        (1, 5.0), (2, float("nan")), (3, 3.0),
    ])
    out = ranked_list(df, "score", "id", n=2).collect()
    # the NaN row neither wins the descending cut nor appears at all
    assert [(r["id"], r["rank"]) for r in out] == [(1, 1), (3, 2)]


def test_cosine_topk_boundary_ties_deterministic(session):
    from datachain_spark.ops.similarity import cosine_topk

    # four identical vectors tie exactly; k=2 must pick the smallest ids
    # every run (the hybrid/MMR pool-cut determinism contract)
    vecs = session.spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in (9, 3, 7, 1)] + [(5, [0.0, 1.0])],
        "vid long, embedding array<double>",
    ).repartition(4)
    for _ in range(3):
        got = [r["vid"] for r in cosine_topk(
            vecs, [1.0, 0.0], k=2, id_cols=["vid"]).collect()]
        assert got == [1, 3]
