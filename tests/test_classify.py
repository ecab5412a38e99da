"""Naive-Bayes hashed-feature classifier (ops/classify) — hand-computed
posteriors on a separable corpus, edge cases (blank docs, single-label
model, ties), the nb_filter gate, and the scale-shape plan assertion
(corpus never shuffles for the model join)."""

import math

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import classify
from datachain_spark.plans import join_strategies


def _labeled(session, rows):
    return session.spark.createDataFrame(rows, "doc_id long, label string, text string")


def _docs(session, rows):
    return session.spark.createDataFrame(rows, "doc_id long, text string")


SEP_TRAIN = [
    (1, "cat", "meow purr whiskers meow"),
    (2, "cat", "purr meow feline whiskers"),
    (3, "cat", "whiskers feline purr purr"),
    (4, "dog", "woof bark fetch woof"),
    (5, "dog", "bark woof growl fetch"),
    (6, "dog", "fetch growl bark bark"),
]


def test_nb_separable_corpus_perfect_accuracy(session):
    train = _labeled(session, SEP_TRAIN)
    model = classify.nb_train(train, "label", num_buckets=512, hash_fn="md5")
    test = _docs(session, [
        (10, "meow meow purr"),
        (11, "woof bark bark"),
        (12, "feline whiskers purr meow"),
        (13, "growl fetch woof"),
    ])
    out = {r["doc_id"]: r for r in
           classify.nb_classify(test, model, "doc_id", num_buckets=512,
                                hash_fn="md5").collect()}
    assert out[10]["pred_label"] == "cat"
    assert out[11]["pred_label"] == "dog"
    assert out[12]["pred_label"] == "cat"
    assert out[13]["pred_label"] == "dog"
    for r in out.values():
        assert r["margin"] is not None and r["margin"] > 0
    # n_feats counts uni+bigrams: 3 words -> 3 + 2 = 5
    assert out[10]["n_feats"] == 5
    assert out[12]["n_feats"] == 7


def test_nb_hand_computed_posterior(session):
    """One-word doc, tiny bucket space, exact Laplace math."""
    train = _labeled(session, [
        (1, "a", "x x"),   # 2 unigrams + 1 bigram = 3 feats for label a
        (2, "b", "y"),     # 1 feat for label b
    ])
    # B=512: buckets for 'x' (470), 'y' (214), 'x x' (307) are distinct
    # (at B=64 'x' and 'y' collide — 470 ≡ 214 mod 64)
    B = 512
    model = classify.nb_train(train, "label", num_buckets=B, hash_fn="md5")
    rows = {(r["label"], r["bucket"]): r for r in model.collect()}
    # label a: buckets for 'x' (count 2) and 'x x' (count 1); label b: 'y' (1)
    a_counts = sorted(r["feat_count"] for (lab, _), r in rows.items() if lab == "a")
    assert a_counts == [1, 2]
    assert all(r["label_feats"] == 3 for (lab, _), r in rows.items() if lab == "a")
    assert all(r["label_docs"] == 1 and r["total_docs"] == 2 for r in rows.values())

    out = classify.nb_classify(
        _docs(session, [(7, "x")]), model, "doc_id",
        num_buckets=B, hash_fn="md5").collect()[0]
    # P(x|a) = (2+1)/(3+512), P(x|b) = (0+1)/(1+512); priors 1/2 each
    lj_a = math.log(0.5) + math.log(3 / 515)
    lj_b = math.log(0.5) + math.log(1 / 513)
    assert out["pred_label"] == "a"
    assert out["log_joint"] == pytest.approx(lj_a, abs=1e-9)
    assert out["margin"] == pytest.approx(lj_a - lj_b, abs=1e-9)


def test_nb_blank_doc_prior_only_and_no_row_loss(session):
    train = _labeled(session, SEP_TRAIN + [(7, "cat", "meow")])  # cat prior 4/7
    model = classify.nb_train(train, "label", num_buckets=256, hash_fn="md5")
    test = _docs(session, [(20, ""), (21, "   "), (22, None), (23, "woof")])
    out = {r["doc_id"]: r for r in
           classify.nb_classify(test, model, "doc_id", num_buckets=256,
                                hash_fn="md5").collect()}
    assert set(out) == {20, 21, 22, 23}  # blank/null docs survive
    for d in (20, 21, 22):
        assert out[d]["n_feats"] == 0
        assert out[d]["pred_label"] == "cat"  # majority prior
        assert out[d]["log_joint"] == pytest.approx(math.log(4 / 7), abs=1e-9)
        assert out[d]["margin"] == pytest.approx(math.log(4 / 3), abs=1e-9)


def test_nb_single_label_model_null_margin(session):
    train = _labeled(session, [(1, "only", "alpha beta"), (2, "only", "beta gamma")])
    model = classify.nb_train(train, "label", num_buckets=128, hash_fn="md5")
    out = classify.nb_classify(
        _docs(session, [(1, "alpha")]), model, "doc_id",
        num_buckets=128, hash_fn="md5").collect()[0]
    assert out["pred_label"] == "only"
    assert out["margin"] is None


def test_nb_tie_breaks_on_larger_label(session):
    """Symmetric training -> identical posteriors; larger label string wins."""
    train = _labeled(session, [(1, "aa", "same text"), (2, "zz", "same text")])
    model = classify.nb_train(train, "label", num_buckets=128, hash_fn="md5")
    out = classify.nb_classify(
        _docs(session, [(5, "same")]), model, "doc_id",
        num_buckets=128, hash_fn="md5").collect()[0]
    assert out["pred_label"] == "zz"
    assert out["margin"] == pytest.approx(0.0, abs=1e-12)


def test_nb_filter_gate(session):
    train = _labeled(session, SEP_TRAIN)
    model = classify.nb_train(train, "label", num_buckets=512, hash_fn="md5")
    corpus = _docs(session, [
        (1, "meow purr"), (2, "woof bark"), (3, "purr whiskers meow"), (4, ""),
    ])
    kept = classify.nb_filter(corpus, model, "doc_id", "cat",
                              num_buckets=512, hash_fn="md5")
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}
    # blank doc predicts by prior (tie over equal priors -> 'dog' > 'cat');
    # min_margin excludes near-ties
    kept_hi = classify.nb_filter(corpus, model, "doc_id", "cat", min_margin=1e9,
                                 num_buckets=512, hash_fn="md5")
    assert kept_hi.count() == 0
    assert set(kept.columns) == set(corpus.columns)  # schema passthrough


def test_nb_validates_inputs(session):
    train = _labeled(session, SEP_TRAIN)
    with pytest.raises(ValueError, match="num_buckets"):
        classify.nb_train(train, "label", num_buckets=0)
    model = classify.nb_train(train, "label", num_buckets=64)
    with pytest.raises(ValueError, match="alpha"):
        classify.nb_classify(_docs(session, [(1, "x")]), model, "doc_id",
                             num_buckets=64, alpha=0.0)


def test_nb_fluent_chain_surface(session):
    import datachain_spark as dc

    train = _labeled(session, SEP_TRAIN)
    model = classify.nb_train(train, "label", num_buckets=512, hash_fn="md5")
    ch = dc.read_values(
        doc_id=[1, 2], text=["meow purr", "woof bark"], session=session
    )
    preds = ch.nb_classify(model, "doc_id", num_buckets=512, hash_fn="md5")
    got = {r["doc_id"]: r["pred_label"] for r in preds.df.collect()}
    assert got == {1: "cat", 2: "dog"}
    kept = ch.nb_filter(model, "doc_id", "dog", num_buckets=512, hash_fn="md5")
    assert [r["doc_id"] for r in kept.df.collect()] == [2]


def test_nb_scale_shape_model_join_broadcast(session):
    """The corpus side must reach the model via broadcast joins — no
    sort-merge exchange keyed on the bucket; the only exchanges hash the
    doc id (+label) for the per-doc aggregations."""
    train = _labeled(session, SEP_TRAIN)
    model = classify.nb_train(train, "label", num_buckets=512)
    preds = classify.nb_classify(
        _docs(session, [(1, "meow"), (2, "woof")]), model, "doc_id")
    strategies = join_strategies(preds)
    assert strategies, "expected joins in the classify plan"
    assert all("Broadcast" in s for s in strategies), strategies


def test_nb_train_excludes_null_labels(session):
    train = session.spark.createDataFrame(
        [(1, "cat", "meow purr"), (2, None, "junk text junk"),
         (3, "dog", "woof bark")],
        "doc_id long, label string, text string",
    )
    model = classify.nb_train(train, "label", num_buckets=128)
    rows = model.collect()
    assert {r["label"] for r in rows} == {"cat", "dog"}
    # the NULL-label row is excluded from total_docs too (priors undistorted)
    assert all(r["total_docs"] == 2 for r in rows)
