

def test_strip_boilerplate_semantics(spark):
    # Onion-style: the high-df footer vanishes from EVERY doc (unlike
    # segment_dedup's keep-first), the rare line survives, short lines
    # are never counted or stripped, NULL text passes through.
    from datachain_spark.ops.text import strip_boilerplate

    footer = "Subscribe to our newsletter"
    rows = [(i, f"unique body {i}\n--\n{footer}") for i in range(20)]
    rows += [(100, f"rare note\nunique body 100\n{footer}"),
             (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(
        df, "doc_id", min_doc_frac=0.05, min_docs=2
    ).collect()}
    assert all(footer not in out[i]["text"] for i in range(20))
    assert out[0]["text"] == "unique body 0\n--"   # short '--' survives
    assert out[0]["n_stripped"] == 1
    assert "rare note" in out[100]["text"]          # df=1 < threshold
    assert out[101]["text"] is None and out[101]["n_stripped"] == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="min_doc_frac"):
        strip_boilerplate(df, "doc_id", min_doc_frac=0.0)


def test_corpus_overlap_semantics(spark):
    from datachain_spark.ops.text import corpus_overlap

    a = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "pack my box with five dozen jugs")],
        "id long, text string",
    )
    # b shares doc 1's text exactly, plus a disjoint doc
    b = spark.createDataFrame(
        [(10, "the quick brown fox jumps high"),
         (11, "entirely different words here indeed")],
        "id long, text string",
    )
    r = corpus_overlap(a, b, ngram=3).collect()[0]
    assert r["shared_ngrams"] == 4  # the 4 distinct 3-grams of doc 1
    assert 0 < r["jaccard"] < 1
    assert abs(r["frac_a_in_b"] - 4 / r["ngrams_a"]) < 1e-12

    # identical corpora: full overlap
    full = corpus_overlap(a, a).collect()[0]
    assert full["jaccard"] == 1.0 and full["frac_a_in_b"] == 1.0

    # empty side: NULL fractions (no evidence), zero shared
    empty = spark.createDataFrame([], "id long, text string")
    z = corpus_overlap(a, empty).collect()[0]
    assert z["shared_ngrams"] == 0 and z["frac_b_in_a"] is None

    # fluent form
    import datachain_spark as dc
    ca, cb = dc.DataChain(a), dc.DataChain(b)
    assert ca.corpus_overlap(cb).count() == 1


def test_collocations_semantics(spark):
    import math

    from datachain_spark.ops.text import collocations

    # "san francisco" always adjacent (strong collocation); "the" is
    # frequent everywhere (weak PMI with anything)
    docs = spark.createDataFrame(
        [(i, "the city of san francisco by the bay") for i in range(5)]
        + [(99, "the bay near the city")],
        "id long, text string",
    )
    out = collocations(docs, k=5, min_count=2).collect()
    # three pairs tie at the maximal PMI (all counts 5/5/5); ties order
    # by word_a, so the perfect collocations lead and (san, francisco)
    # is among them with hand-checkable arithmetic
    sf = next(r for r in out
              if (r["word_a"], r["word_b"]) == ("san", "francisco"))
    assert sf["c_ab"] == 5 and sf["c_a"] == 5 and sf["c_b"] == 5
    assert out[0]["pmi"] == sf["pmi"]  # top shares the maximal PMI
    n_uni = 5 * 8 + 5
    n_bi = 5 * 7 + 4
    want = math.log((5 / n_bi) / ((5 / n_uni) * (5 / n_uni)))
    assert abs(sf["pmi"] - round(want, 6)) < 1e-9
    # min_count filters singletons entirely
    pairs = {(r["word_a"], r["word_b"]) for r in out}
    assert ("bay", "near") not in pairs

    import pytest as _pytest

    with _pytest.raises(ValueError):
        collocations(docs, k=0)
    with _pytest.raises(ValueError):
        collocations(docs, min_count=0)
