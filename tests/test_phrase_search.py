"""Positional inverted index + phrase / proximity search
(ops/retrieval.build_inverted_index / phrase_search / proximity_search)."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import retrieval as R


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown dogs and a quick brown fox"),
            (3, "the fox is quick and brown"),
            (4, "brown quick fox"),
            (5, ""),
            (6, "Quick, brown: FOX!"),  # punctuation/case normalize away
        ],
        "doc_id long, text string",
    )
    return R.build_inverted_index(docs, "doc_id").cache()


def test_index_positions_sorted_and_blank_excluded(idx):
    rows = {(r["word"], r["doc"]): r["positions"] for r in idx.collect()}
    assert rows[("quick", 2)] == [0, 5]
    assert rows[("brown", 2)] == [1, 6]
    assert not any(doc == 5 for (_, doc) in rows)
    assert rows[("fox", 6)] == [2]  # normalization applied


def test_exact_phrase(idx):
    out = {r["doc"]: r for r in R.phrase_search(idx, "quick brown").collect()}
    assert set(out) == {1, 2, 6}
    assert out[2]["n_matches"] == 2 and out[2]["first_pos"] == 0
    assert out[1]["n_matches"] == 1 and out[1]["first_pos"] == 1


def test_phrase_order_matters(idx):
    # doc 4 is "brown quick fox" — reversed order must NOT match
    out = {r["doc"] for r in R.phrase_search(idx, "quick brown").collect()}
    assert 4 not in out and 3 not in out


def test_three_word_phrase(idx):
    out = {r["doc"]: r for r in R.phrase_search(idx, "quick brown fox").collect()}
    assert set(out) == {1, 2, 6}  # doc 1 has it at positions 1-3
    assert out[1]["first_pos"] == 1
    assert out[2]["first_pos"] == 5  # only the second quick-brown chains to fox


def test_proximity_phrase(idx):
    out = {r["doc"]: r for r in R.phrase_search(idx, "quick fox", proximity=2).collect()}
    assert set(out) == {1, 2, 4, 6}  # doc 3 has fox BEFORE quick
    assert out[1]["first_pos"] == 1


def test_single_word_phrase(idx):
    out = {r["doc"]: r["n_matches"] for r in R.phrase_search(idx, "quick").collect()}
    assert out == {1: 1, 2: 2, 3: 1, 4: 1, 6: 1}


def test_phrase_missing_word_no_rows(idx):
    assert R.phrase_search(idx, "quick zebra").count() == 0


def test_empty_phrase_rejected(idx):
    with pytest.raises(ValueError):
        R.phrase_search(idx, "!!! ...")


def test_proximity_search_window(idx):
    out = {r["doc"]: r for r in R.proximity_search(idx, ["fox", "dog"], 6).collect()}
    assert set(out) == {1}
    assert out[1]["span_start"] == 3 and out[1]["span_len"] == 6
    # tighter window excludes it (fox@3, dog@8 need >= 6)
    assert R.proximity_search(idx, ["fox", "dog"], 5).count() == 0


def test_proximity_any_order(idx):
    # doc 3: fox@1 ... quick@3 — unordered co-occurrence within 4
    out = {r["doc"] for r in R.proximity_search(idx, ["quick", "fox"], 4).collect()}
    assert 3 in out and 4 in out


def test_proximity_window_validation(idx):
    with pytest.raises(ValueError):
        R.proximity_search(idx, ["a", "b"], 1)


def test_no_explode_in_search_plan(idx, tmp_path):
    """Scale guard: position verification is per-doc array algebra — a
    query over a SAVED index must not re-explode postings (the only
    explode lives in the one-time index build)."""
    p = str(tmp_path / "idx")
    idx.write.parquet(p)
    stored = idx.sparkSession.read.parquet(p)
    plan = (
        R.phrase_search(stored, "quick brown fox")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan, plan  # posexplode would show as Generate
    # word-key pushdown reaches the scan: querying 3 words filters postings
    assert "PushedFilters" in plan and "word" in plan.split("PushedFilters")[1][:200]


def test_fluent_surface(spark):
    import datachain_spark as dc

    docs = dc.DataChain(
        spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    )
    idx = docs.build_inverted_index("doc_id")
    hit = idx.phrase_search("alpha beta").to_records()
    assert hit[0]["doc"] == 1 and hit[0]["first_pos"] == 0
