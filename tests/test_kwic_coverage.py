"""ops/retrieval.kwic and ops/tokenize.vocab_coverage."""

import pytest

from datachain_spark.ops.retrieval import kwic
from datachain_spark.ops.tokenize import vocab_coverage


def test_kwic_positions_and_snippets(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta GAMMA beta delta"), (2, "no hits here"),
         (3, "beta starts and ends beta"), (4, None)],
        "id int, text string",
    )
    rows = sorted(
        (r["id"], r["pos"], r["snippet"])
        for r in kwic(df, "Beta", "id", window=1).collect()
    )
    assert rows == [
        (1, 1, "alpha beta gamma"),
        (1, 3, "gamma beta delta"),
        (3, 0, "beta starts"),
        (3, 4, "ends beta"),
    ]
    with pytest.raises(ValueError, match="one token"):
        kwic(df, "two words", "id")
    with pytest.raises(ValueError, match="window"):
        kwic(df, "beta", "id", window=-1)


def test_kwic_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    plan = kwic(df, "a", "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_coverage(spark):
    vocab = spark.createDataFrame([("the",), ("cat",), ("sat",)], "word string")
    df = spark.createDataFrame(
        [(1, "The cat sat"), (2, "the DOG ran far"), (3, ""), (4, None)],
        "id int, text string",
    )
    out = {r["id"]: r for r in vocab_coverage(df, vocab, "id").collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["oov_rate"] == 0.0
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 3
    assert out[2]["oov_rate"] == pytest.approx(0.75)
    for blank in (3, 4):
        assert out[blank]["n_tokens"] == 0 and out[blank]["oov_rate"] is None


def test_vocab_coverage_broadcasts(spark):
    vocab = spark.createDataFrame([("x",)], "word string")
    df = spark.createDataFrame([(1, "x y")], "id int, text string")
    plan = (vocab_coverage(df, vocab, "id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_kwic_coverage_registry_oracles(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["kwic_docs", "vocab_coverage_docs"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)


# ---------------------------------------------- compression + union ----


def test_compression_ratio(spark):
    import zlib

    from datachain_spark.ops.text import compression_ratio

    texts = ["abc " * 200, "the quick brown fox jumps over the lazy dog",
             "", None]
    df = spark.createDataFrame(list(enumerate(texts)), "id int, text string")
    out = {r["id"]: r for r in compression_ratio(df, "id").collect()}
    # repeated text compresses hard; prose less so
    assert out[0]["compression_ratio"] < 0.1
    assert out[1]["compression_ratio"] > 0.5
    assert out[2]["compression_ratio"] is None and out[2]["n_bytes"] == 0
    assert out[3]["compression_ratio"] is None
    # differential vs Python zlib directly
    raw = texts[1].encode()
    assert out[1]["compression_ratio"] == len(zlib.compress(raw, 6)) / len(raw)


def test_union_by_name_reconciles(session):
    import datachain_spark as dcs

    a = dcs.read_values(k=[1], x=["a"], session=session)
    b = dcs.read_values(k=[2], y=[9.0], session=session)
    u = a.union_by_name(b).order_by("k").to_records()
    assert u[0] == {"k": 1, "x": "a", "y": None}
    assert u[1] == {"k": 2, "x": None, "y": 9.0}
    # strict union still refuses
    with pytest.raises(Exception, match="mismatch"):
        a.union(b)


# ------------------- r08: contamination matrix ----------------------------


def test_contamination_matrix_grid_semantics(spark):
    from datachain_spark.ops.text import contamination_matrix

    corpora = spark.createDataFrame(
        [
            ("c1", "the quick brown fox jumps high"),
            ("c1", "entirely unrelated corpus text here"),
            ("c2", "no overlap at all in this one"),
        ],
        "corpus string, text string",
    )
    benches = spark.createDataFrame(
        [
            ("s1", "the quick brown fox"),          # 2 trigrams, both in c1
            ("s2", "completely novel benchmark line"),
        ],
        "suite string, text string",
    )
    got = {
        (r["corpus"], r["suite"]): r
        for r in contamination_matrix(corpora, benches).collect()
    }
    assert set(got) == {("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c2", "s2")}
    # s1 = {the quick brown, quick brown fox}; both inside c1's doc 1
    assert got[("c1", "s1")]["ngrams_suite"] == 2
    assert got[("c1", "s1")]["shared_ngrams"] == 2
    assert got[("c1", "s1")]["frac_suite_in_corpus"] == 1.0
    # zero-overlap pairs keep their row with 0 counts
    assert got[("c2", "s1")]["shared_ngrams"] == 0
    assert got[("c2", "s1")]["frac_suite_in_corpus"] == 0.0
    assert got[("c1", "s2")]["shared_ngrams"] == 0
    # corpus gram counts are per-corpus distinct unions
    assert got[("c1", "s1")]["ngrams_corpus"] == 4 + 3  # 4 + 3 trigrams
    import pytest as _pt
    with _pt.raises(ValueError, match="ngram"):
        contamination_matrix(corpora, benches, ngram=0)


def test_overlap_matrix_pairs(spark):
    from datachain_spark.ops.text import overlap_matrix

    corpora = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps high"),
            ("b", "the quick brown fox sleeps"),
            ("c", "nothing shared with anyone else"),
        ],
        "corpus string, text string",
    )
    got = {
        (r["corpus_a"], r["corpus_b"]): r
        for r in overlap_matrix(corpora).collect()
    }
    # unordered pairs only, a < b, no self-pairs
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # a: 4 trigrams, b: 3; shared = {the quick brown, quick brown fox}
    ab = got[("a", "b")]
    assert (ab["ngrams_a"], ab["ngrams_b"], ab["shared_ngrams"]) == (4, 3, 2)
    assert abs(ab["jaccard"] - 2 / 5) < 1e-12
    assert got[("a", "c")]["shared_ngrams"] == 0
    assert got[("a", "c")]["jaccard"] == 0.0
    import pytest as _pt
    with _pt.raises(ValueError, match="ngram"):
        overlap_matrix(corpora, ngram=0)


def test_zipf_profile_exact_power_law(spark):
    from datachain_spark.ops.text import zipf_profile

    # frequencies 12/r at ranks 1..4: a perfect f = C*r^-1 law
    words = ["alpha"] * 12 + ["beta"] * 6 + ["gamma"] * 4 + ["delta"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_profile(df, top_k=10).collect()[0]
    assert row["n_tokens"] == 25
    assert row["n_types"] == 4
    assert row["top_freq"] == 12
    assert abs(row["zipf_slope"] + 1.0) < 1e-9
    assert abs(row["r2"] - 1.0) < 1e-9

    import pytest as _pt
    with _pt.raises(ValueError, match="top_k"):
        zipf_profile(df, top_k=1)


def test_contamination_matrix_from_stored_grams(spark):
    # incremental path: stored per-corpus ngram_index frames replace the
    # text rescan and must give IDENTICAL cells to the text path
    from pyspark.sql import functions as F

    from datachain_spark.ops.text import contamination_matrix, ngram_index

    corpora = spark.createDataFrame(
        [
            ("c1", "the quick brown fox jumps high"),
            ("c2", "no overlap at all in this one"),
        ],
        "corpus string, text string",
    )
    benches = spark.createDataFrame(
        [("s1", "the quick brown fox")], "suite string, text string",
    )
    grams = None
    for label in ("c1", "c2"):
        idx = ngram_index(
            corpora.filter(F.col("corpus") == label), "text", ngram=3
        ).withColumn("corpus", F.lit(label))
        grams = idx if grams is None else grams.unionByName(idx)
    via_text = {
        (r["corpus"], r["suite"]): (r["ngrams_corpus"], r["shared_ngrams"])
        for r in contamination_matrix(corpora, benches).collect()
    }
    via_grams = {
        (r["corpus"], r["suite"]): (r["ngrams_corpus"], r["shared_ngrams"])
        for r in contamination_matrix(
            corpora, benches, corpora_grams=grams
        ).collect()
    }
    assert via_text == via_grams
