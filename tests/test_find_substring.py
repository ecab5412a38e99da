"""Query-time phrase search over the stored gram index
(ops/text.substring_index + find_substring): correctness vs a direct
normalized-text scan, word-boundary semantics, the false-candidate
confirm step, the needle resolution bound, and the pushed-down IN
filter on the index scan."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.text import find_substring, substring_index


@pytest.fixture()
def corpus(session):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "a QUICK, brown fox! appears here"),
        (3, "quick brown foxes are not the same"),
        # all three grams of "quick brown fox jumps" present but SCATTERED:
        # gram-candidate, must die in the confirm step
        (4, "quick brown fox sleeps; brown fox jumps early; fox jumps over"),
        (5, "nothing relevant at all"),
        (6, "prefix words then the quick brown fox jumps again"),
    ]
    return session.spark.createDataFrame(rows, "doc_id int, text string")


def _norm(sdf):
    return F.array_join(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^\w\s]", "")),
            r"\s+",
        ),
        " ",
    )


def test_find_substring_matches_direct_scan(session, corpus):
    idx = substring_index(corpus, "doc_id", ngram=3)
    got = {
        (r["doc_id"], r["pos"])
        for r in find_substring(
            corpus, idx, "Quick Brown Fox jumps!", "doc_id", ngram=3
        ).collect()
    }
    # ground truth: padded word-boundary position over normalized text
    truth = {
        (r["doc_id"], r["pos"])
        for r in corpus.select(
            "doc_id",
            F.locate(
                " quick brown fox jumps ",
                F.concat(F.lit(" "), _norm(corpus), F.lit(" ")),
            ).cast("long").alias("pos"),
        ).filter(F.col("pos") > 0).collect()
    }
    assert got == truth
    assert {d for d, _ in got} == {1, 6}
    # doc 4 carried every gram (scattered) and was killed by confirm
    assert 4 not in {d for d, _ in got}


def test_candidate_prune_is_superset_then_exact(session, corpus):
    idx = substring_index(corpus, "doc_id", ngram=3)
    # the candidate phase alone admits doc 4; the full op does not —
    # run with a needle that exists nowhere contiguously
    out = find_substring(
        corpus, idx, "brown fox jumps early today", "doc_id", ngram=3
    ).collect()
    assert out == []  # doc 4 has the words, not the phrase


def test_word_boundary_semantics(session):
    df = session.spark.createDataFrame(
        [(1, "we concat dog food here daily"), (2, "a cat dog food bowl")],
        "doc_id int, text string",
    )
    idx = substring_index(df, "doc_id", ngram=3)
    got = [r["doc_id"] for r in
           find_substring(df, idx, "cat dog food", "doc_id", ngram=3)
           .collect()]
    assert got == [2]  # 'concat dog food' is not a word-boundary hit


def test_non_ascii_needle_normalizes_like_the_index(session):
    # Spark's Java \w is ASCII-only; the needle normalization must use
    # re.ASCII too, or an accented needle hashes different grams and
    # silently matches nothing (review finding)
    df = session.spark.createDataFrame(
        [(1, "le café est ouvert ce matin"), (2, "nothing here at all")],
        "doc_id int, text string",
    )
    idx = substring_index(df, "doc_id", ngram=3)
    got = [r["doc_id"] for r in
           find_substring(df, idx, "le café est ouvert", "doc_id", ngram=3)
           .collect()]
    assert got == [1]


def test_needle_below_index_resolution_raises(session, corpus):
    idx = substring_index(corpus, "doc_id", ngram=3)
    with pytest.raises(ValueError, match="resolves phrases"):
        find_substring(corpus, idx, "quick brown", "doc_id", ngram=3)


def test_md5_family_parity(session, corpus):
    idx = substring_index(corpus, "doc_id", ngram=3, hash_fn="md5")
    got = {r["doc_id"] for r in find_substring(
        corpus, idx, "quick brown fox jumps", "doc_id",
        ngram=3, hash_fn="md5",
    ).collect()}
    assert got == {1, 6}


def test_metastore_gram_index_workflow(session, corpus, tmp_path):
    from datachain_spark.catalog.metastore import Metastore
    from datachain_spark.error import DatasetNotFoundError

    old = session.metastore
    ms = session.metastore = Metastore(str(tmp_path / "ms"))
    try:
        import datachain_spark as dc

        dc.DataChain(corpus, session).save("gidx")
        with pytest.raises(DatasetNotFoundError, match="no gram index"):
            ms.find_substring(session.spark, "gidx", "quick brown fox jumps")
        ms.gram_index_dataset(session.spark, "gidx", "doc_id")
        got = {r["doc_id"] for r in ms.find_substring(
            session.spark, "gidx", "quick brown fox jumps"
        ).collect()}
        assert got == {1, 6}
        # vacuum GC also covers the gram index
        dc.DataChain(corpus, session).save("gidx")
        ms.gram_index_dataset(session.spark, "gidx", "doc_id")
        ms.vacuum_dataset("gidx", keep_last=1)
        grec = ms.get_record("gidx__grams")
        assert len(grec.versions) == 1  # v1's index was GC'd with v1
    finally:
        session.metastore = old


def test_index_scan_pushes_the_in_filter(session, corpus, tmp_path):
    # the stored-index probe must reach the parquet scan as a pushed
    # IN(ngram_hash, ...) predicate — the whole point of persisting it
    p = str(tmp_path / "subidx")
    substring_index(corpus, "doc_id", ngram=3).write.parquet(p)
    stored = session.spark.read.parquet(p)
    out = find_substring(
        corpus, stored, "quick brown fox jumps", "doc_id", ngram=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "ngram_hash" in ln and "In(" in ln
    ]
    assert pushed, f"IN(ngram_hash) not pushed:\n{plan[:2000]}"
    assert {r["doc_id"] for r in out.collect()} == {1, 6}
