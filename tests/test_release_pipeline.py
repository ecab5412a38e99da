"""End-to-end RELEASE-pipeline composition over this round's operators:
quality gate -> target-mix rebalance -> exact stratified split -> per-split
digest -> versioned save with attrs -> metadata-only dataset card. The
complement to test_curation_pipeline (dedup recipe): this is the publish
side — rebalance, split, checksum, document."""

import tempfile

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc


@pytest.fixture(scope="module")
def docs(session):
    return dc.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", session=session
    )


def test_release_pipeline(session, docs):
    n0 = docs.count()

    # 1. gate (zero-shuffle projection)
    gated = docs.gopher_filter("doc_id")
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 2. rebalance to an equal en/fr/de/zh token mix (es dropped by spec)
    mixed = gated.mix_to_target(
        "lang", {"en": 1, "fr": 1, "de": 1, "zh": 1}, "doc_id",
        token_col="n_chars",
    )
    langs = {r["lang"] for r in mixed.select("lang").distinct().to_records()}
    assert langs <= {"en", "fr", "de", "zh"}
    n2 = mixed.count()
    assert 0 < n2 <= n1

    # 3. exact per-language 90/10 split — proportions hold per stratum
    split = mixed.stratified_split("lang", [0.9, 0.1], "doc_id")
    import math
    from collections import Counter

    got = Counter(
        (r["lang"], r["split"]) for r in split.select("lang", "split").to_records()
    )
    sizes = Counter(r["lang"] for r in mixed.select("lang").to_records())
    for lang, n in sizes.items():
        assert got[(lang, "train")] == math.floor(0.9 * n)

    # 4. split digests: train/test partition the mixed corpus exactly
    train = split.filter(dc.C("split") == "train").select(
        "doc_id", "lang", "n_chars"
    )
    test = split.filter(dc.C("split") == "test").select(
        "doc_id", "lang", "n_chars"
    )
    d_all = mixed.select("doc_id", "lang", "n_chars").digest().to_records()[0]
    d_train = train.digest().to_records()[0]
    d_test = test.digest().to_records()[0]
    assert d_train["n_rows"] + d_test["n_rows"] == d_all["n_rows"] == n2
    # digests are sums of per-row hashes: the partition property is exact
    assert (int(d_train["digest"]) + int(d_test["digest"])
            == int(d_all["digest"]))

    # 5. versioned publish with provenance attrs + card renders
    train.save(
        "release_train",
        description="gated+rebalanced train split",
        attrs={"digest": d_train["digest"], "split": "train"},
    )
    card = dc.dataset_card("release_train", session=session)
    assert "gated+rebalanced" in card and d_train["digest"] in card
    # read-back digest matches the recorded one (integrity check a
    # downstream consumer would run)
    back = dc.read_dataset("release_train", session=session)
    assert back.select("doc_id", "lang", "n_chars").digest().to_records()[0][
        "digest"] == d_train["digest"]


def test_release_pipeline_stays_lazy(session, docs):
    # gate -> mix -> split -> filter composes into ONE unexecuted plan
    # (mix_to_target's #groups-row mass collect is its documented driver
    # contact; everything after composes lazily)
    mixed = docs.gopher_filter("doc_id").mix_to_target(
        "lang", {"en": 1, "zh": 1}, "doc_id", token_col="n_chars"
    )
    chain = mixed.stratified_split("lang", [0.9, 0.1], "doc_id").filter(
        dc.C("split") == "test"
    )
    # building the chain triggered no job beyond the mass collect: the
    # final frame is still a plan, and explain succeeds without execution
    plan = chain.df._jdf.queryExecution().logical().toString()
    assert "Filter" in plan
