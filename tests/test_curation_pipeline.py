"""End-to-end curation-pipeline composition: the full modern recipe chained
through the fluent surface — Gopher gate -> exact dedup -> MinHash dedup ->
SemDeDup (embedding join) -> leakage-safe split -> temperature-mixed
interleave -> sequence packing — with row-conservation
invariants checked at every stage. The point is that the operators COMPOSE
lazily: each stage consumes the previous stage's frame, nothing is
materialized in between except where an operator's contract requires it."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops import packing


@pytest.fixture(scope="module")
def corpus(session):
    docs = dc.read_parquet("/root/testdata/sf0.001/documents.parquet", session=session)
    emb = (
        dc.read_parquet("/root/testdata/sf0.001/embeddings.parquet", session=session)
        .mutate(embedding=F.col("embedding").cast("array<double>"))
    )
    return docs, emb


def test_full_curation_pipeline(session, corpus):
    docs, emb = corpus
    n0 = docs.count()

    # 1. quality gate (zero-shuffle projection). The synthetic fixture's
    # single-line docs all fail C4's terminal-punctuation line rule (its
    # composition with this chain is exercised by test_c4_gate_streaming
    # and the c4_gate oracle on its own slice), so the gate here is Gopher
    gated = docs.gopher_filter("doc_id")
    n_gated = gated.count()
    assert 0 < n_gated <= n0

    # 3-4. exact then near dedup — monotone shrinking, ids preserved
    uniq = gated.exact_dedup("text", "doc_id")
    near = uniq.minhash_dedup(
        "doc_id", num_hashes=16, bands=8, shingle_size=2,
        jaccard_threshold=0.4,
    )
    n_uniq, n_near = uniq.count(), near.count()
    assert n_near <= n_uniq <= n_gated
    ids_near = {r["doc_id"] for r in near.select("doc_id").to_records()}
    assert ids_near <= {r["doc_id"] for r in gated.select("doc_id").to_records()}

    # 5. semantic dedup on the joined embeddings (vec_id keys the docs table
    # fixture 1:1 at this sf)
    with_vec = near.merge(emb, on="doc_id", right_on="vec_id", inner=True)
    sem = with_vec.semdedup("doc_id", "embedding", num_cells=4, eps=0.7)
    n_sem = sem.count()
    assert 0 < n_sem <= with_vec.count()

    # 6. leakage-safe split on the surviving corpus
    split = sem.leakage_safe_split(
        "doc_id", test_fraction=0.25, shingle_size=2, num_hashes=8,
        bands=4, jaccard_threshold=0.3,
    )
    recs = split.select("doc_id", "split").to_records()
    assert len(recs) == n_sem
    assert {r["split"] for r in recs} <= {"train", "test"}

    # 7. temperature-mixed interleave of the two sides (flattens toward
    # the smaller side), then 8. pack the mixture into training sequences
    train = split.filter(dc.C.split == "train").df.drop("split")
    test = split.filter(dc.C.split == "test").df.drop("split")
    if test.count() == 0:  # tiny sf can leave an empty side; split 50/50 then
        train, test = (
            split.df.filter(F.col("doc_id") % 2 == 0).drop("split"),
            split.df.filter(F.col("doc_id") % 2 == 1).drop("split"),
        )
    # interleave tags rows with its own `source` column — the documents
    # fixture already has one, so rename it out of the way first
    mixed = packing.interleave_by_temperature(
        {
            "train": train.withColumnRenamed("source", "doc_source"),
            "eval": test.withColumnRenamed("source", "doc_source"),
        },
        temperature=2.0,
        key=["doc_id"],
    )
    assert mixed.count() > 0
    packed = packing.pack_sequences(
        mixed.select("doc_id", "text"), max_tokens=512, num_shards=4
    )
    stats = packed.groupBy("shard").agg(F.sum("n_tokens").alias("tok")).collect()
    assert stats and all(r["tok"] > 0 for r in stats)


def test_pipeline_stays_lazy(session, corpus):
    """Composing every stage must not trigger a job: building the full plan
    is driver-side only (except semdedup's centroid bootstrap, which is
    explicitly a k-row collect — give it centroids to avoid even that)."""
    docs, emb = corpus
    cents = [
        list(r["embedding"])
        for r in emb.df.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    tracker = session.spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    chain = (
        docs.gopher_filter("doc_id")
        .exact_dedup("text", "doc_id")
        .merge(emb, on="doc_id", right_on="vec_id", inner=True)
        .semdedup("doc_id", "embedding", centroids=cents, eps=0.7, persist=False)
    )
    after = tracker.getJobIdsForGroup(None)
    assert chain is not None and len(after) == len(before)
