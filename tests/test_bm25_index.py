"""Persisted BM25 index + incremental refresh (ops/retrieval
bm25_index_frames/bm25_index_score, metastore.bm25_index_dataset/
refresh/search): index-scored results must equal the direct
bm25_score scan, and an incremental refresh must equal a from-scratch
rebuild over the updated corpus."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops.retrieval import (
    bm25_index_frames,
    bm25_index_score,
    bm25_score,
)


@pytest.fixture()
def fresh_ms(session, tmp_path):
    from datachain_spark.catalog.metastore import Metastore

    old = session.metastore
    session.metastore = Metastore(str(tmp_path / "ms"))
    yield session.metastore
    session.metastore = old


def _docs(session, sf_dir, cap=200):
    return dc.read_parquet(
        f"{sf_dir}/documents.parquet", session=session
    ).filter(dc.C("doc_id") < cap)


QUERY = "spark window merge"


def _cmp(a, b, id_col="doc_id"):
    ra = {r[id_col]: (r["dl"], round(r["score"], 9)) for r in a.collect()}
    rb = {r[id_col]: (r["dl"], round(r["score"], 9)) for r in b.collect()}
    assert ra == rb


def test_index_score_equals_direct_scan(session, sf_dir):
    docs = _docs(session, sf_dir).df
    post, dl = bm25_index_frames(docs, "doc_id")
    _cmp(
        bm25_index_score(post, dl, QUERY, "doc_id"),
        bm25_score(docs, QUERY, "doc_id"),
    )


def test_repeated_query_terms_match(session, sf_dir):
    docs = _docs(session, sf_dir, cap=80).df
    post, dl = bm25_index_frames(docs, "doc_id")
    q = "spark spark window"
    _cmp(
        bm25_index_score(post, dl, q, "doc_id"),
        bm25_score(docs, q, "doc_id"),
    )


def test_refresh_equals_rebuild_with_churn(session, sf_dir, fresh_ms):
    docs = _docs(session, sf_dir).df
    v1 = docs.filter(F.col("doc_id") % 3 != 0)
    dc.DataChain(v1, session).save("bidx")
    fresh_ms.bm25_index_dataset(session.spark, "bidx", "doc_id")

    # v2: the % 3 == 0 docs appear, doc 1 is EDITED, doc 2 disappears
    v2 = docs.filter(F.col("doc_id") != 2).withColumn(
        "text",
        F.when(F.col("doc_id") == 1,
               F.concat(F.col("text"), F.lit(" spark spark spark")))
        .otherwise(F.col("text")),
    )
    dc.DataChain(v2, session).save("bidx")
    fresh_ms.bm25_index_refresh(session.spark, "bidx")

    got = fresh_ms.bm25_search(session.spark, "bidx", QUERY)
    _cmp(got, bm25_score(v2, QUERY, "doc_id"))
    # edited doc's new tokens are in the refreshed postings
    post, dls, _ = fresh_ms._newest_bm25_generation(session.spark, "bidx")
    tf1 = post.filter(
        (F.col("term") == "spark") & (F.col("doc") == 1)
    ).first()
    base_tf1 = bm25_index_frames(
        docs.filter(F.col("doc_id") == 1), "doc_id"
    )[0].filter(F.col("term") == "spark").first()
    assert (tf1["tf"] if tf1 else 0) == (base_tf1["tf"] if base_tf1 else 0) + 3
    # deleted doc is gone from both frames
    assert dls.filter(F.col("doc") == 2).count() == 0
    assert post.filter(F.col("doc") == 2).count() == 0


def test_search_topk_and_missing_index(session, sf_dir, fresh_ms):
    from datachain_spark.error import DatasetNotFoundError

    docs = _docs(session, sf_dir, cap=80)
    docs.save("bk")
    with pytest.raises(DatasetNotFoundError, match="no BM25 index"):
        fresh_ms.bm25_search(session.spark, "bk", QUERY)
    with pytest.raises(DatasetNotFoundError, match="no BM25 index"):
        fresh_ms.bm25_index_refresh(session.spark, "bk")
    fresh_ms.bm25_index_dataset(session.spark, "bk", "doc_id")
    top = fresh_ms.bm25_search(session.spark, "bk", QUERY, k=5).collect()
    assert len(top) == 5
    assert [r["score"] for r in top] == sorted(
        (r["score"] for r in top), reverse=True
    )
