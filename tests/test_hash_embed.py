"""ops/embedding.hash_embed (hashing-trick vectors) and
chain.flatten_structs."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops.embedding import hash_embed


def _h(w, seed):
    return int(hashlib.md5(f"{w}:{seed}".encode()).hexdigest()[:15], 16)


def _py_embed(text, dim=16, seed=0x4E48, signed=True, normalize=True):
    import re

    words = re.sub(r"[^\w\s]", "", text.lower()).strip()
    vec = [0.0] * dim
    if words:
        for w in re.split(r"\s+", words):
            b = _h(w, seed) % dim
            s = 1 if (_h(w, seed + 1) % 2 == 0) else -1
            vec[b] += s if signed else 1
    if normalize:
        n = math.sqrt(sum(x * x for x in vec))
        return [x / n for x in vec] if n > 0 else None
    return vec


def test_hash_embed_matches_python_reference(spark):
    texts = ["the quick brown fox", "hello hello world", "", "a b c d e f"]
    df = spark.createDataFrame(list(enumerate(texts)), "id int, text string")
    out = {r["id"]: r["embedding"]
           for r in hash_embed(df, "id", dim=16, hash_fn="md5").collect()}
    for i, t in enumerate(texts):
        expect = _py_embed(t)
        if expect is None:
            assert out[i] is None
        else:
            assert out[i] == pytest.approx(expect, abs=1e-12), (i, t)


def test_hash_embed_cosine_pipeline(spark):
    # end-to-end: hashed vectors feed cosine_topk — near-identical docs
    # rank closest
    from datachain_spark.ops.similarity import cosine_topk

    texts = ["spark engine for data", "spark engine for big data",
             "completely unrelated words entirely", "spark engine data"]
    df = spark.createDataFrame(list(enumerate(texts)), "id int, text string")
    emb = hash_embed(df, "id", dim=64)
    query = emb.filter("id = 0").collect()[0]["embedding"]
    top = cosine_topk(emb.filter("id != 0"), query, "embedding", k=2,
                      id_cols=["id"]).collect()
    # 4 shared terms (id 1) beats 3 (id 3); the unrelated doc never ranks
    assert [r["id"] for r in top] == [1, 3]
    assert top[0]["distance"] < 0.2


def test_hash_embed_unsigned_and_guards(spark):
    df = spark.createDataFrame([(1, "x x y")], "id int, text string")
    raw = hash_embed(df, "id", dim=8, signed=False, normalize=False).collect()[0]
    assert sum(raw["embedding"]) == 3.0  # plain counts
    with pytest.raises(ValueError, match="dim"):
        hash_embed(df, "id", dim=1)


def test_flatten_structs(session):
    df = session.spark.createDataFrame(
        [(1, ((2, "a"), 3.0))],
        "id int, s struct<inner: struct<x: int, y: string>, z: double>",
    )
    flat = dcs.DataChain(df, session).flatten_structs()
    assert flat.df.columns == ["id", "s_inner_x", "s_inner_y", "s_z"]
    r = flat.to_records()[0]
    assert (r["s_inner_x"], r["s_inner_y"], r["s_z"]) == (2, "a", 3.0)
    one_level = dcs.DataChain(df, session).flatten_structs(recursive=False)
    assert "s_inner" in one_level.df.columns
    plan = flat.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_embed_registry_oracle(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    ok, detail = compare(
        q["hash_embed_md5"](session.spark, "/root/testdata/sf0.001"),
        o["hash_embed_md5"],
        "/root/testdata/sf0.001",
    )
    assert ok, detail


def test_cosine_arrow_kernel_matches_hof(spark):
    # VERDICT r05 #2: the d>=32 Arrow matmul kernel must agree with the
    # HOF expression twin — same ranking, distances to float ulps, and the
    # same NULL contract (NULL vec and zero-norm vec -> NULL distance,
    # never into the top-k).
    from pyspark.sql import functions as F
    from datachain_spark.ops.similarity import cosine_topk, cosine_join_topk

    base = spark.range(200).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.pmod(F.xxhash64("id", i), F.lit(100)).cast("double") / 50.0 - 1.0,
        ).alias("embedding"),
    )
    nulls = spark.createDataFrame(
        [(1000, None), (1001, [0.0] * 64)], "id long, embedding array<double>"
    )
    df = base.unionByName(nulls)
    qv = base.limit(1).collect()[0]["embedding"]

    got_a = cosine_topk(df, qv, "embedding", k=5, id_cols=["id"], arrow=True).collect()
    got_h = cosine_topk(df, qv, "embedding", k=5, id_cols=["id"], arrow=False).collect()
    assert [r["id"] for r in got_a] == [r["id"] for r in got_h]
    for ra, rh in zip(got_a, got_h):
        assert abs(ra["distance"] - rh["distance"]) < 1e-9
    assert all(r["id"] < 1000 for r in got_a)  # NULL/zero-norm never rank

    # pair kernel: the d-probe picks Arrow at d=64; identical ranking
    left = base.limit(5)
    ja = cosine_join_topk(left, df, "embedding", "embedding", k=3,
                          left_id="id", right_id="id").collect()
    jh = cosine_join_topk(left, df, "embedding", "embedding", k=3,
                          left_id="id", right_id="id", arrow=False).collect()
    key = lambda r: (r["qid"], r["nid"])
    assert sorted(map(key, ja)) == sorted(map(key, jh))


def test_hash_embed_arrow_assembly_bit_identical(spark):
    # the numpy scatter/normalize must be VALUE-IDENTICAL to the
    # expression twin (integer bucket counts -> exact square sums in any
    # summation order), not merely close — both feed the same oracles.
    from pyspark.sql import functions as F
    from datachain_spark.ops.embedding import hash_embed

    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "jumps over the lazy dog"),
         (2, ""), (3, None), (4, "fox fox fox")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["embedding"]
         for r in hash_embed(docs, "doc_id", dim=64).collect()}
    h = {r["doc_id"]: r["embedding"]
         for r in hash_embed(docs, "doc_id", dim=64, arrow=False).collect()}
    assert set(a) == set(h) == {0, 1, 2, 3, 4}
    for k in a:
        assert a[k] == h[k], (k, a[k], h[k])
    assert a[2] is None and a[3] is None  # blank/NULL: no direction
