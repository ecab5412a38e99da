"""Dedup / similarity / text / multimodal operator invariants."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(session):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "The  quick brown fox jumps over the lazy dog",  # exact dup of 0 (norm)
        "completely different content about spark engines",
        "der schnelle braune fuchs springt",
        "le renard brun rapide saute par dessus",
        "",
    ]
    return dc.read_values(session=session, doc_id=list(range(len(texts))), text=texts)


def test_exact_dedup_normalized(docs):
    out = dedup.exact_dedup(docs.df, "text", "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 0 in kept and 2 not in kept  # doc 2 is a whitespace/case variant of 0
    assert len(kept) == 6


def test_minhash_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs.df.filter(F.length("text") > 0), "doc_id", "text",
        num_hashes=64, bands=16, jaccard_threshold=0.3,
    ).collect()
    assert any({p["id_a"], p["id_b"]} == {0, 1} or {p["id_a"], p["id_b"]} == {0, 2}
               or {p["id_a"], p["id_b"]} == {1, 2} for p in pairs)
    # different-content docs don't pair with the fox docs
    assert not any(3 in (p["id_a"], p["id_b"]) and p["id_b"] != 3 for p in pairs)


def test_minhash_dedup_drops_dupes(docs):
    out = dedup.minhash_dedup(
        docs.df.filter(F.length("text") > 0), "doc_id", "text",
        num_hashes=64, bands=16, jaccard_threshold=0.3,
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 0 in ids and len(ids) < 6


_SIG_KW = dict(num_hashes=64, shingle_size=3)
_MH_KW = dict(bands=16, **_SIG_KW)


def test_minhash_dedup_keep_by_quality(session):
    # 0,1,2 are mutual near-dups; 1 has the best score and must be the
    # survivor under BOTH modes (it wins every pair and the component)
    df = dc.read_values(
        session=session,
        doc_id=[0, 1, 2, 3],
        text=[
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "the quick brown fox jumps over the lazy dog today",
            "completely different content about spark engines",
        ],
        quality=[0.1, 0.9, 0.5, 0.2],
    ).df
    kw = dict(num_hashes=64, bands=32, jaccard_threshold=0.3, shingle_size=2)
    for exhaustive in (False, True):
        kept = sorted(
            r["doc_id"]
            for r in dedup.minhash_dedup(
                df, "doc_id", "text", exhaustive=exhaustive,
                keep_by="quality", **kw
            ).collect()
        )
        assert kept == [1, 3], (exhaustive, kept)
    # without keep_by the min id wins instead
    kept = sorted(
        r["doc_id"]
        for r in dedup.minhash_dedup(
            df, "doc_id", "text", exhaustive=True, **kw
        ).collect()
    )
    assert kept == [0, 3]


def test_minhash_dedup_keep_by_null_and_tie(session):
    df = dc.read_values(
        session=session,
        doc_id=[10, 11, 12],
        text=[
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "alpha beta gamma delta epsilon zeta eta kappa",
        ],
        quality=[None, 0.5, 0.5],
    ).df
    kw = dict(num_hashes=64, bands=32, jaccard_threshold=0.3, shingle_size=2)
    kept = sorted(
        r["doc_id"]
        for r in dedup.minhash_dedup(
            df, "doc_id", "text", exhaustive=True, keep_by="quality", **kw
        ).collect()
    )
    # null loses to scored; 11 vs 12 tie at 0.5 -> min id 11 survives
    assert kept == [11]


def test_minhash_match_index_equals_batch_pairs(docs):
    # matching a corpus against its own signature index must reproduce the
    # batch LSH pairs exactly (symmetric closure, self-pairs excluded)
    corpus = docs.df.filter(F.length("text") > 0)
    idx = dedup.minhash_signatures(corpus, "doc_id", "text", **_SIG_KW)
    assert idx.columns == ["doc_id", "sig"]
    hits = dedup.minhash_match_index(
        corpus, idx, "doc_id", "text", jaccard_threshold=0.3, **_MH_KW
    ).filter(F.col("new_id") != F.col("index_id"))
    got = {(min(r["new_id"], r["index_id"]), max(r["new_id"], r["index_id"]),
            r["est_jaccard"]) for r in hits.collect()}
    batch = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.3, **_MH_KW
    )
    want = {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in batch.collect()}
    assert got == want and want  # non-vacuous: the fox near-dups pair up
    # the signature-level entry points reproduce both flows exactly
    from_sig = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in dedup.minhash_pairs_from_signatures(
            idx, "doc_id", jaccard_threshold=0.3,
            num_hashes=_MH_KW["num_hashes"], bands=_MH_KW["bands"],
        ).collect()
    }
    assert from_sig == want
    match_sig = {
        (min(r["new_id"], r["index_id"]), max(r["new_id"], r["index_id"]),
         r["est_jaccard"])
        for r in dedup.minhash_match_signatures(
            idx, idx, "doc_id", jaccard_threshold=0.3,
            num_hashes=_MH_KW["num_hashes"], bands=_MH_KW["bands"],
        ).filter(F.col("new_id") != F.col("index_id")).collect()
    }
    assert match_sig == want


def test_minhash_match_index_self_pairs_are_exact(docs):
    corpus = docs.df.filter(F.length("text") > 0)
    idx = dedup.minhash_signatures(corpus, "doc_id", "text", **_SIG_KW)
    self_hits = dedup.minhash_match_index(
        corpus, idx, "doc_id", "text", jaccard_threshold=0.3, **_MH_KW
    ).filter(F.col("new_id") == F.col("index_id"))
    rows = self_hits.collect()
    assert len(rows) == corpus.count()
    assert all(r["est_jaccard"] == 1.0 for r in rows)


def test_minhash_dedup_incremental(session, docs):
    # index the fox doc; a new snapshot with a near-dup + a novel doc
    indexed = docs.df.filter(F.col("doc_id") == 0)
    idx = dedup.minhash_signatures(indexed, "doc_id", "text", **_SIG_KW)
    new = dc.read_values(
        session=session,
        doc_id=[100, 101],
        text=[
            "the quick brown fox jumps over the lazy cat",  # near-dup of indexed 0
            "entirely novel material concerning databases",
        ],
    ).df
    kept = dedup.minhash_dedup_incremental(
        new, idx, "doc_id", "text", jaccard_threshold=0.3, **_MH_KW
    )
    assert [r["doc_id"] for r in kept.collect()] == [101]
    assert kept.columns == new.columns  # corpus schema passes through

    # empty index keeps everything
    empty_idx = idx.filter(F.lit(False))
    assert dedup.minhash_dedup_incremental(
        new, empty_idx, "doc_id", "text", jaccard_threshold=0.3, **_MH_KW
    ).count() == 2


def test_minhash_incremental_fluent(session, docs):
    ch = dc.DataChain(docs.df.filter(F.length("text") > 0))
    idx = ch.minhash_index("doc_id", **_SIG_KW)
    assert set(idx.df.columns) == {"doc_id", "sig"}
    new = dc.read_values(
        session=session, doc_id=[200],
        text=["the quick brown fox jumps over the lazy dog"],
    )
    out = new.minhash_dedup_incremental(
        idx, "doc_id", jaccard_threshold=0.3, **_MH_KW
    )
    assert out.df.count() == 0  # exact dup of indexed doc 0 is dropped


def test_connected_components_chains(session):
    # chain 1-2-3-4 (one component), pair 10-11, isolated vertex never appears
    pairs = dc.read_values(
        session=session, id_a=[1, 2, 3, 10], id_b=[2, 3, 4, 11]
    )
    comp = {r["id"]: r["component"]
            for r in dedup.connected_components(pairs.df).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # edge direction must not matter
    rev = dc.read_values(session=session, id_a=[2, 3, 4, 11], id_b=[1, 2, 3, 10])
    comp2 = {r["id"]: r["component"]
             for r in dedup.connected_components(rev.df).collect()}
    assert comp2 == comp


def test_connected_components_incremental(session):
    """Incremental label maintenance == from-scratch components, across
    the interesting shapes: a new doc bridging two old clusters, a new
    doc attaching to one cluster, a purely-new cluster, and untouched
    old singleton labels passing through."""
    import random

    old_pairs = dc.read_values(
        session=session, id_a=[1, 2, 10, 20], id_b=[2, 3, 11, 21]
    )
    labels = dedup.connected_components(old_pairs.df)
    # new doc 100 BRIDGES clusters {1,2,3} and {10,11}; 101 attaches to
    # {20,21}; 200-201 form a brand-new cluster
    new_pairs = dc.read_values(
        session=session,
        id_a=[100, 100, 101, 200],
        id_b=[3, 10, 21, 201],
    )
    inc = {(r["id"], r["component"]) for r in
           dedup.connected_components_incremental(
               labels, new_pairs.df).collect()}
    full = dc.read_values(
        session=session,
        id_a=[1, 2, 10, 20, 100, 100, 101, 200],
        id_b=[2, 3, 11, 21, 3, 10, 21, 201],
    )
    want = {(r["id"], r["component"]) for r in
            dedup.connected_components(full.df).collect()}
    assert inc == want
    assert dict(inc)[11] == 1  # old member relabeled across the bridge

    # randomized equivalence: split a random edge set at a vertex cutoff
    rnd = random.Random(7)
    edges = sorted({(rnd.randint(1, 60), rnd.randint(1, 60))
                    for _ in range(80) if True})
    edges = [(a, b) for a, b in edges if a != b]
    cut = 40
    old_e = [(a, b) for a, b in edges if a <= cut and b <= cut]
    new_e = [(a, b) for a, b in edges if a > cut or b > cut]
    labels = dedup.connected_components(dc.read_values(
        session=session,
        id_a=[a for a, _ in old_e], id_b=[b for _, b in old_e]).df)
    inc = {(r["id"], r["component"]) for r in
           dedup.connected_components_incremental(
               labels,
               dc.read_values(session=session,
                              id_a=[a for a, _ in new_e],
                              id_b=[b for _, b in new_e]).df).collect()}
    want = {(r["id"], r["component"]) for r in
            dedup.connected_components(dc.read_values(
                session=session,
                id_a=[a for a, _ in edges],
                id_b=[b for _, b in edges]).df).collect()}
    assert inc == want


def test_connected_components_star_algorithm(session):
    """Large-star/small-star must produce identical components to label
    propagation — on chains (worst case for propagation), stars, and a
    deterministic pseudo-random graph."""
    import random

    # long chain + disjoint pair + a star
    pairs = dc.read_values(
        session=session,
        id_a=[1, 2, 3, 4, 5, 6, 7, 50, 60, 60, 60],
        id_b=[2, 3, 4, 5, 6, 7, 8, 51, 61, 62, 63],
    )
    two_hop = {(r["id"], r["component"])
               for r in dedup.connected_components(pairs.df).collect()}
    star = {(r["id"], r["component"])
            for r in dedup.connected_components(pairs.df, algorithm="star").collect()}
    assert star == two_hop
    assert dict(star)[8] == 1  # chain end reaches the chain min

    rng = random.Random(7)
    ra, rb = [], []
    for _ in range(300):
        a, b = rng.randrange(150), rng.randrange(150)
        if a != b:
            ra.append(a), rb.append(b)
    rnd = dc.read_values(session=session, id_a=ra, id_b=rb)
    got1 = {(r["id"], r["component"])
            for r in dedup.connected_components(rnd.df).collect()}
    got2 = {(r["id"], r["component"])
            for r in dedup.connected_components(rnd.df, algorithm="star").collect()}
    assert got1 == got2

    with pytest.raises(ValueError, match="unknown algorithm"):
        dedup.connected_components(pairs.df, algorithm="nope")


def test_connected_components_check_every_amortized(session):
    # a 9-vertex path needs several propagation rounds; answers must be
    # identical whether convergence is scanned every round or every 2-3
    pairs = dc.read_values(
        session=session,
        id_a=[1, 2, 3, 4, 5, 6, 7, 8, 20],
        id_b=[2, 3, 4, 5, 6, 7, 8, 9, 21],
    )
    expected = {r["id"]: r["component"]
                for r in dedup.connected_components(pairs.df).collect()}
    assert expected == {**{i: 1 for i in range(1, 10)}, 20: 20, 21: 20}
    for k in (2, 3):
        got = {r["id"]: r["component"]
               for r in dedup.connected_components(pairs.df, check_every=k).collect()}
        assert got == expected, k


def test_minhash_dedup_exhaustive_keeps_one_per_component(docs):
    out = dedup.minhash_dedup(
        docs.df.filter(F.length("text") > 0), "doc_id", "text",
        exhaustive=True, num_hashes=64, bands=16, jaccard_threshold=0.3,
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    # the fox trio {0,1,2} collapses to exactly its min id
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4, 5} <= set(ids)  # non-dup docs all survive


def test_simhash_near_dup(docs):
    pairs = dedup.simhash_pairs(
        docs.df.filter(F.length("text") > 0), "doc_id", "text",
        max_hamming=8, prefix_bits=2,
    ).collect()
    assert any({p["id_a"], p["id_b"]} <= {0, 1, 2} for p in pairs)


def test_simhash_rotation_tables_recall(session):
    """Multi-rotation blocking (num_tables>1) must be a superset of the
    single-prefix candidates, a subset of brute force (the hamming verify
    filter is unchanged), and recover prefix-bit-flip pairs that a single
    block misses."""
    import random

    rnd = random.Random(11)
    vocab = [f"w{i:03d}" for i in range(300)]
    texts, ids = [], []
    n = 0
    for d in range(40):
        base = [rnd.choice(vocab) for _ in range(30)]
        texts.append(" ".join(base))
        ids.append(n)
        n += 1
        mut = list(base)
        mut[rnd.randrange(30)] = rnd.choice(vocab)  # one-word near-dup
        texts.append(" ".join(mut))
        ids.append(n)
        n += 1
    ch = dc.read_values(session=session, doc_id=ids, text=texts)
    kw = dict(max_hamming=6, num_bits=32, prefix_bits=10)

    def pair_set(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()}

    brute = pair_set(
        dedup.simhash_pairs(ch.df, "doc_id", "text", max_hamming=6,
                            num_bits=32, prefix_bits=0)
    )
    single = pair_set(dedup.simhash_pairs(ch.df, "doc_id", "text", **kw))
    multi = pair_set(
        dedup.simhash_pairs(ch.df, "doc_id", "text", num_tables=4, **kw)
    )
    assert single <= multi <= brute
    # fixed seed: the corpus contains pairs whose differing bits hit the
    # top-10 prefix — rotation tables must recover some of them
    assert len(multi) > len(single)


def test_ngram_jaccard_exact_values(docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs.df.filter(F.length("text") > 0), "doc_id", "text",
        shingle_size=3, threshold=0.2,
    ).collect()
    by_pair = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert by_pair[(0, 2)] == 1.0  # normalized-identical
    assert 0.4 < by_pair[(0, 1)] < 1.0


def test_embedding_near_dup_and_lsh_consistency(session):
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.99, 0.01, 0.0, 0.0],   # near-dup of 0
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    ch = dc.read_values(session=session, vid=[0, 1, 2, 3], emb=vecs)
    brute = dedup.embedding_near_dup_pairs(ch.df, "vid", "emb", threshold=0.95)
    assert [(r["id_a"], r["id_b"]) for r in brute.collect()] == [(0, 1)]
    lsh = dedup.embedding_near_dup_pairs(
        ch.df, "vid", "emb", threshold=0.95, num_planes=2
    )
    assert (0, 1) in [(r["id_a"], r["id_b"]) for r in lsh.collect()]


def test_cosine_topk_self_first(session):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    ch = dc.read_values(session=session, vid=[0, 1, 2], emb=vecs)
    out = similarity.cosine_topk(ch.df, [1.0, 0.0], "emb", k=2, id_cols=["vid"]).collect()
    assert out[0]["vid"] == 0 and abs(out[0]["distance"]) < 1e-12
    assert out[1]["vid"] == 1


def test_ivf_recall_on_probed_cells(session):
    import random

    rnd = random.Random(7)
    vecs = [[rnd.gauss(0, 1) for _ in range(8)] for _ in range(200)]
    ch = dc.read_values(session=session, vid=list(range(200)), emb=vecs)
    cents = similarity.train_centroids_sample(ch.df, "emb", num_cells=4)
    assert len(cents) == 4
    cells = similarity.assign_ivf_cells(ch.df, cents, "emb")
    q = vecs[17]
    exact = [r["vid"] for r in similarity.cosine_topk(ch.df, q, "emb", k=1, id_cols=["vid"]).collect()]
    approx = [r["vid"] for r in similarity.ann_ivf_topk(cells, cents, q, vec_col="emb", k=1, n_probe=4, id_cols=["vid"]).collect()]
    assert exact == approx == [17]  # n_probe=all cells -> exact


def test_cosine_join_topk(session):
    left = dc.read_values(session=session, id=[1], v=[[1.0, 0.0]])
    right = dc.read_values(
        session=session, id=[10, 11, 12], v=[[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]]
    )
    out = similarity.cosine_join_topk(left.df, right.df, "v", "v", k=2).collect()
    assert [r["nid"] for r in out] == [10, 11]


def test_cosine_join_topk_kernel_median_probe(session):
    # r07 advisor: kernel choice uses the MEDIAN probed width — a frame of
    # narrow vectors with one wide outlier must stay on the HOF kernel
    # (and still return correct neighbors either way).
    from datachain_spark.ops.similarity import _ARROW_COSINE_MIN_DIM

    wide = [float(i) for i in range(_ARROW_COSINE_MIN_DIM)]
    left = dc.read_values(session=session, id=[1], v=[[1.0, 0.0]])
    right = dc.read_values(
        session=session,
        id=[10, 11, 12, 13],
        v=[[1.0, 0.0], [0.5, 0.5], [0.0, 1.0], wide],
    )
    out = similarity.cosine_join_topk(left.df, right.df, "v", "v", k=2)
    # mostly-narrow frame -> interpreted HOF path, no pandas UDF in plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert [r["nid"] for r in out.collect()] == [10, 11]


def test_cosine_join_topk_broadcast_guard(session):
    import pytest

    left = dc.read_values(session=session, id=[1], v=[[1.0, 0.0]])
    right = dc.read_values(
        session=session, id=[10, 11, 12], v=[[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]]
    )
    with pytest.raises(ValueError, match="broadcast_threshold"):
        similarity.cosine_join_topk(
            left.df, right.df, "v", "v", k=2, broadcast_threshold=2
        )


def test_cosine_join_topk_lsh_path(session):
    """num_planes>0: no broadcast in the plan (shuffle join on bucket), and
    same-bucket neighbors still surface (identical vectors share a bucket by
    construction)."""
    import random

    rnd = random.Random(3)
    vecs = [[rnd.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    left = dc.read_values(session=session, id=[100], v=[vecs[7]])
    right = dc.read_values(session=session, id=list(range(40)), v=vecs)
    out = similarity.cosine_join_topk(
        left.df, right.df, "v", "v", k=1, num_planes=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "BroadcastExchange" not in plan
    rows = out.collect()
    assert [r["nid"] for r in rows] == [7]  # exact match is always same-bucket


def test_text_metrics(docs):
    out = text.analyze_text(docs.df).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["n_tokens"] == 9
    assert by[6]["n_tokens"] == 0
    assert by[0]["lang_guess"] == "en"
    assert by[4]["lang_guess"] == "de"
    assert by[5]["lang_guess"] == "fr"
    assert by[0]["fingerprint"] == by[2]["fingerprint"]  # normalization
    assert 0 <= by[0]["quality"] <= 1
    assert by[3]["quality"] > by[6]["quality"]


def test_shingles(session):
    ch = dc.read_values(session=session, t=["a b c d"])
    out = ch.mutate(sh=text.shingles("t", n=2)).to_records()[0]["sh"]
    assert out == ["a b", "b c", "c d"]


def test_multimodal_fake_pipeline(session):
    ch = dc.read_values(session=session, id=[1, 2], content=[b"img-one", b"img-two"])
    meta = multimodal.extract_image_meta(ch.df, fake=True).collect()
    assert all(r["image"]["width"] >= 64 for r in meta)
    # determinism
    meta2 = multimodal.extract_image_meta(ch.df, fake=True).collect()
    assert [r["image"] for r in meta] == [r["image"] for r in meta2]
    emb = multimodal.image_embedding_fake(ch.df, dim=8).collect()
    assert all(len(r["img_emb"]) == 8 for r in emb)
    frames = multimodal.sample_video_frames(ch.df, fake=True).collect()
    assert frames and set(f["src_hash"] for f in frames).issubset(
        {__import__("hashlib").sha256(b"img-one").hexdigest(),
         __import__("hashlib").sha256(b"img-two").hexdigest()}
    )


def test_multimodal_real_decode_raises(session):
    ch = dc.read_values(session=session, id=[1], content=[b"x"])
    with pytest.raises(Exception):  # NotImplementedError surfaced through Spark
        multimodal.extract_image_meta(ch.df, fake=False).collect()


def test_portable_md5_hash_matches_hashlib(session):
    """The md5 hash family (_hash64/_seeded_hash64) is the contract three
    oracle query families depend on: value == int(md5(x).hexdigest()[:15], 16)."""
    import hashlib

    df = session.spark.createDataFrame([("hello world",)], "s string")
    got = df.select(
        text._hash64(F.col("s"), "md5").alias("h"),
        text._seeded_hash64(F.col("s"), 7, "md5").alias("hs"),
    ).collect()[0]
    assert got["h"] == int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
    assert got["hs"] == int(hashlib.md5(b"hello world:7").hexdigest()[:15], 16)
    with pytest.raises(ValueError):
        text._hash64(F.col("s"), "sha1")


def test_md5_and_xxhash_minhash_agree_on_duplicates(docs):
    """Both hash families must flag the same obvious near-dup pair (0,1);
    the md5 family is the oracle twin of the production xxhash64 path."""
    for fam in ("xxhash64", "md5"):
        pairs = dedup.minhash_lsh_pairs(
            docs.df, "doc_id", "text",
            num_hashes=16, bands=8, shingle_size=2,
            jaccard_threshold=0.3, hash_fn=fam,
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in got, fam


def test_keyed_chunk_partitions_completely(session):
    """key= sharding: shards are disjoint and complete for both families."""
    ch = dc.read_values(session=session, k=list(range(100)), v=[str(i) for i in range(100)])
    for fam in ("xxhash64", "md5"):
        parts = [ch.chunk(i, 3, key=["k"], hash_fn=fam).df.count() for i in range(3)]
        assert sum(parts) == 100, fam
        assert all(p > 0 for p in parts), fam


def test_segment_dedup_paragraph_mode(session):
    """First occurrence (by id, pos) wins corpus-wide; docs reassemble from
    surviving paragraphs; fully-boilerplate docs come back empty."""
    texts = [
        "intro\n\nshared boilerplate\n\nunique a",
        "shared boilerplate\n\nunique b",
        "unique c",
        "shared boilerplate",
        "intro\n\nintro",  # intra-doc dup: second copy dropped too
    ]
    ch = dc.read_values(session=session, doc_id=list(range(len(texts))), text=texts)
    out = {r["doc_id"]: r["text"] for r in text.segment_dedup(ch.df, "doc_id").collect()}
    assert out[0] == "intro\n\nshared boilerplate\n\nunique a"
    assert out[1] == "unique b"
    assert out[2] == "unique c"
    assert out[3] == ""
    assert out[4] == ""  # both paragraphs already owned by doc 0


def test_normalize_url(session):
    cases = {
        "HTTPS://WWW.Ex.COM:8443/A/B/?utm_source=t&b=2&a=1#f": "https://www.ex.com/A/B?a=1&b=2",
        "http://ex.com/p?fbclid=x": "http://ex.com/p",
        "https://ex.com///": "https://ex.com",
        "not a url": None,
    }
    df = session.spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r["u"]: r["n"] for r in df.select("u", text.normalize_url("u").alias("n")).collect()}
    assert got == cases


def test_decontaminate(session):
    """Docs sharing an n-gram with a probe are dropped; audit mode inverts."""
    corpus = dc.read_values(
        session=session,
        doc_id=[1, 2, 3],
        text=[
            "the quick brown fox jumps",   # contains probe 3-gram
            "completely clean document here",
            "another spotless entry",
        ],
    )
    probes = dc.read_values(session=session, doc_id=[99], text=["quick brown fox"])
    kept = dedup.decontaminate(corpus.df, probes.df, "doc_id", ngram=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    flagged = dedup.decontaminate(
        corpus.df, probes.df, "doc_id", ngram=3, keep_contaminated=True
    )
    assert [r["doc_id"] for r in flagged.collect()] == [1]


def test_decontaminate_bloom(session):
    """Bloom path: corpus-side membership is tested inline against a
    broadcast bitmap — survivors are a subset of the exact path's, equal at
    tight fpp, and the corpus branch never shuffles."""
    corpus = dc.read_values(
        session=session,
        doc_id=list(range(1, 9)),
        text=[
            "the quick brown fox jumps",
            "completely clean document here",
            "another spotless entry",
            "one more fine article",
            "quick brown fox redux",
            "nothing shared at all",
            "plain boring words only",
            "fox quick brown scrambled",  # scrambled: no shared 3-gram
        ],
    )
    probes = dc.read_values(session=session, doc_id=[99], text=["quick brown fox"])

    exact = dedup.decontaminate(corpus.df, probes.df, "doc_id", ngram=3)
    e = sorted(r["doc_id"] for r in exact.collect())
    assert e == [2, 3, 4, 6, 7, 8]

    # tight fpp -> identical to exact on this fixture; determinism across runs
    bloom = dedup.decontaminate(
        corpus.df, probes.df, "doc_id", ngram=3, method="bloom", bloom_fpp=1e-9
    )
    b = sorted(r["doc_id"] for r in bloom.collect())
    assert b == e
    assert sorted(r["doc_id"] for r in bloom.collect()) == b

    # one-sided at any fpp: survivors always a subset of exact's
    loose = dedup.decontaminate(
        corpus.df, probes.df, "doc_id", ngram=3, method="bloom", bloom_fpp=0.05
    )
    assert set(r["doc_id"] for r in loose.collect()) <= set(e)

    # audit mode partitions the corpus
    audit = dedup.decontaminate(
        corpus.df, probes.df, "doc_id", ngram=3, method="bloom",
        bloom_fpp=1e-9, keep_contaminated=True,
    )
    assert sorted(r["doc_id"] for r in audit.collect()) == [1, 5]

    # bloom_expected skips the sizing job and must behave the same
    pre = dedup.decontaminate(
        corpus.df, probes.df, "doc_id", ngram=3, method="bloom",
        bloom_fpp=1e-9, bloom_expected=64,
    )
    assert sorted(r["doc_id"] for r in pre.collect()) == e

    # scale shape: the one-row bitmap reaches the corpus side via a
    # broadcast, not a shuffle
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_bloom_size_codegen_cap():
    """k is capped at 12 so the unrolled membership AND-chain stays inside
    Janino's 64KB method limit (whole-stage codegen); m is re-solved from
    p = (1-e^{-kn/m})^k so the CAPPED filter still meets the requested fpp."""
    import math

    from datachain_spark.ops.dedup import _BLOOM_K_MAX, bloom_size

    # uncapped regime: standard optimum
    m, k = bloom_size(1e-4, 1000)
    assert k == 13 or k <= _BLOOM_K_MAX  # -log2(1e-4)=13.3 -> capped to 12
    assert k <= _BLOOM_K_MAX
    # deeply capped regime: k fixed, m compensates
    m9, k9 = bloom_size(1e-9, 1000)
    assert k9 == _BLOOM_K_MAX
    assert m9 % 64 == 0
    # achieved fpp at (m9, k9) must still meet the requested 1e-9
    achieved = (1.0 - math.exp(-k9 * 1000 / m9)) ** k9
    assert achieved <= 1e-9 * 1.01
    # and m must not be absurdly oversized (within 2x of the exact solve)
    m_exact = -k9 * 1000 / math.log(1.0 - 1e-9 ** (1.0 / k9))
    assert m9 <= m_exact + 64


def test_remove_duplicate_spans(session):
    """Exact-substring span dedup: global first occurrence survives, later
    occurrences (cross-doc AND within-doc) are excised, overlapping
    duplicate windows merge, short/blank/clean docs untouched."""
    df = session.spark.createDataFrame([
        (1, "a b c d e f g h"),            # owns the first occurrences
        (2, "x y a b c d e f z"),          # embedded copy of a..f
        (3, "p q r s t u v w"),            # clean
        (4, "a b c d e f a b c d e f g"),  # self-repeat + cross-doc copy
        (5, ""),                           # blank
        (6, "a b c"),                      # shorter than the span window
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(
        df, "doc_id", span_tokens=4, with_stats=True).collect()}
    assert out[1]["text"] == "a b c d e f g h" and out[1]["n_removed"] == 0
    assert out[2]["text"] == "x y z" and out[2]["n_removed"] == 6
    assert out[3]["n_removed"] == 0
    # every word of doc 4 sits inside SOME repeated 4-gram (incl. 'd e f g'
    # from doc 1) -> fully excised
    assert out[4]["text"] == "" and out[4]["n_removed"] == 13
    assert out[5]["text"] == "" and out[5]["n_words"] == 0
    assert out[6]["text"] == "a b c" and out[6]["n_removed"] == 0

    # without stats: just (id, text); deterministic across runs
    lean = dedup.remove_duplicate_spans(df, "doc_id", span_tokens=4)
    assert set(lean.columns) == {"doc_id", "text"}
    again = {r["doc_id"]: r["text"] for r in lean.collect()}
    assert again == {k: v["text"] for k, v in out.items()}

    # first-occurrence priority follows (id, pos) order: swapping ids flips
    # which doc keeps the span
    df2 = session.spark.createDataFrame(
        [(1, "x y a b c d e f z"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r["text"] for r in dedup.remove_duplicate_spans(
        df2, "doc_id", span_tokens=4).collect()}
    assert out2[1] == "x y a b c d e f z"  # now the first occurrence
    assert out2[2] == "g h"

    with pytest.raises(ValueError):
        dedup.remove_duplicate_spans(df, "doc_id", span_tokens=0)

    # md5 family agrees with the default on exact inputs (no collisions at
    # this size) — the DuckDB-verifiable path is the same algorithm
    md5 = {r["doc_id"]: r["text"] for r in dedup.remove_duplicate_spans(
        df, "doc_id", span_tokens=4, hash_fn="md5").collect()}
    assert md5 == {k: v["text"] for k, v in out.items()}


def test_url_dedup(session):
    """One winner per canonical URL: utm/fragment/case variants collapse;
    best quality wins, ties to the lowest id; unparsable URLs pass through
    by default and can be dropped."""
    df = session.spark.createDataFrame([
        (1, "https://ex.com/a?utm_source=x", 10),
        (2, "https://EX.com/a/", 99),      # same canonical URL, higher q
        (3, "https://ex.com/b", 5),
        (4, "not a url", 1),
    ], "doc_id long, url string, q int")
    kept = sorted(r["doc_id"] for r in text.url_dedup(df, "url", "doc_id", quality_col="q").collect())
    assert kept == [2, 3, 4]
    strict = sorted(r["doc_id"] for r in text.url_dedup(
        df, "url", "doc_id", quality_col="q", keep_null_urls=False).collect())
    assert strict == [2, 3]
    # quality_col omitted: quality_score over text drives the ranking
    df2 = session.spark.createDataFrame([
        (1, "https://ex.com/a", "the quick brown fox jumps over it for the win today"),
        (2, "https://ex.com/a", "zz"),
    ], "doc_id long, url string, text string")
    assert [r["doc_id"] for r in text.url_dedup(df2, "url", "doc_id").collect()] == [1]


def test_contamination_report(session):
    """Per-(doc, probe) overlap audit: shared distinct n-grams, totals and
    fraction; clean docs absent; fraction hand-verified."""
    docs = session.spark.createDataFrame([
        (1, "the quick brown fox jumps high"),   # shares 'the quick brown'... etc
        (2, "totally clean words entirely"),
    ], "doc_id long, text string")
    probes = session.spark.createDataFrame(
        [(9, "quick brown fox")], "doc_id long, text string")
    rep = text.contamination_report(docs, probes, "doc_id", ngram=3).collect()
    assert len(rep) == 1
    r = rep[0]
    # doc 1 has 4 distinct 3-grams; exactly 'quick brown fox' is shared
    assert (r["doc_id"], r["probe_id"], r["n_shared"], r["n_doc_ngrams"]) == (1, 9, 1, 4)
    assert abs(r["frac_shared"] - 0.25) < 1e-12
    # consistency with decontaminate: reported docs == dropped docs
    from datachain_spark.ops import dedup as _dedup
    dropped = {row["doc_id"] for row in _dedup.decontaminate(
        docs, probes, "doc_id", ngram=3, keep_contaminated=True).collect()}
    assert {row["doc_id"] for row in rep} == dropped


def test_corpus_stats(session):
    """Known-value per-group profile; blank docs count 0 words; global
    (ungrouped) form gives one row; approx path returns the same exact
    percentiles at this size (sketch is exact for small n)."""
    df = session.spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", ""), (3, "b", "x y")],
        "doc_id long, g string, text string",
    )
    rows = {r["g"]: r for r in text.corpus_stats(df, group_by=["g"], exact=True).collect()}
    assert rows["a"]["n_docs"] == 2 and rows["a"]["total_words"] == 3
    assert rows["a"]["avg_words"] == 1.5 and rows["a"]["p50_words"] == 1.5
    assert rows["b"]["total_words"] == 2 and rows["b"]["total_chars"] == 3
    glob = text.corpus_stats(df, exact=True).collect()
    assert len(glob) == 1 and glob[0]["n_docs"] == 3
    approx = {r["g"]: r for r in text.corpus_stats(df, group_by=["g"]).collect()}
    assert approx["b"]["p90_words"] == 2.0


def test_repetition_stats_known_values(session):
    ch = dc.read_values(session=session, doc_id=[1], text=["a a a b"])
    r = text.repetition_stats(ch.df, "doc_id").collect()[0]
    assert r["n_words"] == 4
    assert r["top_word_frac"] == 0.75       # "a" 3/4
    assert abs(r["dup_2gram_frac"] - 2 / 3) < 1e-12  # "a a" twice of 3 grams


def test_winnow_pairs_detects_substring_overlap(docs):
    """Docs 0/1/2 share long char runs; doc 3 shares none."""
    pairs = text.winnow_pairs(docs.df, "doc_id", k=8, window=4, min_shared=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p for p in got)


def test_audio_meta_and_clip_similarity(session):
    """Audio fake probe plumbing + CLIP-style pairwise scoring."""
    import hashlib as hl

    ch = dc.read_values(session=session, doc_id=[1, 2], text=["aa", "bb"])
    b = ch.df.selectExpr("doc_id", "encode(text, 'utf-8') AS content")
    meta = {r["doc_id"]: r["audio"] for r in
            multimodal.extract_audio_meta(b, fake=True).collect()}
    h = hl.sha256(b"aa").digest()
    assert meta[1]["sample_rate"] == [8000, 16000, 22050, 44100][h[3] % 4]
    assert meta[1]["channels"] == 1 + h[4] % 2
    with pytest.raises(Exception):
        multimodal.extract_audio_meta(b, fake=False).collect()

    emb = dc.read_values(
        session=session,
        i=[1, 2],
        a=[[1.0, 0.0], [1.0, 0.0]],
        b=[[1.0, 0.0], [0.0, 1.0]],
    )
    scores = {r["i"]: r["clip_score"] for r in
              multimodal.clip_similarity(emb.df, "a", "b").collect()}
    assert scores[1] == 100.0 and abs(scores[2]) < 1e-9


def test_vocabulary_counts_and_doc_freq(session):
    ch = dc.read_values(session=session, text=["a b a", "a c"])
    v = {r["word"]: (r["count"], r["doc_freq"]) for r in
         text.vocabulary(ch.df, "text").collect()}
    assert v == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}


def test_redact_pii_and_stats(session):
    from datachain_spark.ops import text as txt

    rows = dc.read_values(
        session=session,
        doc_id=[0, 1, 2, 3],
        text=[
            "mail me at jane.doe+x@corp.example.com today",
            "SSN 123-45-6789 and card 4111 1111 1111 1111",
            "server at 192.168.10.1, call +1 (555) 123-4567",
            "nothing sensitive here",
        ],
    )
    red = rows.df.select("doc_id", txt.redact_pii("text").alias("t")).collect()
    by_id = {r["doc_id"]: r["t"] for r in red}
    assert by_id[0] == "mail me at <EMAIL> today"
    assert by_id[1] == "SSN <SSN> and card <CC>"
    assert "<IP>" in by_id[2] and "<PHONE>" in by_id[2]
    assert by_id[3] == "nothing sensitive here"

    stats = {r["doc_id"]: r for r in txt.pii_stats(rows.df).collect()}
    assert stats[0]["n_email"] == 1 and stats[0]["n_pii_total"] == 1
    # SSN counted once as SSN, NOT double-counted as phone
    assert stats[1]["n_ssn"] == 1 and stats[1]["n_credit_card"] == 1
    assert stats[1]["n_phone"] == 0 and stats[1]["n_pii_total"] == 2
    assert stats[2]["n_ipv4"] == 1 and stats[2]["n_phone"] == 1
    assert stats[3]["n_pii_total"] == 0

    # kinds subsetting: only email redacted
    only_email = rows.df.select(
        txt.redact_pii("text", kinds=["email"]).alias("t")
    ).collect()
    assert any("<EMAIL>" in r["t"] for r in only_email)
    assert not any("<SSN>" in r["t"] for r in only_email)


def test_redact_pii_zero_shuffle(session):
    from datachain_spark.ops import text as txt
    from datachain_spark.plans import shuffle_count

    rows = dc.read_values(session=session, doc_id=[0], text=["a@b.co"])
    assert shuffle_count(rows.df.select(txt.redact_pii("text"))) == 0
    assert shuffle_count(txt.pii_stats(rows.df)) == 0


def test_url_domain_and_blocklist_filter(session):
    from datachain_spark.ops import text as txt
    from datachain_spark.plans import join_strategies

    rows = dc.read_values(
        session=session,
        doc_id=[0, 1, 2, 3, 4],
        url=[
            "https://Spam.example.COM/page?x=1",
            "https://news.bbc.co.uk/story",
            "http://ok-site.io/a",
            "not a url at all",
            "https://sub.spam.example.com/deep",
        ],
    )
    doms = {r["doc_id"]: r["d"] for r in rows.df.select(
        "doc_id", txt.url_domain("url").alias("d")).collect()}
    assert doms[0] == "spam.example.com" and doms[3] is None
    reg = {r["doc_id"]: r["d"] for r in rows.df.select(
        "doc_id", txt.url_domain("url", registrable=True).alias("d")).collect()}
    assert reg[0] == "example.com" and reg[4] == "example.com"

    kept = txt.filter_by_domain_blocklist(
        rows.df, "url", ["spam.example.com"]
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 4]
    # registrable matching also drops the subdomain row
    kept_reg = txt.filter_by_domain_blocklist(
        rows.df, "url", ["example.com"], registrable=True
    )
    assert sorted(r["doc_id"] for r in kept_reg.collect()) == [1, 2, 3]
    blocked = txt.filter_by_domain_blocklist(
        rows.df, "url", ["spam.example.com"], keep_blocked=True
    )
    assert [r["doc_id"] for r in blocked.collect()] == [0]
    # the join is a broadcast (corpus never shuffles for the blocklist)
    strategies = join_strategies(kept)
    assert strategies and all("Broadcast" in s for s in strategies), strategies


def test_gopher_quality_filter(session):
    from datachain_spark.ops import text as txt

    good = ("the quick brown fox jumps over the lazy dog and then it runs "
            "far away into the deep green forest where it finds food and "
            "water for the long cold night that is coming soon with rain "
            "and wind and the fox is happy to be safe in its warm den now "
            "sleeping until the morning sun rises over the quiet hills")
    rows = dc.read_values(
        session=session,
        doc_id=[0, 1, 2, 3],
        text=[
            good,                                  # passes
            "short text",                          # too few words
            ("spam " * 80).strip(),                # top_word_frac = 1
            "- a\n- b\n- c\n" + good,              # bullet lines but under 0.9 frac? -> compute
        ],
    )
    kept = sorted(
        r["doc_id"]
        for r in txt.gopher_quality_filter(rows.df, "doc_id").collect()
    )
    assert 0 in kept and 1 not in kept and 2 not in kept

    rejected = sorted(
        r["doc_id"]
        for r in txt.gopher_quality_filter(
            rows.df, "doc_id", keep_rejected=True
        ).collect()
    )
    assert set(kept) | set(rejected) == {0, 1, 2, 3}
    assert not set(kept) & set(rejected)

    # thresholds override: impossible min_words rejects everything
    none_kept = txt.gopher_quality_filter(
        rows.df, "doc_id", thresholds={"min_words": 10**6}
    ).collect()
    assert none_kept == []

    # with_signals keeps the audit columns
    sig = txt.gopher_quality_filter(rows.df, "doc_id", with_signals=True)
    assert {"n_words", "top_word_frac", "stopword_hits"} <= set(sig.columns)


def test_redact_pii_idempotent(session):
    """Redaction must be a fixed point: placeholders never re-match any
    pattern, so redact(redact(x)) == redact(x) for arbitrary text."""
    import random
    import string

    rng = random.Random(99)
    corpus = []
    pieces = [
        "a@b.co", "123-45-6789", "192.168.0.1", "+1 555 123 4567",
        "4111 1111 1111 1111", "plain words", "…", "#tag",
    ]
    for _ in range(50):
        n = rng.randrange(1, 8)
        parts = [
            rng.choice(pieces) if rng.random() < 0.5 else
            "".join(rng.choice(string.ascii_letters + string.digits + " .@-")
                    for _ in range(rng.randrange(1, 20)))
            for _ in range(n)
        ]
        corpus.append(" ".join(parts))
    rows = dc.read_values(session=session, i=list(range(len(corpus))), text=corpus)
    once = rows.df.select("i", text.redact_pii("text").alias("t"))
    twice = once.select("i", text.redact_pii("t").alias("t"))
    a = {r["i"]: r["t"] for r in once.collect()}
    b = {r["i"]: r["t"] for r in twice.collect()}
    assert a == b


def test_kmeans_refine_reduces_inertia(session):
    """Lloyd refinement must move sampled centroids toward the true cluster
    means: total assigned cosine distance (inertia) never increases, and on
    well-separated clusters the refined centroids recover them."""
    import random

    rng = random.Random(5)
    base = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    vecs, ids = [], []
    for i in range(90):
        b = base[i % 3]
        vecs.append([x + rng.uniform(-0.05, 0.05) for x in b])
        ids.append(i)
    ch = dc.read_values(session=session, vid=ids, emb=vecs)

    def inertia(cents):
        assigned = similarity.assign_ivf_cells(ch.df, cents, "emb", "c")
        dists = [
            F.struct(similarity.cosine_distance(F.col("emb"), list(c)).alias("d"))
            for c in cents
        ]
        row = assigned.select(
            F.array_min(F.array(*dists))["d"].alias("d")
        ).agg(F.sum("d")).collect()[0]
        return row[0]

    cents0 = similarity.train_centroids_sample(ch.df, "emb", num_cells=3, seed=1)
    i0 = inertia(cents0)
    cents1 = similarity.kmeans_refine(ch.df, cents0, "emb", iters=3)
    i1 = inertia(cents1)
    assert i1 <= i0 + 1e-9
    # each refined centroid should be dominated by one base direction
    tops = sorted(max(range(4), key=lambda d: c[d]) for c in cents1)
    assert len(set(tops)) == 3


def test_chunk_documents(session):
    """Overlap semantics, short docs, chunk coverage invariants, zero
    shuffles in the plan."""
    df = session.spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    out = sorted(
        text.chunk_documents(df, "doc_id", chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in out if r["doc_id"] == 1]
    assert [r["chunk_text"] for r in d1] == ["a b c d", "d e f g", "g h i j"]
    assert [r["n_tokens"] for r in d1] == [4, 4, 4]
    # every consecutive pair shares exactly `overlap` boundary tokens
    for a, b in zip(d1, d1[1:]):
        assert a["chunk_text"].split()[-1:] == b["chunk_text"].split()[:1]
    # concatenation minus overlaps reconstructs the doc
    tokens = d1[0]["chunk_text"].split()
    for r in d1[1:]:
        tokens += r["chunk_text"].split()[1:]
    assert " ".join(tokens) == "a b c d e f g h i j"
    assert [(r["chunk_id"], r["chunk_text"]) for r in out if r["doc_id"] == 2] == [(0, "x y")]
    assert [(r["chunk_id"], r["chunk_text"]) for r in out if r["doc_id"] == 3] == [(0, "solo")]

    with pytest.raises(ValueError):
        text.chunk_documents(df, "doc_id", chunk_tokens=4, overlap=4)

    # zero-shuffle plan: chunking is a per-row projection + explode
    from datachain_spark.plans import shuffle_count

    assert shuffle_count(text.chunk_documents(df, "doc_id")) == 0


def test_chunk_documents_blank_text(session):
    """Blank/whitespace-only docs emit one empty chunk with n_tokens=0 —
    split(trim('')) yields [''] which must not count as 1 token."""
    df = session.spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.chunk_documents(df, "doc_id", chunk_tokens=4).collect()}
    assert len(out) == 3  # no doc vanishes
    assert (out[1]["chunk_text"], out[1]["n_tokens"]) == ("", 0)
    assert (out[2]["chunk_text"], out[2]["n_tokens"]) == ("", 0)
    assert (out[3]["chunk_text"], out[3]["n_tokens"]) == ("one two", 2)


def test_ngram_lm_perplexity(session):
    """In-domain text scores lower perplexity than out-of-domain; unseen
    words of a seen context keep the context count in the denominator."""
    ref = dc.read_values(
        session=session, doc_id=[0, 1],
        text=["the cat sat on the mat", "the dog sat on the rug"],
    )
    lm = text.ngram_lm_train(ref.df, "text", n=2)
    row = {(r["context"], r["word"]): (r["count"], r["context_count"])
           for r in lm.collect()}
    assert row[("the", "cat")] == (1, 4)  # 'the' appears 4x as context
    assert row[("sat", "on")] == (2, 2)

    docs = dc.read_values(
        session=session, doc_id=[1, 2, 3],
        text=["the cat sat on the mat",
              "quantum flux capacitors engage promptly",
              "the zzz sat on the mat"],  # seen contexts, one unseen word
    )
    out = {r["doc_id"]: r for r in
           text.ngram_lm_score(docs.df, lm, "doc_id", "text", n=2).collect()}
    assert out[1]["perplexity"] < out[3]["perplexity"] < out[2]["perplexity"]
    assert out[1]["n_grams"] == 5
    import math
    # V = distinct PREDICTED words in the model: cat,sat,on,the,mat,dog,rug
    V = 7
    # spot-check one exact probability:
    # (sat, on): count 2, context_count 2 -> (2+1)/(2+V)
    one = text.ngram_lm_score(
        dc.read_values(session=session, doc_id=[9], text=["sat on"]).df,
        lm, "doc_id", "text", n=2).collect()[0]
    assert abs(one["avg_logprob"] - math.log(3 / (2 + V))) < 1e-12

    # docs shorter than n tokens are NOT dropped: n_grams=0, null scores
    short = text.ngram_lm_score(
        dc.read_values(session=session, doc_id=[1, 2], text=["word", "two words"]).df,
        lm, "doc_id", "text", n=2)
    rows = {r["doc_id"]: r for r in short.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_grams"] == 0 and rows[1]["avg_logprob"] is None
    assert rows[1]["perplexity"] is None
    assert rows[2]["n_grams"] == 1

    # empty LM + vocab_size=None: smoothing denominator clamps to alpha*1
    # instead of dividing by zero
    empty_lm = text.ngram_lm_train(
        dc.read_values(session=session, doc_id=[0], text=[""]).df.filter(F.col("doc_id") < 0),
        "text", n=2)
    floor = text.ngram_lm_score(
        dc.read_values(session=session, doc_id=[5], text=["a b c"]).df,
        empty_lm, "doc_id", "text", n=2).collect()[0]
    assert floor["avg_logprob"] is not None
    assert abs(floor["avg_logprob"] - math.log(1.0)) < 1e-12  # (0+1)/(0+1*1)


def test_ops_tolerate_empty_corpus(session):
    """Every corpus operator must return an EMPTY result (not crash) on an
    empty input — empty partitions/datasets are routine at the tail of a
    filter chain."""
    empty = dc.read_values(session=session, doc_id=[1], text=["x"]).df.filter(
        F.col("doc_id") < 0
    )
    probes = dc.read_values(session=session, doc_id=[9], text=["quick brown fox"]).df

    assert dedup.exact_dedup(empty, "text", "doc_id").count() == 0
    assert dedup.minhash_lsh_pairs(empty, "doc_id", "text", num_hashes=8, bands=4).count() == 0
    assert dedup.simhash_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.ngram_jaccard_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.decontaminate(empty, probes, "doc_id").count() == 0
    assert dedup.decontaminate(empty, probes, "doc_id", method="bloom").count() == 0
    # empty PROBE side: nothing is contaminated, corpus passes through
    corpus = dc.read_values(session=session, doc_id=[1, 2], text=["a b c", "d e f"]).df
    assert dedup.decontaminate(corpus, empty, "doc_id").count() == 2
    assert dedup.decontaminate(corpus, empty, "doc_id", method="bloom").count() == 2
    assert dedup.connected_components(
        empty.select(F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    ).count() == 0

    assert text.repetition_stats(empty, "doc_id").count() == 0
    assert text.gopher_quality_filter(empty, "doc_id").count() == 0
    assert text.chunk_documents(empty, "doc_id").count() == 0
    assert text.segment_dedup(empty, "doc_id").count() == 0
    lm = text.ngram_lm_train(probes, "text", n=2)
    assert text.ngram_lm_score(empty, lm, "doc_id", n=2).count() == 0
    empty_lm = text.ngram_lm_train(empty, "text", n=2)
    scored = text.ngram_lm_score(corpus, empty_lm, "doc_id", n=2, vocab_size=10)
    assert scored.count() == 2  # all-unseen floor, still scores

    from datachain_spark.ops import packing

    assert packing.pack_sequences(empty.select("doc_id", "text"), max_tokens=64).count() == 0
    assert packing.interleave_datasets(
        {"a": empty.select("doc_id", "text")}, {"a": 2.0}, key=["doc_id"]
    ).count() == 0


# -- dedup_eval (LSH precision/recall audit) --------------------------------
def test_dedup_eval_pairs_statuses(docs):
    """Identical/near-identical docs must surface as hits; the status
    partition must be consistent between the pairs table and the summary."""
    pairs = dedup.dedup_eval_pairs(
        docs.df, "doc_id", "text", shingle_size=2,
        jaccard_threshold=0.5, num_hashes=8, bands=4,
    )
    rows = pairs.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], set()).add((r["id_a"], r["id_b"]))
    # docs 0 and 2 are identical after normalization -> jaccard 1.0, and an
    # identical signature always shares every band bucket -> guaranteed hit
    assert (0, 2) in by_status.get("hit", set())
    for r in rows:
        if r["status"] == "hit":
            assert r["jaccard"] is not None and r["est_jaccard"] is not None
        elif r["status"] == "false_positive":
            assert r["jaccard"] is None and r["est_jaccard"] is not None
        else:
            assert r["status"] == "miss"
            assert r["jaccard"] is not None and r["est_jaccard"] is None

    summary = dedup.dedup_eval(
        docs.df, "doc_id", "text", shingle_size=2,
        jaccard_threshold=0.5, num_hashes=8, bands=4,
    ).collect()[0]
    hits = len(by_status.get("hit", set()))
    fps = len(by_status.get("false_positive", set()))
    misses = len(by_status.get("miss", set()))
    assert summary["n_hits"] == hits
    assert summary["n_candidates"] == hits + fps
    assert summary["n_true"] == hits + misses
    if hits + fps:
        assert abs(summary["precision"] - hits / (hits + fps)) < 1e-12
    if hits + misses:
        assert abs(summary["recall"] - hits / (hits + misses)) < 1e-12
    assert summary["precision"] is None or 0.0 <= summary["precision"] <= 1.0
    assert summary["recall"] is None or 0.0 <= summary["recall"] <= 1.0


def test_dedup_eval_empty_corpus(session):
    """No pairs on either side: counts 0, precision/recall NULL (no 0/0)."""
    df = session.spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    s = dedup.dedup_eval(df, "doc_id", "text", jaccard_threshold=0.99).collect()[0]
    assert s["n_true"] == 0 and s["n_candidates"] == 0 and s["n_hits"] == 0
    assert s["precision"] is None and s["recall"] is None


# -- leakage_safe_split ------------------------------------------------------
def test_leakage_safe_split_invariant(session):
    """The defining property: no near-duplicate pair (and no CHAIN of
    near-dups — components, not just pairs) may straddle the split."""
    base = "the quick brown fox jumps over the lazy dog every single day"
    rows = []
    # 30 clusters of 3 chained near-dups + 60 distinct docs
    did = 0
    for g in range(30):
        for v in range(3):
            rows.append((did, base + f" group{g}" + " tail" * v))
            did += 1
    for i in range(60):
        rows.append((did, f"completely unrelated document number {i} "
                          f"with its own words {i * 7} {i * 13}"))
        did += 1
    df = session.spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.leakage_safe_split(
        df, "doc_id", "text", test_fraction=0.3, shingle_size=2,
        num_hashes=8, bands=4, jaccard_threshold=0.2,
    )
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(split.values()) == {"train", "test"}
    pairs = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", shingle_size=2, num_hashes=8, bands=4,
        jaccard_threshold=0.2,
    ).collect()
    assert pairs  # the clusters must actually produce pairs
    comp = {r["id"]: r["component"] for r in dedup.connected_components(
        session.spark.createDataFrame(
            [(p["id_a"], p["id_b"]) for p in pairs], "id_a long, id_b long"
        )
    ).collect()}
    for p in pairs:
        assert split[p["id_a"]] == split[p["id_b"]], p
    # component-level: all members share one side
    sides = {}
    for did2, c in comp.items():
        sides.setdefault(c, set()).add(split[did2])
    assert all(len(s) == 1 for s in sides.values())
    # rough fraction sanity: size-3 components amplify doc-level variance
    # around the 0.3 component-level target, so the gate stays wide
    frac = sum(1 for v in split.values() if v == "test") / len(split)
    assert 0.05 < frac < 0.75
    with pytest.raises(ValueError):
        dedup.leakage_safe_split(df, "doc_id", "text", test_fraction=1.5)


def test_leakage_safe_split_deterministic(session):
    rows = [(i, f"words {i} alpha beta gamma {i % 5}") for i in range(40)]
    df = session.spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.leakage_safe_split(df, "doc_id", "text", test_fraction=0.25)
    b = dedup.leakage_safe_split(
        df.repartition(7), "doc_id", "text", test_fraction=0.25
    )
    assert sorted(map(tuple, a.select("doc_id", "split").collect())) == sorted(
        map(tuple, b.select("doc_id", "split").collect())
    )


def test_leakage_safe_split_detects_nonconvergence(session):
    """A long near-dup CHAIN (sliding-window texts) whose diameter exceeds
    the round budget must FAIL LOUDLY, not silently straddle; a
    diameter-independent budget succeeds on the same corpus."""
    words = [f"w{i}" for i in range(80)]
    rows = [
        (i, " ".join(words[i * 2:i * 2 + 20])) for i in range(30)
    ]  # doc i overlaps doc i+1 heavily; ends share nothing
    df = session.spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(shingle_size=2, num_hashes=8, bands=8, jaccard_threshold=0.1)
    with pytest.raises(RuntimeError):
        dedup.leakage_safe_split(
            df, "doc_id", "text", test_fraction=0.3, cc_max_iters=1, **kw
        ).collect()
    ok = dedup.leakage_safe_split(
        df, "doc_id", "text", test_fraction=0.3, cc_max_iters=25, **kw
    )
    split = {r["doc_id"]: r["split"] for r in ok.collect()}
    # the whole chain is one component -> one side for all its members
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text", **kw).collect()
    for p in pairs:
        assert split[p["id_a"]] == split[p["id_b"]]


def test_group_centroids_known_means(session):
    df = session.spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [10.0, 0.0]),
         ("b", None)],
        "grp string, embedding array<double>",
    )
    out = {r["grp"]: r for r in
           similarity.group_centroids(df, "grp").collect()}
    assert list(out["a"]["centroid"]) == [2.0, 3.0]
    assert out["a"]["n_vectors"] == 2
    assert list(out["b"]["centroid"]) == [10.0, 0.0]
    assert out["b"]["n_vectors"] == 1  # NULL vector ignored


def test_group_centroids_normalize_and_zero(session):
    df = session.spark.createDataFrame(
        [("u", [3.0, 4.0]), ("z", [1.0, -1.0]), ("z", [-1.0, 1.0])],
        "grp string, embedding array<double>",
    )
    out = {r["grp"]: r for r in
           similarity.group_centroids(df, "grp", normalize=True).collect()}
    assert [round(v, 6) for v in out["u"]["centroid"]] == [0.6, 0.8]
    assert out["z"]["centroid"] is None  # zero-mean group -> NULL, not NaN


def test_group_centroids_ragged_raises(session):
    import pyspark.errors

    df = session.spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [1.0, 2.0, 3.0])],
        "grp string, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged"):
        similarity.group_centroids(df, "grp").collect()


def test_cosine_topk_null_rows_never_top_and_collision(session):
    df = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = similarity.cosine_topk(df, [1.0, 0.0], k=2, id_cols=["vec_id"])
    ids = [r["vec_id"] for r in out.collect()]
    assert ids[0] == 1 and 2 not in ids  # NULL vec sorts last
    assert 4 not in ids                  # zero-norm -> NaN sorts last
    with pytest.raises(ValueError, match="dist_col"):
        similarity.cosine_topk(
            df.withColumnRenamed("vec_id", "distance"), [1.0, 0.0], k=1
        )


def test_assign_ivf_cells_invalid_rows_and_bad_centroid(session):
    df = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, None]), (4, [1.0, 0.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    cells = {r["vec_id"]: r["c"] for r in
             similarity.assign_ivf_cells(
                 df, [[1.0, 0.0], [0.0, 1.0]], cell_col="c").collect()}
    assert cells[1] == 0
    assert cells[2] is None          # NULL vector -> NULL cell, not cell 0
    assert cells[3] is None          # null element
    assert cells[4] is None          # wrong length
    # a zero-norm centroid must never attract everything (-Inf distance)
    cells2 = {r["vec_id"]: r["c"] for r in
              similarity.assign_ivf_cells(
                  df, [[0.0, 0.0], [1.0, 0.0]], cell_col="c").collect()}
    assert cells2[1] == 1


def test_centroid_training_null_safe_and_empty_raises(session):
    df = session.spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = similarity.train_centroids_sample(df, num_cells=2)
    assert len(cents) == 2 and all(c is not None for c in cents)
    with pytest.raises(ValueError, match="empty centroid"):
        similarity.kmeans_refine(df, [])


def test_histogram_ignores_non_finite(session):
    from datachain_spark.ops import sketches

    df = session.spark.createDataFrame(
        [(0.0,), (1.0,), (float("nan"),), (float("inf"),), (2.0,)],
        "x double",
    )
    rows = sketches.histogram(df, "x", bins=2).collect()
    assert [r["count"] for r in rows] == [1, 2]
    assert rows[1]["hi_edge"] == 2.0  # bounds from finite values only


def test_pagerank_checkpoint_every_validation(session):
    from datachain_spark.ops import graph

    e = session.spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="checkpoint_every"):
        graph.pagerank(e, checkpoint_every=0)


def test_group_centroids_empty_vectors_ignored(session):
    df = session.spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", []), ("b", [])],
        "grp string, embedding array<double>",
    )
    out = {r["grp"]: r for r in similarity.group_centroids(df, "grp").collect()}
    assert list(out["a"]["centroid"]) == [1.0, 2.0]
    assert out["a"]["n_vectors"] == 1
    assert "b" not in out  # no usable vectors -> absent, documented


# ------------------------------------------------------- contrastive mining


def test_contrastive_pairs_labels_and_thresholds(spark, sf_dir):
    from datachain_spark.ops.similarity import mine_contrastive_pairs

    e = spark.read.parquet(sf_dir + "/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    out = mine_contrastive_pairs(
        e, "vec_id", "embedding", pos_threshold=0.3, neg_max_sim=0.05,
        num_shards=8,
    ).collect()
    pos = [r for r in out if r["label"] == 1]
    neg = [r for r in out if r["label"] == 0]
    assert pos and neg
    assert all(r["cosine_sim"] >= 0.3 for r in pos)
    assert all(r["cosine_sim"] <= 0.05 for r in neg)
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_contrastive_pairs_deterministic(spark, sf_dir):
    from datachain_spark.ops.similarity import mine_contrastive_pairs

    e = spark.read.parquet(sf_dir + "/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    def key(df):
        return sorted((r["id_a"], r["id_b"], r["label"]) for r in df.collect())
    a = key(mine_contrastive_pairs(e.repartition(3), "vec_id", "embedding",
                                   pos_threshold=0.3, neg_max_sim=0.05))
    b = key(mine_contrastive_pairs(e.repartition(11), "vec_id", "embedding",
                                   pos_threshold=0.3, neg_max_sim=0.05))
    assert a == b


def test_contrastive_pairs_null_vectors_excluded(spark):
    from datachain_spark.ops.similarity import mine_contrastive_pairs
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.99, 0.1]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = mine_contrastive_pairs(
        e, "vec_id", "embedding", pos_threshold=0.9, neg_max_sim=0.3,
        num_shards=2,
    ).collect()
    assert not any(2 in (r["id_a"], r["id_b"]) for r in out)


def test_contrastive_pairs_threshold_validation(spark):
    from datachain_spark.ops.similarity import mine_contrastive_pairs

    e = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        mine_contrastive_pairs(e, "vec_id", "embedding",
                               pos_threshold=0.2, neg_max_sim=0.5)


def test_contrastive_no_single_partition_window(spark, sf_dir):
    """Scale guard: negative sampling windows inside hash shards — the
    plan must not contain an empty-key window partition (the global-sort
    serialization trap)."""
    from datachain_spark.ops.similarity import mine_contrastive_pairs

    e = spark.read.parquet(sf_dir + "/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    plan = mine_contrastive_pairs(
        e, "vec_id", "embedding"
    )._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), "window with empty partition spec"


def test_ann_eval_recall_semantics(session):
    # perfect index (n_probe = all cells) must report recall 1.0 for
    # every query; fewer probes can only lose neighbors, never add
    from datachain_spark.ops.similarity import ann_eval

    import numpy as np
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).tolist()
    corpus = dc.read_values(
        session=session, id=list(range(40)), v=[vecs[i] for i in range(40)]
    ).df
    queries = dc.read_values(
        session=session, id=[100, 101], v=[vecs[40], vecs[41]]
    ).df
    cents = [vecs[50], vecs[51], vecs[52], vecs[53]]

    full = ann_eval(corpus, queries, cents, k=5, n_probe=4,
                    corpus_id="id", query_id="id", vec_col="v")
    rows = {r["qid"]: r for r in full.collect()}
    assert set(rows) == {100, 101}
    assert all(r["recall"] == 1.0 and r["n_exact"] == 5 for r in rows.values())

    part = ann_eval(corpus, queries, cents, k=5, n_probe=1,
                    corpus_id="id", query_id="id", vec_col="v")
    for r in part.collect():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_common"] <= r["n_ann"] <= 5

    import pytest as _pt
    with _pt.raises(ValueError, match="broadcast_threshold"):
        ann_eval(corpus, queries, cents, k=5, corpus_id="id",
                 query_id="id", vec_col="v", broadcast_threshold=10)


def test_novelty_score_semantics(session):
    from pyspark.sql import functions as F

    from datachain_spark.ops.text import ngram_index, novelty_score

    hist = dc.read_values(
        session=session, id=[1],
        text=["the quick brown fox jumps over the lazy dog"],
    ).df
    idx = ngram_index(hist, "text", ngram=3)
    snap = dc.read_values(
        session=session, id=[10, 11, 12],
        text=[
            "the quick brown fox jumps over the lazy dog",  # all seen
            "completely different words entirely here now", # all novel
            "",                                             # no n-grams? whole-doc fallback
        ],
    ).df
    out = {r["id"]: r for r in novelty_score(
        snap, idx, "id", ngram=3).collect()}
    assert out[10]["novelty"] == 0.0
    assert out[11]["novelty"] == 1.0
    # empty doc: shingles() falls back to the whole (empty) string — one
    # "shingle" that the index lacks
    assert out[12]["n_ngrams"] == 1 and out[12]["novelty"] == 1.0

    import pytest as _pt
    with _pt.raises(ValueError, match="ngram"):
        novelty_score(snap, idx, "id", ngram=0)
