"""BM25 retrieval (ops/retrieval), DSIR importance selection (ops/selection)
and the C4 cleaning gate (ops/c4) — known-value checks, edge cases, and the
scale-shape plan assertions."""

import math

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops import c4, retrieval, selection
from datachain_spark.plans import shuffle_count


def _docs(session, rows):
    return session.spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ BM25
def test_bm25_known_values(session):
    docs = _docs(session, [
        (1, "the quick brown fox"),
        (2, "brown bears eat fish"),
        (3, "fox and hound"),
    ])
    out = {r["doc_id"]: r for r in retrieval.bm25_score(docs, "quick fox", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    # hand-computed: N=3, avgdl=11/3; quick: df=1, fox: df=2
    k1, b = 1.2, 0.75
    avgdl = 11 / 3

    def term(tf, df_, dl):
        idf = math.log(1 + (3 - df_ + 0.5) / (df_ + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[1]["score"] - (term(1, 1, 4) + term(1, 2, 4))) < 1e-12
    assert abs(out[3]["score"] - term(1, 2, 3)) < 1e-12
    assert out[2]["score"] == 0.0
    # ranking: doc 1 matches both terms
    top = retrieval.bm25_topk(docs, "quick fox", "doc_id", k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 3]


def test_bm25_scale_shape_and_edges(session):
    docs = _docs(session, [(1, "a b c"), (2, ""), (3, None)])
    scored = retrieval.bm25_score(docs, "a", "doc_id")
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert rows[2]["dl"] == 0 and rows[2]["score"] == 0.0
    assert rows[3]["score"] == 0.0
    # ONE shuffle total (the 1-row stats aggregate); corpus never explodes.
    # Fresh plan: an executed AQE DataFrame's explain prints initial+final
    # plans and double-counts every Exchange.
    assert shuffle_count(retrieval.bm25_score(docs, "a", "doc_id")) == 1
    plan = retrieval.bm25_topk(docs, "a", "doc_id", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        retrieval.bm25_score(docs, "...", "doc_id")


def test_bm25_keep_cols(session):
    docs = _docs(session, [(1, "alpha beta"), (2, "alpha gamma")])
    top = retrieval.bm25_topk(docs, "alpha", "doc_id", k=2, keep_cols=["text"]).collect()
    assert {r["text"] for r in top} == {"alpha beta", "alpha gamma"}
    # duplicate ids must NOT multiply rows past k (keep_cols rides the
    # scoring pass, not a post-limit join), and ordering survives
    dup = _docs(session, [(1, "alpha one"), (1, "alpha two"), (2, "alpha alpha three")])
    top2 = retrieval.bm25_topk(dup, "alpha", "doc_id", k=2, keep_cols=["text"]).collect()
    assert len(top2) == 2
    assert top2[0]["score"] >= top2[1]["score"]


def test_bm25_non_ascii_query_matches_corpus_tokens(session):
    """Java's \\w is ASCII-only, so the corpus side strips accents; the
    driver-side query tokenizer must strip them identically or accented
    terms can never match (scored 0 for every doc before the fix)."""
    docs = _docs(session, [(1, "café résumé standard"), (2, "plain words here")])
    out = {r["doc_id"]: r["score"] for r in
           retrieval.bm25_score(docs, "café", "doc_id").collect()}
    assert out[1] > 0.0 and out[2] == 0.0
    assert retrieval.tokenize_query("café résumé") == ["caf", "rsum"]


# ------------------------------------------------------------------ DSIR
def test_dsir_importance_direction_and_edges(session):
    raw = _docs(session, [
        (1, "stock markets rallied today after earnings"),
        (2, "the cat sat on the mat quietly"),
        (3, ""),
    ])
    target = _docs(session, [
        (10, "markets rallied as stock prices rose on earnings"),
    ])
    w = {r["doc_id"]: r for r in
         selection.dsir_importance(raw, target, "doc_id").collect()}
    # the finance doc shares target features -> strictly higher weight
    assert w[1]["log_weight"] > w[2]["log_weight"]
    # blank doc: no features, weight 0, NOT dropped
    assert w[3]["n_feats"] == 0 and w[3]["log_weight"] == 0.0
    # n_feats = unigrams + bigrams = (2n - 1) for an n-word doc
    assert w[1]["n_feats"] == 11 and w[2]["n_feats"] == 13

    # deterministic across runs and hash families
    again = {r["doc_id"]: r["log_weight"] for r in
             selection.dsir_importance(raw, target, "doc_id").collect()}
    assert again == {k: v["log_weight"] for k, v in w.items()}
    md5 = selection.dsir_importance(raw, target, "doc_id", hash_fn="md5").collect()
    assert {r["doc_id"] for r in md5} == {1, 2, 3}


def test_dsir_select_top_and_gumbel(session):
    raw = _docs(session, [(i, f"stock markets day {i}") for i in range(1, 5)]
                + [(9, "completely unrelated words entirely")])
    target = _docs(session, [(0, "stock markets")])
    # gumbel=False is exactly "top-n by log_weight, id tie-break" — verify
    # against the weights the importance pass itself reports
    weights = selection.dsir_importance(raw, target, "doc_id").collect()
    expected = [r["doc_id"] for r in
                sorted(weights, key=lambda r: (-r["log_weight"], r["doc_id"]))][:4]
    top = [r["doc_id"] for r in
           selection.dsir_select(raw, target, "doc_id", 4, gumbel=False).collect()]
    assert top == expected
    # gumbel path: deterministic given the seed, and a valid permutation
    g1 = [r["doc_id"] for r in selection.dsir_select(raw, target, "doc_id", 3, seed=7).collect()]
    g2 = [r["doc_id"] for r in selection.dsir_select(raw, target, "doc_id", 3, seed=7).collect()]
    assert g1 == g2 and len(set(g1)) == 3


# ------------------------------------------------------------------ C4
def test_c4_line_and_doc_rules(session):
    docs = _docs(session, [
        # 3 good lines + 1 short + 1 unterminated -> kept
        (1, "This is a fine sentence.\nShort.\nAnother good long line here!\n"
            "And a third proper line.\nno terminal punctuation"),
        # curly brace -> dropped even with 3 good lines
        (2, "code { x }\nGood line one here.\nGood line two here.\nGood line three here."),
        # lorem ipsum -> dropped
        (3, "More lorem ipsum filler text.\nSecond proper line here.\nThird proper line here."),
        # only 2 surviving lines -> dropped
        (4, "One good line right here.\nTwo good lines right here.\nbad"),
        # javascript line removed, doc still passes with 3 others
        (5, "Please enable javascript to continue.\nReal content line one here.\n"
            "Real content line two here?\nReal content line three here."),
    ])
    out = {r["doc_id"]: r for r in c4.c4_clean(docs, "doc_id", with_signals=True).collect()}
    assert out[1]["c4_keep"] and out[1]["n_kept_lines"] == 3
    assert "Short." not in out[1]["text"]
    assert not out[2]["c4_keep"] and out[2]["has_brace"]
    assert not out[3]["c4_keep"] and out[3]["has_lorem_ipsum"]
    assert not out[4]["c4_keep"]
    assert out[5]["c4_keep"]
    assert "javascript" not in out[5]["text"]

    # default mode: only keepers, signals dropped
    kept = c4.c4_clean(docs, "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 5]
    assert set(kept.columns) == {"doc_id", "text", "n_lines", "n_kept_lines"}

    # pure projection: zero shuffles
    assert shuffle_count(c4.c4_clean(docs, "doc_id", with_signals=True)) == 0


def test_chain_corpus_ops_fluent_surface(session):
    """The chain-level corpus-op methods delegate to the ops modules and
    compose fluently: gate -> dedup -> span-dedup -> pack in one chain, and
    secondary inputs accept DataChain or DataFrame interchangeably."""
    ch = dc.read_values(
        session=session,
        doc_id=list(range(6)),
        text=[
            "the quick brown fox jumps over the lazy dog and it is fine",
            "the quick brown fox jumps over the lazy dog and it is fine",
            "an entirely different document with plenty of words in it for the gate",
            "short",
            "the quick brown fox jumps over the lazy dog and it is fine today",
            "words words words words words words words words words words",
        ],
    )
    out = ch.exact_dedup(id_col="doc_id")
    assert out.count() == 5  # one exact duplicate dropped
    spanned = out.dedup_spans("doc_id", span_tokens=6)
    assert spanned.count() == 5  # docs survive; covered words excised
    probes = ch.filter(dc.C("doc_id") == 2)
    kept = ch.decontaminate(probes, "doc_id", ngram=3)
    assert 2 not in {r["doc_id"] for r in kept.df.select("doc_id").collect()}
    # DataFrame secondary input works identically
    kept2 = ch.decontaminate(probes.df, "doc_id", ngram=3)
    assert kept.count() == kept2.count()
    top = ch.bm25_topk("quick fox", "doc_id", k=2)
    assert len(top.to_records()) == 2
    packed = ch.pack_sequences(max_tokens=32, num_shards=2)
    assert {"shard", "n_tokens"} <= set(packed.df.columns)


def test_c4_min_words_parameter(session):
    docs = _docs(session, [(1, "One two three four five six.\nTiny line.")])
    strict = c4.c4_clean(docs, "doc_id", min_words_per_line=5,
                         min_kept_lines=1, with_signals=True).collect()[0]
    assert strict["n_kept_lines"] == 1


def test_new_ops_validate_inputs(session):
    docs = _docs(session, [(1, "a b")])
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4.c4_clean(docs, "doc_id", min_words_per_line=0)
    with pytest.raises(ValueError, match="min_kept_lines"):
        c4.c4_clean(docs, "doc_id", min_kept_lines=0)
    with pytest.raises(ValueError, match="num_buckets"):
        selection.dsir_importance(docs, docs, "doc_id", num_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        selection.dsir_importance(docs, docs, "doc_id", alpha=0)


# ---------------------------------------------------------------- token budget


def test_select_token_budget_greedy_prefix(session):
    # scores rank docs d3 > d1 > d4 > d2; token counts 3/2/4/5
    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3, 4],
        text=["a b", "a b c d e", "a b c", "a b c d"],
        score=[0.8, 0.2, 0.9, 0.5],
    ).df
    from datachain_spark.ops.selection import select_token_budget

    out = select_token_budget(df, 9, "score", "doc_id").orderBy("doc_id")
    rows = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    # d3 (3) -> cum 3, d1 (2) -> cum 5, d4 (4) -> cum 9, d2 would hit 14 > 9
    assert rows == {3: 3, 1: 5, 4: 9}
    # budget below the best doc keeps nothing; huge budget keeps all
    assert select_token_budget(df, 2, "score", "doc_id").count() == 0
    assert select_token_budget(df, 1000, "score", "doc_id").count() == 4


def test_select_token_budget_token_col_and_ties(session):
    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3],
        n_tok=[10, 10, 10],
        score=[1.0, 1.0, 1.0],  # all tied: id breaks ties -> 1, 2 kept
    ).df
    from datachain_spark.ops.selection import select_token_budget

    out = select_token_budget(df, 20, "score", "doc_id", token_col="n_tok")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_select_token_budget_matches_single_partition(session):
    # the distributed two-pass prefix sum must equal the naive Python cumsum
    # regardless of num_ranges
    import random

    rng = random.Random(3)
    ids = list(range(200))
    toks = [rng.randrange(1, 50) for _ in ids]
    scores = [rng.random() for _ in ids]
    df = dc.read_values(
        session=session, doc_id=ids, n_tok=toks, score=scores
    ).df
    order = sorted(ids, key=lambda i: (-scores[i], i))
    cum, expect = 0, {}
    for i in order:
        cum += toks[i]
        if cum <= 800:
            expect[i] = cum
    from datachain_spark.ops.selection import select_token_budget

    for nr in (1, 4, 16):
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in select_token_budget(
                df, 800, "score", "doc_id", token_col="n_tok", num_ranges=nr
            ).collect()
        }
        assert got == expect, nr


def test_select_token_budget_fluent_and_empty(session):
    ch = dc.read_values(session=session, doc_id=[1], text=["x y z"], score=[1.0])
    out = ch.select_token_budget(2, "score", "doc_id")
    assert out.df.count() == 0
    empty = ch.filter(dc.C("doc_id") > 5)
    assert empty.select_token_budget(100, "score", "doc_id").df.count() == 0


# ------------------------------------------------------------- per-group caps


def test_cap_per_group_rows_and_tokens(session):
    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3, 4, 5, 6],
        domain=["a.com"] * 4 + ["b.com"] * 2,
        n_tok=[10, 10, 10, 10, 10, 10],
        score=[0.9, 0.8, 0.7, 0.6, 0.5, 0.4],
    ).df
    from datachain_spark.ops.selection import cap_per_group

    # row cap: best 2 per domain
    out = cap_per_group(df, "domain", "doc_id", max_rows=2, score_col="score")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 5, 6]
    # token cap: 25 tokens per domain = 2 docs of 10 fit, 3rd would hit 30
    out = cap_per_group(
        df, "domain", "doc_id", token_budget=25, score_col="score", token_col="n_tok"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 5, 6]
    # both caps: rows tighter than tokens
    out = cap_per_group(
        df, "domain", "doc_id", max_rows=1, token_budget=1000,
        score_col="score", token_col="n_tok",
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]
    # no score: id order decides
    out = cap_per_group(df, "domain", "doc_id", max_rows=3)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 5, 6]
    with pytest.raises(ValueError, match="max_rows"):
        cap_per_group(df, "domain", "doc_id")
    # schema passes through unchanged
    assert out.columns == df.columns


def test_cap_per_group_composes_with_token_budget(session):
    # cap domains, then cut the global budget — the FineWeb-style recipe
    df = dc.read_values(
        session=session,
        doc_id=list(range(10)),
        domain=["spam.com"] * 7 + ["ok.org"] * 3,
        n_tok=[5] * 10,
        score=[1.0] * 7 + [0.9] * 3,
    ).df
    from datachain_spark.ops.selection import cap_per_group, select_token_budget

    capped = cap_per_group(
        df, "domain", "doc_id", max_rows=3, score_col="score", token_col="n_tok"
    )
    out = select_token_budget(
        capped, 25, "score", "doc_id", token_col="n_tok"
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # 3 spam docs (0,1,2) + first 2 ok docs (7,8) fill the 25-token budget
    assert got == [0, 1, 2, 7, 8]


# ------------------------------------------------------- perplexity buckets


def test_perplexity_buckets_per_group(session):
    from datachain_spark.ops.text import perplexity_buckets

    df = dc.read_values(
        session=session,
        doc_id=list(range(6)),
        lang=["en", "en", "en", "de", "de", "de"],
        ppl=[10.0, 20.0, 30.0, 100.0, 200.0, 300.0],
    ).df
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(df, "ppl", by="lang").collect()}
    # per-language thirds: each language splits into head/middle/tail
    assert out == {0: "head", 1: "middle", 2: "tail",
                   3: "head", 4: "middle", 5: "tail"}
    # global bucketing ignores language: de docs dominate the tail
    g = {r["doc_id"]: r["ppl_bucket"]
         for r in perplexity_buckets(df, "ppl").collect()}
    assert g[0] == "head" and g[5] == "tail"


def test_perplexity_buckets_nulls_to_tail(session):
    from datachain_spark.ops.text import perplexity_buckets

    df = dc.read_values(
        session=session, doc_id=[1, 2, 3], ppl=[1.0, 2.0, None]
    ).df
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(df, "ppl").collect()}
    assert out[3] == "tail"


# --------------------------------------------------------------- TF-IDF keywords


def test_tfidf_keywords_known_values(session):
    import math

    # "spark" appears only in group A docs, "data" everywhere
    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3, 4],
        grp=["A", "A", "B", "B"],
        text=[
            "spark data engine",
            "spark data",
            "cooking data recipes",
            "cooking data",
        ],
    ).df
    out = retrieval.tfidf_keywords(df, "doc_id", by="grp", k=3, min_df=1)
    rows = {(r["grp"], r["word"]): (r["tf"], r["df"], r["score"], r["rank"])
            for r in out.collect()}
    # df("spark")=2 of N=4 -> idf ln(2); tf in A = 2
    tf, dfq, score, rank = rows[("A", "spark")]
    assert (tf, dfq) == (2, 2) and abs(score - 2 * math.log(2.0)) < 1e-12
    # "engine" ties exactly (1·ln(4) == 2·ln(2)) and wins alphabetically
    assert rows[("A", "engine")][3] == 1 and rank == 2
    # "data" is in all 4 docs -> idf ln(1) = 0
    assert rows[("A", "data")][2] == 0.0
    # B's top keyword is cooking (tf 2, df 2)
    assert rows[("B", "cooking")][3] == 1


def test_tfidf_keywords_global_and_filters(session):
    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3],
        text=["alpha beta", "alpha gamma", ""],  # blank doc: no terms, counts in N
    ).df
    out = retrieval.tfidf_keywords(df, "doc_id", k=5, min_df=2)
    rows = [r.asDict() for r in out.collect()]
    # only "alpha" survives min_df=2; N=3 so score = 2*ln(3/2)
    assert [r["word"] for r in rows] == ["alpha"]
    assert rows[0]["rank"] == 1 and rows[0]["df"] == 2
    # k caps the output per group
    out = retrieval.tfidf_keywords(df, "doc_id", k=1, min_df=1)
    assert out.count() == 1
    # fluent surface
    ch = dc.DataChain(df).tfidf_keywords("doc_id", k=3, min_df=1)
    assert ch.count() == 3


def test_budget_ops_null_tokens_count_zero(session):
    # NULL token counts are documented to cost nothing
    from datachain_spark.ops.selection import cap_per_group, select_token_budget

    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3],
        grp=["g", "g", "g"],
        n_tok=[10, None, 10],
        score=[0.9, 0.8, 0.7],
    ).df
    out = select_token_budget(df, 20, "score", "doc_id", token_col="n_tok")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]
    out = cap_per_group(
        df, "grp", "doc_id", token_budget=20, score_col="score", token_col="n_tok"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]


def test_perplexity_buckets_null_group_key(session):
    # a NULL group key is a real group: its rows get that group's
    # thresholds, not a blanket 'tail'
    from datachain_spark.ops.text import perplexity_buckets

    df = dc.read_values(
        session=session,
        doc_id=[1, 2, 3, 4, 5, 6],
        lang=[None, None, None, "en", "en", "en"],
        ppl=[1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
    ).df
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(df, "ppl", by="lang").collect()}
    assert out == {1: "head", 2: "middle", 3: "tail",
                   4: "head", 5: "middle", 6: "tail"}
