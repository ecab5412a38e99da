"""Differential property tests: hypothesis-generated tables run through the
chain API vs DuckDB running equivalent SQL on the SAME data. Complements
tests/test_oracle.py (fixed queries, fixed testdata) with randomized inputs —
null keys, duplicate rows, empty partitions, negative values — the places
where join/group/dedup semantics diverge between engines if anything is
subtly wrong (reference's test strategy: SURVEY.md §5 functional tests over
tmp datasets).

DuckDB sees the data via a registered pandas frame; Spark via read_pandas.
Comparison reuses the driver-faithful dtype-strict harness (oracle_harness).
"""

import os
import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from datachain_spark import C, func

from .oracle_harness import compare_frames

# small-but-nasty value domains: duplicates likely, nulls common
keys = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
vals = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
tags = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

rows = st.lists(st.tuples(keys, vals, tags), min_size=0, max_size=12)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pdf(data):
    # anchor row: keeps every frame non-empty with at least one non-null per
    # column (empty / all-null object columns are un-inferable for Spark and
    # get arbitrary dtypes from DuckDB — not behaviors under test)
    data = list(data) + [(0, 0, "z")]
    return pd.DataFrame(data, columns=["k", "v", "t"]).astype(
        {"k": "Int64", "v": "Int64", "t": "object"}
    )


def _duck(sql, **frames):
    con = duckdb.connect()
    for name, f in frames.items():
        con.register(name, f)
    out = con.execute(sql).df()
    con.close()
    return out


def _check(ch, sql, **frames):
    spark_pd = ch.df.toPandas()
    duck_pd = _duck(sql, **frames)
    ok, detail = compare_frames(spark_pd, duck_pd)
    assert ok, detail


@given(data=rows)
@SETTINGS
def test_filter_mutate_order(session, data):
    f = _pdf(data)
    ch = (
        dc.read_pandas(f, session=session)
        .filter(C.v > 0)
        .mutate(w=C.v * 2 + 1)
        .order_by("k", "v", "t")
        .select("k", "v", "t", "w")
    )
    _check(
        ch,
        """SELECT k, v, t, v * 2 + 1 AS w FROM f WHERE v > 0
           ORDER BY k NULLS FIRST, v NULLS FIRST, t NULLS FIRST""",
        f=f,
    )


@given(data=rows)
@SETTINGS
def test_group_by_null_keys(session, data):
    # SQL GROUP BY treats NULL as a real group in both engines — and so must
    # the chain. sum over all-null groups is NULL, count() counts rows,
    # count(v) skips nulls.
    f = _pdf(data)
    ch = (
        dc.read_pandas(f, session=session)
        .group_by(
            partition_by=["k"],
            n=func.count(),
            nv=func.count(C.v),
            s=func.sum(C.v),
            lo=func.min(C.v),
            hi=func.max(C.v),
        )
        .order_by("k")
    )
    _check(
        ch,
        """SELECT k, count(*) AS n, count(v) AS nv,
                  CAST(sum(v) AS BIGINT) AS s, min(v) AS lo, max(v) AS hi
           FROM f GROUP BY k ORDER BY k NULLS FIRST""",
        f=f,
    )


@given(left=rows, right=rows)
@SETTINGS
def test_merge_inner_null_safe(session, left, right):
    # default merge key equality is null-safe (<=>): NULL keys MATCH, like
    # the reference's merge — DuckDB expresses it as IS NOT DISTINCT FROM
    lf, rf = _pdf(left), _pdf(right).rename(columns={"k": "rk", "v": "rv", "t": "rt"})
    lch = dc.read_pandas(lf, session=session)
    rch = dc.read_pandas(rf, session=session)
    ch = (
        lch.merge(rch, on="k", right_on="rk", inner=True)
        .select("k", "v", "t", "rv", "rt")
        .order_by("k", "v", "t", "rv", "rt")
    )
    _check(
        ch,
        """SELECT k, v, t, rv, rt FROM lf JOIN rf ON k IS NOT DISTINCT FROM rk
           ORDER BY k NULLS FIRST, v NULLS FIRST, t NULLS FIRST,
                    rv NULLS FIRST, rt NULLS FIRST""",
        lf=lf,
        rf=rf,
    )


@given(left=rows, right=rows)
@SETTINGS
def test_subtract_is_null_safe_anti_join(session, left, right):
    # subtract keeps left rows whose key appears nowhere on the right,
    # NULL-safely (a NULL left key is removed when the right has a NULL key)
    lf, rf = _pdf(left), _pdf(right).rename(columns={"k": "rk", "v": "rv", "t": "rt"})
    lch = dc.read_pandas(lf, session=session)
    rch = dc.read_pandas(rf, session=session)
    ch = lch.subtract(rch, on=["k"], right_on=["rk"]).order_by("k", "v", "t")
    _check(
        ch,
        """SELECT k, v, t FROM lf WHERE NOT EXISTS
             (SELECT 1 FROM rf WHERE rk IS NOT DISTINCT FROM k)
           ORDER BY k NULLS FIRST, v NULLS FIRST, t NULLS FIRST""",
        lf=lf,
        rf=rf,
    )


@given(left=rows, right=rows)
@SETTINGS
def test_union_distinct(session, left, right):
    # union is ALL (reference semantics); stacking distinct() on top must
    # equal SQL UNION (set semantics, nulls compare equal for dedup)
    lf, rf = _pdf(left), _pdf(right)
    lch = dc.read_pandas(lf, session=session)
    rch = dc.read_pandas(rf, session=session)
    ch = lch.union(rch).distinct().order_by("k", "v", "t")
    _check(
        ch,
        """SELECT k, v, t FROM lf UNION SELECT k, v, t FROM rf
           ORDER BY k NULLS FIRST, v NULLS FIRST, t NULLS FIRST""",
        lf=lf,
        rf=rf,
    )


@given(data=rows)
@SETTINGS
def test_window_rank_over_groups(session, data):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    f = _pdf(data)
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc_nulls_first(), F.col("t").asc_nulls_first()
    )
    ch = (
        dc.read_pandas(f, session=session)
        .mutate(rn=F.row_number().over(w).cast("long"))
        .order_by("k", "rn")
    )
    _check(
        ch,
        """SELECT k, v, t,
                  row_number() OVER (PARTITION BY k
                                     ORDER BY v NULLS FIRST, t NULLS FIRST) AS rn
           FROM f ORDER BY k NULLS FIRST, rn""",
        f=f,
    )


@pytest.mark.parametrize("how", ["left", "full"])
def test_outer_merge_fixed_nulls(session, how):
    # deterministic spot-check of outer-join null fill on both sides
    lf = _pdf([(1, 10, "a"), (None, 20, "b"), (2, 30, None)])
    rf = _pdf([(1, 100, "x"), (None, 200, "y"), (3, 300, "z")]).rename(
        columns={"k": "rk", "v": "rv", "t": "rt"}
    )
    lch = dc.read_pandas(lf, session=session)
    rch = dc.read_pandas(rf, session=session)
    ch = (
        lch.merge(rch, on="k", right_on="rk", full=(how == "full"))
        .select("k", "v", "t", "rv", "rt")
        .order_by("k", "v", "rv")
    )
    join_kw = "LEFT OUTER JOIN" if how == "left" else "FULL OUTER JOIN"
    _check(
        ch,
        f"""SELECT k, v, t, rv, rt FROM lf {join_kw} rf
            ON k IS NOT DISTINCT FROM rk
            ORDER BY k NULLS FIRST, v NULLS FIRST, rv NULLS FIRST""",
        lf=lf,
        rf=rf,
    )


# -- bloom decontamination one-sidedness (ops/dedup) -----------------------

_words = st.sampled_from(
    ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
)
_doc = st.lists(_words, min_size=1, max_size=8).map(" ".join)


@given(
    corpus=st.lists(_doc, min_size=1, max_size=8),
    probes=st.lists(_doc, min_size=1, max_size=3),
)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_decontaminate_one_sided(session, corpus, probes):
    """For ANY corpus/probe mix: bloom survivors ⊆ exact survivors (false
    positives only ever over-drop), audit mode partitions the corpus, and
    at tight fpp the two paths agree."""
    from datachain_spark.ops import dedup as _dedup

    cdf = dc.read_values(
        session=session, doc_id=list(range(len(corpus))), text=corpus
    ).df
    pdf_ = dc.read_values(
        session=session, doc_id=list(range(len(probes))), text=probes
    ).df
    exact = {
        r["doc_id"]
        for r in _dedup.decontaminate(cdf, pdf_, "doc_id", ngram=2).collect()
    }
    bloom = {
        r["doc_id"]
        for r in _dedup.decontaminate(
            cdf, pdf_, "doc_id", ngram=2, method="bloom", bloom_fpp=1e-9
        ).collect()
    }
    assert bloom <= exact
    assert bloom == exact  # fpp=1e-9 on <=24 n-grams: FP probability ~0
    audit = {
        r["doc_id"]
        for r in _dedup.decontaminate(
            cdf, pdf_, "doc_id", ngram=2, method="bloom",
            bloom_fpp=1e-9, keep_contaminated=True,
        ).collect()
    }
    assert audit | bloom == set(range(len(corpus))) and not (audit & bloom)


# -- chunk_documents coverage/reconstruction (ops/text) --------------------

_chunk_doc = st.lists(
    st.sampled_from(["tok", "a", "bb", "ccc", "dddd"]), min_size=1, max_size=30
).map(" ".join)


@given(
    docs=st.lists(_chunk_doc, min_size=1, max_size=5),
    chunk_tokens=st.integers(min_value=2, max_value=8),
    overlap=st.integers(min_value=0, max_value=3),
)
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_documents_reconstructs(session, docs, chunk_tokens, overlap):
    """For ANY doc and (chunk_tokens, overlap): dropping each chunk's first
    `overlap` tokens (after chunk 0) and concatenating reconstructs the
    doc exactly; token counts match; chunk ids are dense from 0."""
    from datachain_spark.ops import text as _t

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    cdf = dc.read_values(
        session=session, doc_id=list(range(len(docs))), text=docs
    ).df
    rows = _t.chunk_documents(
        cdf, "doc_id", chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, text_ in enumerate(docs):
        chunks = sorted(by_doc[d], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        toks = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            toks += c["chunk_text"].split()[overlap:]
        assert toks == text_.split(), (d, chunk_tokens, overlap)
        assert all(c["n_tokens"] == len(c["chunk_text"].split()) for c in chunks)


# -- BM25 vs a pure-Python reference implementation (ops/retrieval) --------

@given(
    docs=st.lists(_doc, min_size=1, max_size=8),
    query=st.lists(_words, min_size=1, max_size=3).map(" ".join),
)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_matches_python_reference(session, docs, query):
    """For ANY corpus/query: the Spark BM25 scores equal a from-scratch
    Python Okapi implementation (same formula, same tokenizer) to 1e-9."""
    import math

    from datachain_spark.ops import retrieval as _r

    k1, b = 1.2, 0.75
    toks = [d.split() for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    terms = _r.tokenize_query(query)

    def py_score(i):
        s = 0.0
        for t in terms:
            tf = toks[i].count(t)
            df_ = sum(1 for tt in toks if t in tt)
            idf = math.log(1 + (N - df_ + 0.5) / (df_ + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        return s

    cdf = dc.read_values(
        session=session, doc_id=list(range(N)), text=docs
    ).df
    got = {r["doc_id"]: r["score"] for r in
           _r.bm25_score(cdf, query, "doc_id", k1=k1, b=b).collect()}
    assert set(got) == set(range(N))
    for i in range(N):
        assert abs(got[i] - py_score(i)) < 1e-9, (i, docs[i], query)


# -- DSIR weights vs a pure-Python reference (ops/selection, md5 family) ---

@given(
    raw=st.lists(_doc, min_size=1, max_size=6),
    target=st.lists(_doc, min_size=1, max_size=4),
)
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsir_matches_python_reference(session, raw, target):
    """For ANY raw/target mix: per-doc log weights equal a from-scratch
    Python replica of the hashed-ngram importance recipe (md5 family)."""
    import hashlib
    import math
    from collections import Counter

    from datachain_spark.ops import selection as _s
    from datachain_spark.ops.selection import _DSIR_SEED

    B, alpha = 64, 1.0

    def bucket(g):
        h = int(hashlib.md5(f"{g}:{_DSIR_SEED}".encode()).hexdigest()[:15], 16)
        return h % B

    def feats(doc):
        ws = doc.split()
        return ws + [" ".join(p) for p in zip(ws, ws[1:])]

    raw_b = [ [bucket(g) for g in feats(d)] for d in raw ]
    tgt_b = [ bucket(g) for d in target for g in feats(d) ]
    cr = Counter(b for bs in raw_b for b in bs)
    ct = Counter(tgt_b)
    nr, nt = sum(cr.values()), len(tgt_b)

    def py_weight(i):
        return sum(
            math.log((ct[b] + alpha) / (nt + alpha * B))
            - math.log((cr[b] + alpha) / (nr + alpha * B))
            for b in raw_b[i]
        )

    rdf = dc.read_values(session=session, doc_id=list(range(len(raw))), text=raw).df
    tdf = dc.read_values(session=session, doc_id=list(range(len(target))), text=target).df
    got = {r["doc_id"]: r for r in _s.dsir_importance(
        rdf, tdf, "doc_id", num_buckets=B, alpha=alpha, hash_fn="md5"
    ).collect()}
    for i in range(len(raw)):
        assert got[i]["n_feats"] == len(raw_b[i])
        assert abs(got[i]["log_weight"] - py_weight(i)) < 1e-9, (i, raw[i])


# -- C4 gate invariants (ops/c4) -------------------------------------------

_line = st.lists(_words, min_size=1, max_size=6).map(" ".join)
_c4doc = st.lists(
    st.tuples(_line, st.sampled_from([".", "!", "?", "", " {"])),
    min_size=1, max_size=6,
).map(lambda ls: "\n".join(t + p for t, p in ls))


@given(docs=st.lists(_c4doc, min_size=1, max_size=6))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_c4_clean_invariants(session, docs):
    """For ANY doc set: kept lines are a subset of the original lines in
    original order, counts are consistent, the gate verdict matches its
    recomputation from the signals, and no doc vanishes in signal mode."""
    from datachain_spark.ops import c4 as _c4

    cdf = dc.read_values(
        session=session, doc_id=list(range(len(docs))), text=docs
    ).df
    out = {r["doc_id"]: r for r in
           _c4.c4_clean(cdf, "doc_id", min_words_per_line=2,
                        min_kept_lines=2, with_signals=True).collect()}
    assert set(out) == set(range(len(docs)))
    for i, doc in enumerate(docs):
        r = out[i]
        orig_lines = [l for l in doc.split("\n") if l.strip()]
        kept_lines = [l for l in r["text"].split("\n") if l != ""]
        # subset + order preserved
        it = iter(orig_lines)
        assert all(any(k == o for o in it) for k in kept_lines), (kept_lines, orig_lines)
        assert r["n_lines"] == len(orig_lines)
        assert r["n_kept_lines"] == len(kept_lines)
        expected_keep = (
            r["n_kept_lines"] >= 2
            and not r["has_lorem_ipsum"]
            and not r["has_brace"]
        )
        assert r["c4_keep"] == expected_keep
        for k in kept_lines:
            assert k.rstrip()[-1:] in ".!?\"'”" and len(k.split()) >= 2


# -- span dedup vs a pure-Python reference (ops/dedup) ---------------------

@given(
    docs=st.lists(st.lists(_words, min_size=0, max_size=10).map(" ".join),
                  min_size=1, max_size=6),
    L=st.integers(min_value=2, max_value=4),
)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spans_dedup_matches_python_reference(session, docs, L):
    """For ANY corpus: surviving words equal a from-scratch Python replica
    of the span-dedup recipe (first-occurrence L-gram cover, positions
    ordered by (id, pos))."""
    from datachain_spark.ops import dedup as _dedup

    toks = [d.split() for d in docs]
    first = {}
    covered = [set() for _ in docs]
    for i, ws in enumerate(toks):
        for p in range(len(ws) - L + 1):
            g = tuple(ws[p:p + L])
            if g in first:
                covered[i].update(range(p, p + L))
            else:
                first[g] = (i, p)
    expected = {
        i: " ".join(w for p, w in enumerate(ws) if p not in covered[i])
        for i, ws in enumerate(toks)
    }

    cdf = dc.read_values(
        session=session, doc_id=list(range(len(docs))), text=docs
    ).df
    got = {r["doc_id"]: r for r in _dedup.remove_duplicate_spans(
        cdf, "doc_id", span_tokens=L, with_stats=True).collect()}
    assert set(got) == set(range(len(docs)))
    for i in range(len(docs)):
        assert got[i]["text"] == expected[i], (i, docs, L)
        assert got[i]["n_removed"] == len(covered[i])


# -- asof join vs DuckDB's native ASOF JOIN (ops/asof) ---------------------

_ts = st.integers(min_value=0, max_value=20)


@given(
    left=st.lists(st.tuples(st.integers(0, 2), _ts, vals), min_size=1, max_size=10),
    right=st.lists(st.tuples(st.integers(0, 2), _ts, vals), min_size=1, max_size=10),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_duckdb_native(session, left, right):
    """For ANY keyed event sets: backward as-of attach equals DuckDB's
    native ASOF JOIN (most recent right at-or-before, per key)."""
    from datachain_spark.ops.asof import asof_join

    # dedupe (key, ts) on the right: at equal timestamps the winner among
    # duplicate right rows is engine-implementation-defined in both systems
    seen, r_uniq = set(), []
    for k, t, v in right:
        if (k, t) not in seen:
            seen.add((k, t))
            r_uniq.append((k, t, v))

    ldf = session.spark.createDataFrame(left, "k int, ts int, lv int")
    rdf = session.spark.createDataFrame(r_uniq, "k int, ts int, rv int")
    def _key(t):
        return tuple((x is None, 0 if x is None else x) for x in t)

    got = sorted(
        ((r["k"], r["ts"], r["lv"], r["rv"])
         for r in asof_join(ldf, rdf, on="k", left_ts="ts").collect()),
        key=_key,
    )

    lpd = pd.DataFrame(left, columns=["k", "ts", "lv"])
    rpd = pd.DataFrame(r_uniq, columns=["k", "ts", "rv"])
    duck = _duck(
        """
        SELECT l.k, l.ts, l.lv, r.rv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        """,
        l=lpd, r=rpd,
    )
    exp = sorted(
        ((int(r.k), int(r.ts), int(r.lv) if pd.notna(r.lv) else None,
          int(r.rv) if pd.notna(r.rv) else None)
         for r in duck.itertuples()),
        key=_key,
    )
    assert got == exp


# -- PQ ADC vs a pure-Python reference (ops/pq) ----------------------------

@given(
    data=st.lists(
        st.lists(st.integers(-5, 5).map(float), min_size=4, max_size=4),
        min_size=3, max_size=8,
    ),
)
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pq_encode_adc_matches_python_reference(session, data):
    """For ANY small vector set: codes equal a from-scratch Python argmin
    (ties to the lowest code) and ADC distances equal the Python lookup
    sum, for codebooks fixed to the first two vectors' subvectors."""
    from datachain_spark.ops import pq as _pq

    if len({tuple(v) for v in data[:2]}) < 2:
        data = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 1.0, 0.0]] + data
    m, d_sub = 2, 2
    cb = [[data[c][s * d_sub:(s + 1) * d_sub] for c in range(2)] for s in range(m)]
    q = data[0]

    def py_codes(v):
        out = []
        for s in range(m):
            sub = v[s * d_sub:(s + 1) * d_sub]
            dists = [sum((a - b) ** 2 for a, b in zip(sub, cent)) for cent in cb[s]]
            out.append(min(range(len(dists)), key=lambda i: (dists[i], i)))
        return out

    def py_adc(codes):
        total = 0.0
        for s in range(m):
            cent = cb[s][codes[s]]
            qs = q[s * d_sub:(s + 1) * d_sub]
            total += sum((a - b) ** 2 for a, b in zip(qs, cent))
        return total

    df = session.spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "vec_id long, embedding array<double>"
    )
    for meth in ("numpy", "join"):
        enc = _pq.pq_encode(df, cb, method=meth)
        got = {r["vec_id"]: list(r["pq_codes"]) for r in enc.collect()}
        assert got == {i: py_codes(v) for i, v in enumerate(data)}, meth
    enc = _pq.pq_encode(df, cb)
    scored = {r["vec_id"]: r["adc_distance"] for r in
              _pq.pq_adc_topk(enc, cb, q, k=len(data), id_cols=["vec_id"]).collect()}
    for i, v in enumerate(data):
        assert abs(scored[i] - py_adc(py_codes(v))) < 1e-12


# -- corpus_stats exact percentiles vs a pure-Python reference (ops/text) --

@given(docs=st.lists(st.lists(_words, min_size=0, max_size=12).map(" ".join),
                     min_size=1, max_size=10))
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_corpus_stats_matches_python_reference(session, docs):
    """For ANY doc set: counts, totals and EXACT linear-interpolated
    percentiles equal a from-scratch Python computation (blank docs count
    zero words)."""
    from datachain_spark.ops import text as _t

    cdf = dc.read_values(
        session=session, doc_id=list(range(len(docs))), text=docs
    ).df
    row = _t.corpus_stats(cdf, exact=True).collect()[0]

    nw = sorted(len(d.split()) for d in docs)
    assert row["n_docs"] == len(docs)
    assert row["total_words"] == sum(nw)
    assert abs(row["avg_words"] - sum(nw) / len(nw)) < 1e-12

    def pctl(p):
        if len(nw) == 1:
            return float(nw[0])
        pos = p * (len(nw) - 1)
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(nw) - 1)
        return nw[lo] + (nw[hi] - nw[lo]) * frac

    for p, col in [(0.5, "p50_words"), (0.9, "p90_words"), (0.99, "p99_words")]:
        assert abs(row[col] - pctl(p)) < 1e-9, (p, nw, row[col])


# -- interval join vs DuckDB range join (ops/interval) ---------------------

@given(
    points=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                    min_size=1, max_size=10),
    ivals=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20),
                             st.integers(0, 8)),
                   min_size=1, max_size=8),
    binned=st.booleans(),
)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_matches_duckdb_range_join(session, points, ivals, binned):
    """For ANY keyed points/intervals (and for both the direct and the
    bin-bucketed execution strategies): the [start, end) containment join
    matches DuckDB's range join."""
    from datachain_spark.ops.interval import interval_join

    pts = [(i, k, p) for i, (k, p) in enumerate(points)]
    ivs = [(j, k, s, s + w) for j, (k, s, w) in enumerate(ivals)]
    ldf = session.spark.createDataFrame(pts, "pid int, k int, p int")
    rdf = session.spark.createDataFrame(ivs, "iid int, k int, s int, e int")
    out = interval_join(
        ldf, rdf, point="p", start="s", end="e", on="k",
        bin_size=4.0 if binned else None,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())

    lpd = pd.DataFrame(pts, columns=["pid", "k", "p"])
    rpd = pd.DataFrame(ivs, columns=["iid", "k", "s", "e"])
    duck = _duck(
        "SELECT l.pid, r.iid FROM l JOIN r ON l.k = r.k AND l.p >= r.s AND l.p < r.e",
        l=lpd, r=rpd,
    )
    exp = sorted((int(r.pid), int(r.iid)) for r in duck.itertuples())
    assert got == exp, (binned,)


# -- SemDeDup differential under hypothesis ----------------------------------
_vec = st.lists(
    st.floats(-2.0, 2.0, allow_nan=False, allow_infinity=False, width=32),
    min_size=4, max_size=4,
)


@given(
    vecs=st.lists(_vec, min_size=3, max_size=14),
    cents=st.lists(_vec, min_size=1, max_size=3),
    eps=st.sampled_from([0.05, 0.25, 0.5]),
    keep=st.sampled_from(["far", "near"]),
)
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_semdedup_matches_python_reference(session, vecs, cents, eps, keep):
    """For ANY vector set / centroid set / policy: the Spark survivors and
    pairs equal a plain-Python replay of the algorithm (argmin cell with
    lowest-cell ties, centroid-distance rank with id ties, drop on
    similarity to ANY earlier member). Zero-norm rows degrade to NULL
    cells and always survive."""
    import math as _m

    from datachain_spark.ops import semdedup as _sd

    usable_cents = [c for c in cents if any(x != 0.0 for x in c)]
    if not usable_cents:
        return

    def _dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    ncents = []
    for c in usable_cents:
        n = _m.sqrt(_dot(c, c))
        ncents.append([x / n for x in c])

    cells = {}
    invalid = set()
    for vid, v in enumerate(vecs):
        nrm = _m.sqrt(_dot(v, v))
        if nrm == 0.0:
            invalid.add(vid)
            continue
        ds = [1.0 - _dot(v, nc) / nrm for nc in ncents]
        cell = min(range(len(ds)), key=lambda i: (ds[i], i))
        cells.setdefault(cell, []).append((vid, v, nrm, ds[cell]))
    drops = set()
    for cell, members in cells.items():
        members.sort(
            key=lambda t: (-t[3], t[0]) if keep == "far" else (t[3], t[0])
        )
        for j in range(len(members)):
            for i in range(j):
                sim = _dot(members[i][1], members[j][1]) / (
                    members[i][2] * members[j][2]
                )
                if sim >= 1.0 - eps:
                    drops.add(members[j][0])
    expected = set(range(len(vecs))) - drops

    df = session.spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vid long, embedding array<double>",
    )
    out = _sd.semdedup(
        df, "vid", centroids=usable_cents, eps=eps, keep=keep, persist=False
    )
    got = {r["vid"] for r in out.collect()}
    assert got == expected
    assert invalid <= got  # zero-norm rows always survive


# --------------------------------------------------------------- cap_per_group
_cap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # group
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # score
        st.integers(min_value=0, max_value=9),          # tokens
    ),
    min_size=0,
    max_size=25,
)


@SETTINGS
@given(
    data=_cap_rows,
    max_rows=st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
    budget=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
)
def test_cap_per_group_matches_python_reference(session, data, max_rows, budget):
    """For ANY table: surviving ids equal a from-scratch Python replica of
    the best-first per-group cap (score desc nulls last, id tie-break,
    row_number cap AND inclusive running-token cap)."""
    from datachain_spark.ops.selection import cap_per_group

    if max_rows is None and budget is None:
        max_rows = 2  # at least one cap must be given

    ids = list(range(len(data)))
    expected = set()
    bygrp = {}
    for i, (g, s, t) in enumerate(data):
        bygrp.setdefault(g, []).append((i, s, t))
    for g, members in bygrp.items():
        # score desc with nulls last, then id — mirror desc_nulls_last
        members.sort(key=lambda m: (m[1] is None, -(m[1] or 0), m[0]))
        cum = 0
        for rank, (i, s, t) in enumerate(members, start=1):
            cum += t
            ok = True
            if max_rows is not None and rank > max_rows:
                ok = False
            if budget is not None and cum > budget:
                ok = False
            if ok:
                expected.add(i)

    df = session.spark.createDataFrame(
        [(i, g, s, t) for i, (g, s, t) in enumerate(data)],
        "rid long, grp long, score long, n_tok long",
    )
    got = {
        r["rid"]
        for r in cap_per_group(
            df, "grp", "rid", max_rows=max_rows, token_budget=budget,
            score_col="score", token_col="n_tok",
        ).collect()
    }
    assert got == expected


@given(left=rows, right=rows)
@SETTINGS
def test_rrf_fuse_matches_sql(session, left, right):
    # two retrieval branches from nasty random data: branch scores are the
    # per-id max(v) (relevance, desc) and min(v) (distance-like, asc);
    # rrf_fuse's ranks, missing-branch NULLs and fusion arithmetic must
    # match a full SQL replay with the same (score, id) tiebreaks
    from datachain_spark.ops.retrieval import rrf_fuse

    lf, rf = _pdf(left), _pdf(right)
    spark = session.spark
    l_br = (
        dc.read_pandas(lf, session=session).df
        .filter(C("k").isNotNull()).groupBy("k")
        .agg(func.max(C("v")).alias("s"))
        .withColumnRenamed("k", "id")
    )
    r_br = (
        dc.read_pandas(rf, session=session).df
        .filter(C("k").isNotNull()).groupBy("k")
        .agg(func.min(C("v")).alias("s"))
        .withColumnRenamed("k", "id")
    )
    out = rrf_fuse(
        [(l_br, "s", False), (r_br, "s", True)],
        id_col="id", k=6, n_per_branch=4,
    )
    sql = """
    WITH l0 AS (SELECT k AS id, max(v) AS s FROM lf
                WHERE k IS NOT NULL GROUP BY k),
    r0 AS (SELECT k AS id, min(v) AS s FROM rf
           WHERE k IS NOT NULL GROUP BY k),
    l AS (SELECT id,
                 CAST(row_number() OVER (ORDER BY s DESC, id) AS INTEGER)
                   AS rank_0
          FROM l0 WHERE s IS NOT NULL QUALIFY rank_0 <= 4),
    r AS (SELECT id,
                 CAST(row_number() OVER (ORDER BY s ASC, id) AS INTEGER)
                   AS rank_1
          FROM r0 WHERE s IS NOT NULL QUALIFY rank_1 <= 4),
    f AS (SELECT coalesce(l.id, r.id) AS id, l.rank_0, r.rank_1,
                 (CASE WHEN l.rank_0 IS NOT NULL
                       THEN 1.0 / (60.0 + l.rank_0) ELSE 0.0 END)
                 + (CASE WHEN r.rank_1 IS NOT NULL
                         THEN 1.0 / (60.0 + r.rank_1) ELSE 0.0 END)
                   AS rrf_score
          FROM l FULL OUTER JOIN r ON l.id = r.id)
    SELECT * FROM f ORDER BY rrf_score DESC, id LIMIT 6
    """
    _check_df(out, sql, lf=lf, rf=rf)


def _check_df(df, sql, **frames):
    spark_pd = df.toPandas()
    duck_pd = _duck(sql, **frames)
    ok, detail = compare_frames(spark_pd, duck_pd)
    assert ok, detail
