"""Text retrieval over document corpora: BM25 scoring/top-k.

No reference counterpart (spec addition): the reference's search story is
embedding-based (func/array.py cosine + usearch extension); a training-data
pipeline also needs LEXICAL retrieval — finding the corpus documents most
relevant to a text query (eval-set attribution, targeted decontamination,
seed-document expansion for domain mixes).

Scale shape (the part that matters at 100 TB): the query's terms are known
driver-side, so per-document term frequencies are per-row higher-order
``F.filter`` counts over the document's own token array — the corpus is
NEVER exploded to (doc, token) rows and never shuffles on tokens. The
corpus-level statistics BM25 needs (N, avgdl, per-term document frequency)
reduce to ONE row via a global aggregate and re-enter the plan as a
broadcast (the q15 scalar-subquery pattern: Catalyst folds the 1-row cross
join into the filter/projection, no driver collect). The only exchange in
the whole plan is the final top-k, which Catalyst runs as
TakeOrderedAndProject (per-partition heaps + driver merge of k·P rows).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# identical normalization to ops/text.shingles: lowercase, strip
# punctuation, split on whitespace — so BM25 tokens agree with every other
# text operator (and with the DuckDB oracle template)
_NORM_RE = r"[^\w\s]"


def _tokens(col) -> "F.Column":
    return F.split(
        F.trim(F.regexp_replace(F.lower(col), _NORM_RE, "")), r"\s+"
    )


def tokenize_query(query: str) -> "list[str]":
    """Driver-side twin of the corpus tokenizer (dedup'd, order kept).

    re.ASCII matters: Java's \\w and \\s (what the Spark regexp compiles
    to) are ASCII-only, so 'café' tokenizes to 'caf' on the corpus side —
    without the flag Python would keep the accent and the query term could
    never match any corpus token."""
    normalized = re.sub(_NORM_RE, "", query.lower(), flags=re.ASCII)
    words = re.split(r"\s+", normalized, flags=re.ASCII)
    out: list[str] = []
    for w in words:
        if w and w not in out:
            out.append(w)
    return out


def bm25_score(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document to ``query``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with the standard Robertson/Sparck-Jones idf
    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)).

    Output: (id_col, dl, score) for every document (score 0.0 when no term
    matches — callers filter or top-k as needed).

    Plan: one global 1-row aggregate for (N, avgdl, df per term) joined back
    by broadcast; tf via per-row array filters; zero token-level shuffles.
    """
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("bm25_score: query has no tokens after normalization")
    # blank/null text: split(trim('')) is [''] and split(null) is null —
    # guard both to an empty token array (dl=0, every tf=0, score=0.0)
    blank = F.coalesce(F.trim(F.col(text_col)), F.lit("")) == ""
    toks = F.when(blank, F.array().cast("array<string>")).otherwise(
        _tokens(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        toks.alias("__toks"),
        F.size(toks).alias("dl"),
    )

    # corpus statistics: ONE row — N, avgdl, and df per query term
    # (sum of per-doc containment flags; term list is a Python constant)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum(
                F.array_contains(F.col("__toks"), t).cast("long")
            ).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    def _eq(term: str):
        # closure helper: a default-arg lambda would have arity 2 and be
        # mis-detected as an (element, index) HOF callback
        return lambda w: w == F.lit(term)

    joined = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.size(F.filter(F.col("__toks"), _eq(t)))
        dfreq = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        denom = tf.cast("double") + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("__avgdl")
        )
        score = score + idf * tf.cast("double") * F.lit(k1 + 1.0) / denom
    return joined.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("dl"),
        score.alias("score"),
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Top-k documents by BM25 relevance — orderBy(score desc).limit(k)
    compiles to TakeOrderedAndProject (the cosine_topk pattern; ties broken
    by id so the cut is deterministic). ``keep_cols`` are carried through
    the scoring pass itself — NOT re-joined afterwards, which would
    multiply rows past k on duplicate ids and discard the ordering."""
    scored = bm25_score(df, query, id_col, text_col, k1=k1, b=b,
                        keep_cols=keep_cols)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    by=None,
    k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Top-``k`` characteristic terms per group by TF-IDF — the corpus
    profiling pass ("what is each source/language/domain actually about")
    and the seed-term generator for targeted mixes.

    score(t, g) = tf(t, g) · ln(N / df(t)) with tf the term's total
    occurrences inside group ``g``, N the total document count and df(t)
    the number of documents containing t anywhere in the corpus — so a
    term every group shares scores 0 and drops out naturally. Terms with
    df < ``min_df`` are noise-filtered. Output: (group cols, word, tf,
    df, score, rank), rank 1..k per group by score desc (ties on word).

    Scale: the corpus explodes to (group, doc, word) ONCE and aggregates
    immediately (map-side combine) to the per-(group, word) frame — the
    only corpus-sized shuffle. Because every doc carries exactly one
    group value, corpus-wide df(t) is the SUM of the per-group distinct
    counts — a second, vocabulary-sized aggregation, joined back on the
    word key; N re-enters as a 1-row broadcast. The top-k window runs on
    the vocabulary-sized frame, never the corpus.
    """
    gcols = [by] if isinstance(by, str) else list(by or [])
    words = _tokens(F.col(text_col))
    words = F.when(F.size(words) == 1, F.filter(words, lambda w: w != "")).otherwise(
        words
    )
    exploded = df.select(
        *gcols, F.col(id_col).alias("__id"), F.explode(words).alias("word")
    )
    per_gw = exploded.groupBy(*gcols, "word").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__id").alias("__df_g"),
    )
    df_word = per_gw.groupBy("word").agg(F.sum("__df_g").alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        per_gw.join(df_word, "word")
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")),
        )
    )
    if gcols:
        from pyspark.sql import Window

        w = Window.partitionBy(*gcols).orderBy(F.col("score").desc(), F.col("word"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*gcols, "word", "tf", "df", "score", "rank")
        )
    ranked = scored.orderBy(F.col("score").desc(), F.col("word")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("word"))
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "word", "tf", "df", "score", "rank"
    )


# ---------------------------------------------------------------- phrase search


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: one row per (word, doc) with the sorted
    0-based token positions — the persistent search structure phrase /
    proximity queries run against (save it as a dataset and reuse across
    queries; only new snapshots need re-indexing).

    Tokenization matches every other text operator (lowercase, strip
    punctuation, whitespace split). Blank documents index nothing. ONE
    posexplode + ONE (word, doc) aggregation — the standard index-build
    shuffle, map-side combined.
    """
    toks = _tokens(F.col(text_col))
    posed = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.when(F.length(F.trim(F.col(text_col))) > 0, toks).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pos", "word"),
    )
    return (
        posed.groupBy("word", "doc")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def bm25_index_frames(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The persistable BM25 state of a corpus snapshot, as two frames:

    - postings ``(term, doc, tf)`` — one row per (term, document);
    - doclens ``(doc, dl, fp)`` — token count + a 64-bit fingerprint of
      the RAW text (the change detector an incremental refresh joins
      on, so unchanged documents are never re-tokenized).

    Appends merge by union; a changed document swaps its rows. All
    corpus statistics BM25 needs (N, avgdl, df per term) derive from
    these frames at query time — nothing else is stored, so the index
    is exactly as mergeable as the rows themselves. ONE posexplode +
    one (term, doc) map-side-combined aggregation, the classic
    index-build shuffle (build_inverted_index without positions)."""
    blank = F.coalesce(F.trim(F.col(text_col)), F.lit("")) == ""
    toks = F.when(blank, F.array().cast("array<string>")).otherwise(
        _tokens(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).alias("doc"),
        toks.alias("__toks"),
        F.size(toks).alias("dl"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
    )
    doclens = base.select("doc", "dl", "fp")
    postings = (
        base.select("doc", F.explode("__toks").alias("term"))
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return postings, doclens


def bm25_index_score(
    postings: DataFrame,
    doclens: DataFrame,
    query: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 over a PERSISTED index (:func:`bm25_index_frames`) —
    same formula and output shape as :func:`bm25_score` ``(id_col, dl,
    score)`` for every document, but the corpus text is never read: the
    postings scan carries a pushed ``term IN (query terms)`` literal
    filter (bucket-prunable when the index is saved bucketed by term),
    and N/avgdl/df come from the two stored frames. Non-matching
    documents score 0.0, mirroring bm25_score."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError(
            "bm25_index_score: query has no tokens after normalization"
        )
    hits = postings.filter(F.col("term").isin(list(dict.fromkeys(terms))))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doclens.select("doc", "dl"), "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n").cast("double") - F.col("__df").cast("double")
           + F.lit(0.5))
        / (F.col("__df").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl").cast("double") / F.col("__avgdl")
    )
    # bm25_score sums one contribution per QUERY OCCURRENCE of a term
    # (its Python loop includes duplicates) — weight by query tf to match
    from collections import Counter

    qcounts = Counter(terms)
    qtf = F.create_map(
        *[x for t, c in qcounts.items()
          for x in (F.lit(t), F.lit(float(c)))]
    )
    contrib = (
        idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom
        * qtf[F.col("term")]
    )
    per_doc = scored.groupBy("doc").agg(F.sum(contrib).alias("__s"))
    return (
        doclens.select("doc", "dl")
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "dl",
            F.coalesce(F.col("__s"), F.lit(0.0)).alias("score"),
        )
    )


def phrase_search(
    index: DataFrame, phrase: str, proximity: int = 0
) -> DataFrame:
    """Documents containing the phrase's words in order: (doc, n_matches,
    first_pos). ``proximity=0`` requires EXACT adjacency (classic quoted
    phrase); ``proximity=w`` lets each next word trail by up to ``w``
    extra tokens (ordered near-match, '"big data"~2' style).

    Scale shape: each query word selects ONE posting row per containing
    doc (an equi-join on the word key — partition pruning on a
    word-bucketed saved index); the k posting frames then join on doc,
    narrowing with every word (docs missing ANY word drop at the first
    inner join). Position verification is per-doc array algebra
    (codegen'd filter/exists over the position lists), never an explode.
    One-word phrases degenerate to the posting lookup itself.
    """
    words = tokenize_query(phrase)
    if not words:
        raise ValueError("phrase_search: empty phrase after normalization")
    base = (
        index.filter(F.col("word") == words[0])
        .select(F.col("doc"), F.col("positions").alias("p0"))
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = index.filter(F.col("word") == w).select(
            F.col("doc"), F.col("positions").alias(f"p{i}")
        )
        base = base.join(nxt, "doc")
    # starts = positions of word0 that can chain through every later word
    # within the allowed gap; fold left-to-right keeping the FEASIBLE set
    # of (start, current_end) pairs — for proximity=0 end is fixed, so we
    # track starts whose chain reached word i at exactly/within the bound
    starts = F.col("p0")
    if len(words) > 1:
        # chains[i] = array of (start, end) structs alive after word i
        chains = F.transform(
            F.col("p0"),
            lambda s: F.struct(s.alias("s"), s.alias("e")),
        )
        for i in range(1, len(words)):
            pi = F.col(f"p{i}")
            lo = 1
            hi = 1 + proximity
            chains = F.filter(
                F.transform(
                    chains,
                    lambda c: F.struct(
                        c["s"].alias("s"),
                        # smallest position of word i in (e, e+hi] extends
                        # the chain; NULL ends it
                        F.array_min(
                            F.filter(
                                pi,
                                lambda p: (p >= c["e"] + lo) & (p <= c["e"] + hi),
                            )
                        ).alias("e"),
                    ),
                ),
                lambda c: c["e"].isNotNull(),
            )
        starts = F.transform(chains, lambda c: c["s"])
    out = base.select(
        "doc",
        F.size(starts).alias("n_matches"),
        F.array_min(starts).alias("first_pos"),
    ).filter(F.col("n_matches") > 0)
    return out


def proximity_search(
    index: DataFrame, terms: Sequence[str], window: int
) -> DataFrame:
    """Documents where ALL terms co-occur within a ``window``-token span,
    any order: (doc, span_start, span_len). The classic WAND-style
    unordered proximity filter — rank-fusion input or a high-precision
    decontamination probe.

    Same join shape as phrase_search (one posting row per term per doc,
    k-1 doc-key joins); the minimal covering span is found per doc with
    array algebra over the k position lists (for each position of the
    RAREST-cost-free choice — term 0 — the span is [min over terms of the
    nearest position >= it... ]; we evaluate candidate windows anchored at
    every position of every term, still per-row, no explode).
    """
    norm = [w for t in terms for w in tokenize_query(t)]
    if not norm:
        raise ValueError("proximity_search: no terms after normalization")
    if window < len(norm):
        raise ValueError("proximity_search: window smaller than term count")
    base = None
    for i, w in enumerate(norm):
        nxt = index.filter(F.col("word") == w).select(
            F.col("doc"), F.col("positions").alias(f"p{i}")
        )
        base = nxt if base is None else base.join(nxt, "doc")
    # candidate anchors: every position of term 0; a window [a, a+window)
    # qualifies if every term has a position in it. Checking only term-0
    # anchors is complete for MINIMAL spans that start at a term-0
    # occurrence; to cover spans starting at other terms, take anchors
    # from the union of all lists.
    all_pos = F.col("p0")
    for i in range(1, len(norm)):
        all_pos = F.array_union(all_pos, F.col(f"p{i}"))

    def covered(a):
        conds = None
        for i in range(len(norm)):
            c = F.exists(
                F.col(f"p{i}"), lambda p: (p >= a) & (p < a + window)
            )
            conds = c if conds is None else conds & c
        return conds

    anchors = F.filter(all_pos, covered)
    out = base.select(
        "doc", F.array_min(anchors).alias("span_start"),
        F.size(anchors).alias("n_anchors"),
    ).filter(F.col("n_anchors") > 0)
    return out.select("doc", "span_start", F.lit(int(window)).alias("span_len"))


def kwic(
    df: DataFrame,
    term: str,
    id_col: str,
    text_col: str = "text",
    window: int = 3,
    snippet_col: str = "snippet",
) -> DataFrame:
    """Keyword-in-context: one row per occurrence of ``term`` with
    (id, pos, snippet) — the ±``window``-word context, the human-review
    surface behind every "show me how this word is actually used" audit
    (blocklist tuning, PII rule review, contamination triage).

    Tokenization matches every other text operator. Pure per-row array
    algebra: occurrence positions via one index filter, the snippet via
    array slice — no shuffle; docs without the term emit no rows.
    """
    if window < 0:
        raise ValueError("kwic: window must be >= 0")
    toks = tokenize_query(term)
    if len(toks) != 1:
        raise ValueError("kwic: term must normalize to exactly one token")
    t = toks[0]
    words = _tokens(F.col(text_col))
    hits = F.when(
        F.size(words) > 0,
        F.filter(
            F.sequence(F.lit(1), F.size(words)),
            lambda i: F.element_at(words, i) == t,
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), words.alias("__w"), F.explode(hits).alias("__i")
    )
    lo = F.greatest(F.col("__i") - window, F.lit(1))
    length = F.least(
        F.col("__i") + F.lit(window), F.size("__w")
    ) - lo + F.lit(1)
    return exploded.select(
        id_col,
        (F.col("__i") - 1).cast("int").alias("pos"),
        F.array_join(F.slice("__w", lo, length), " ").alias(snippet_col),
    )


def ranked_list(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n: int,
    ascending: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``n`` rows by ``score_col`` with an explicit 1-based ``rank_col``
    — the retrieval-list shape rank-fusion consumes.

    Rank is deterministic: (score, then ``id_col`` ascending) so equal
    scores order by id identically in Spark and any SQL oracle. NULL and
    NaN scores are dropped (an unscorable row has no rank — and Spark
    sorts NaN ABOVE every double, so a NaN would otherwise win a
    descending cut while ranking last).

    Scale shape: the cut is ``orderBy().limit(n)`` — Catalyst's
    TakeOrderedAndProject (per-partition heaps, driver merge of n·P rows,
    never a global sort). The rank itself comes from ``sort_array`` over
    ONE collected ≤n-element array + ``posexplode`` (the ``zipf_profile``
    idiom) — bounded by ``n`` BY CONSTRUCTION, so no window with an empty
    partition spec ever appears in the plan and the cost after the cut is
    independent of corpus size.
    """
    if n < 1:
        raise ValueError("ranked_list: n must be >= 1")
    s = F.col(score_col)
    order = s.asc() if ascending else s.desc()
    cut = (
        df.filter(s.isNotNull() & ~F.isnan(s.cast("double")))
        .select(F.col(id_col), s.alias("__score"))
        .orderBy(order, F.col(id_col).asc())
        .limit(int(n))
    )
    key = F.col("__score") if ascending else -F.col("__score")
    packed = cut.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    key.alias("__k"),
                    F.col(id_col).alias("__id"),
                    F.col("__score").alias("__s"),
                )
            )
        ).alias("__arr")
    )
    return packed.select(
        F.posexplode("__arr").alias("__p", "__e")
    ).select(
        F.col(f"__e.__id").alias(id_col),
        F.col(f"__e.__s").alias(score_col),
        (F.col("__p") + 1).cast("int").alias(rank_col),
    )


def rrf_fuse(
    branches: Sequence[tuple],
    id_col: str,
    k: int = 10,
    rank_const: float = 60.0,
    weights: Optional[Sequence[float]] = None,
    n_per_branch: int = 100,
    rank_cols: Optional[Sequence[str]] = None,
    fused_col: str = "rrf_score",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval branches:
    ``rrf(d) = Σ_i w_i / (rank_const + rank_i(d))`` (Cormack et al. 2009,
    the standard hybrid-search combiner), rows absent from a branch's
    top-``n_per_branch`` contribute 0 for that branch.

    ``branches``: sequence of ``(df, score_col, ascending)`` — ascending
    True for distance-like scores (smaller is better), False for
    relevance-like. Output: ``(id_col, <rank_col per branch — NULL when
    the row missed that branch's list>, fused_col)``, top-``k`` by fused
    score (ties by id).

    Scale shape: each branch reduces to ≤``n_per_branch`` rows via
    ``ranked_list`` BEFORE any cross-branch work; the full-outer joins
    that align the lists therefore cost O(N·n) regardless of corpus size
    — rank fusion is corpus-scale only in its per-branch top-k cuts,
    which are TakeOrdered. No window functions, no broadcast assumptions.
    """
    if not branches:
        raise ValueError("rrf_fuse: need at least one branch")
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    w = list(weights) if weights is not None else [1.0] * len(branches)
    if len(w) != len(branches):
        raise ValueError("rrf_fuse: weights length must match branches")
    names = (
        list(rank_cols)
        if rank_cols is not None
        else [f"rank_{i}" for i in range(len(branches))]
    )
    if len(names) != len(branches):
        raise ValueError("rrf_fuse: rank_cols length must match branches")
    ranked = [
        ranked_list(bdf, score, id_col, n_per_branch, ascending=asc,
                    rank_col=names[i]).select(id_col, names[i])
        for i, (bdf, score, asc) in enumerate(branches)
    ]
    joined = ranked[0]
    for r in ranked[1:]:
        joined = joined.join(r, on=id_col, how="full_outer")
    contrib = [
        F.when(
            F.col(names[i]).isNotNull(),
            F.lit(float(w[i])) / (F.lit(float(rank_const)) + F.col(names[i])),
        ).otherwise(F.lit(0.0))
        for i in range(len(branches))
    ]
    fused = contrib[0]
    for c in contrib[1:]:
        fused = fused + c
    return (
        joined.select(id_col, *names, fused.alias(fused_col))
        .orderBy(F.col(fused_col).desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def hybrid_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query: str,
    query_vec: Sequence[float],
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    k: int = 10,
    n_per_branch: int = 100,
    rank_const: float = 60.0,
    weights: Sequence[float] = (1.0, 1.0),
    k1: float = 1.2,
    b: float = 0.75,
    round_scores: Optional[int] = 6,
    arrow: Optional[bool] = None,
) -> DataFrame:
    """Hybrid (lexical + dense) retrieval: BM25 over ``docs`` and cosine
    distance over ``vectors`` (joined by document id), fused with
    reciprocal-rank fusion — the standard two-tower search stack
    (sparse keyword recall + dense semantic recall) as ONE Catalyst plan.

    The lexical branch keeps only matching documents (BM25 > 0 — a
    document sharing no query term is not retrieved); the dense branch
    keeps only rows with a defined distance. ``round_scores`` rounds both
    branch scores BEFORE ranking (default 6 dp) so cross-engine float
    ulps can never flip adjacent ranks — rank, not raw score, is what
    fusion consumes, and a 1e-6 score quantum is far below any meaningful
    relevance difference.

    Output: ``(id_col, bm25_rank, cos_rank, rrf_score)`` top-``k``
    (``*_rank`` NULL when the document missed that branch's list).

    Scale shape: two corpus-scale TakeOrdered cuts (one per branch — the
    BM25 scan never explodes tokens, the cosine scan is one Arrow-batched
    matmul pass at d≥32), then O(n_per_branch) fusion. No shuffle carries
    more than n_per_branch rows past the cuts.
    """
    from .similarity import cosine_topk

    lex = bm25_score(docs, query, id_col, text_col, k1=k1, b=b)
    lex = lex.filter(F.col("score") > 0.0)
    dense = cosine_topk(
        vectors, query_vec, vec_col, k=n_per_branch,
        id_cols=[vec_id_col], arrow=arrow,
    )
    if vec_id_col != id_col:
        dense = dense.withColumnRenamed(vec_id_col, id_col)
    if round_scores is not None:
        lex = lex.withColumn("score", F.round("score", round_scores))
        dense = dense.withColumn(
            "distance", F.round("distance", round_scores)
        )
    return rrf_fuse(
        [(lex, "score", False), (dense, "distance", True)],
        id_col=id_col,
        k=k,
        rank_const=rank_const,
        weights=weights,
        n_per_branch=n_per_branch,
        rank_cols=["bm25_rank", "cos_rank"],
    )
