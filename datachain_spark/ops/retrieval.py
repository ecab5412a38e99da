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
