"""Text analysis operators for large-scale training-data pipelines.

No reference counterpart (datachain has no text-quality ops) — these are the
LLM-data-pipeline additions required by the build spec, designed Spark-first:
every metric is a native column expression (whole-stage codegen), so they run
at 100 TB without Python in the hot path.

Operators:
- token_count: whitespace tokens + a BPE-ish regex token estimate
- quality_score: length / punctuation / stopword / repetition heuristics
- language_id: stopword-hit n-gram heuristic over a small language table
- fingerprint: deterministic 64-bit document fingerprint (normalized text)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..columns import to_column

# A BPE-ish tokenizer regex: words, numbers, contractions, single punctuation.
# Public-knowledge pattern family (GPT-2-style regex tokenization).
_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# Tiny built-in stopword inventories for the language-ID heuristic.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "es", "una", "por", "con", "para", "del", "las"],
    "it": ["il", "di", "che", "la", "per", "una", "sono", "non", "con", "del"],
}

_EN_STOPWORDS = _LANG_STOPWORDS["en"] + [
    "a", "an", "on", "as", "at", "by", "be", "are", "this", "with", "from",
]


def whitespace_token_count(col) -> Column:
    """Number of whitespace-separated tokens."""
    c = to_column(col)
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def regex_token_count(col) -> Column:
    """BPE-ish token estimate via regexp_count of the GPT-2-style pattern."""
    return F.regexp_count(to_column(col), F.lit(_TOKEN_RE))


def punct_ratio(col) -> Column:
    c = to_column(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col, stopwords: Optional[Sequence[str]] = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    c = F.lower(to_column(col))
    words = F.split(F.trim(c), r"\s+")
    sw = F.array(*[F.lit(w) for w in (stopwords or _EN_STOPWORDS)])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, F.regexp_replace(w, r"[^a-z']", ""))))
    return hits / F.greatest(F.size(words), F.lit(1))


def mean_word_length(col) -> Column:
    c = to_column(col)
    words = F.split(F.trim(c), r"\s+")
    # sum of word lengths == count of non-whitespace characters — one
    # codegen'd regexp pass instead of an interpreted per-word HOF fold
    total = F.length(F.regexp_replace(c, r"\s", ""))
    return total / F.greatest(F.size(words), F.lit(1))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: penalize too-short docs, extreme
    punctuation, stopword-free text (likely non-linguistic), and very long
    mean word length (likely code/garbage). Weights are heuristic; the value
    is the *shape* — a single codegen expression usable in filters at scale."""
    c = to_column(col)
    n_tokens = whitespace_token_count(c).cast("double")
    len_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    p_ratio = punct_ratio(c)
    punct_score = F.when(p_ratio > 0.3, F.lit(0.0)).otherwise(F.lit(1.0) - p_ratio / 0.3)
    sw_ratio = stopword_ratio(c)
    sw_score = F.least(sw_ratio / F.lit(0.15), F.lit(1.0))
    mwl = mean_word_length(c)
    mwl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        F.lit(0.3) * len_score
        + F.lit(0.25) * punct_score
        + F.lit(0.25) * sw_score
        + F.lit(0.2) * mwl_score
    )


def language_id(col, languages: Optional[dict[str, list[str]]] = None) -> Column:
    """Stopword-hit language guess: for each candidate language, count how
    many of its top stopwords occur as tokens; argmax wins ('und' =
    undetermined when no hits). Pure column algebra — a 100-TB corpus scans
    once with no shuffle."""
    c = F.lower(to_column(col))
    words = F.split(F.trim(c), r"\s+")
    langs = languages or _LANG_STOPWORDS
    scores = []
    for lang, sws in langs.items():
        sw = F.array(*[F.lit(w) for w in sws])
        hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def _hash64(col, hash_fn: str) -> Column:
    """64-bit (60-bit for md5) integer hash of a string column.

    "xxhash64" is the production default (JVM-codegen'd, no allocation);
    "md5" is the portable family every SQL engine reproduces —
    DuckDB: CAST('0x' || substring(md5(x),1,15) AS BIGINT) — used to
    hash-verify the sketch machinery against an independent engine."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _seeded_hash64(col, seed: int, hash_fn: str) -> Column:
    """Seeded variant: xxhash64 takes the seed natively; md5 appends it."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    return _hash64(F.concat(col, F.lit(f":{seed}")), hash_fn)


def fingerprint(col, hash_fn: str = "xxhash64") -> Column:
    """Deterministic 64-bit fingerprint of whitespace/case-normalized text —
    the exact-dedup key. xxhash64 on the normalized form by default;
    ``hash_fn="md5"`` selects the portable cross-engine family (the
    sketch-oracle convention)."""
    c = to_column(col)
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return _hash64(normalized, hash_fn)


# lowercase Latin-1/Latin-Extended accents -> ASCII base letters; applied
# AFTER lower() so only the lowercase set is needed. Kept as parallel
# strings so the same pair feeds Spark translate() and DuckDB translate()
# in the oracle.
ACCENT_SRC = "àáâãäåèéêëìíîïòóôõöùúûüýÿñçšžœæð"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyyncszoad"


def normalize_text(
    col,
    lowercase: bool = True,
    strip_accents: bool = True,
    remove_punct: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Canonical text form for dedup / matching keys.

    lower -> accent fold (ASCII base letters) -> punctuation to space
    (anything that is not a letter/digit/whitespace) -> whitespace collapse
    -> trim. Pure codegen'd expressions; identical RE2-compatible regex
    source backs the DuckDB oracle (``normalize_text_docs``). Feed the
    result to ``fingerprint``/``minhash_signatures`` so near-identical
    documents differing only in case/accents/punctuation collide.
    """
    c = to_column(col)
    if lowercase:
        c = F.lower(c)
    if strip_accents:
        c = F.translate(c, ACCENT_SRC, ACCENT_DST)
    if remove_punct:
        c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def shingles(col, n: int = 3) -> Column:
    """Array of word n-gram shingles (for minhash / jaccard dedup)."""
    c = F.lower(to_column(col))
    words = F.split(F.trim(F.regexp_replace(c, r"[^\w\s]", "")), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) < n, F.array(F.array_join(words, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def shingle_rows(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) rows — the exploded form of :func:`shingles`, built via
    posexplode + window ``lead`` instead of the array higher-order functions.

    Why: Catalyst evaluates HOF lambdas (transform/slice/array_join)
    interpreted, outside whole-stage codegen — measured ~6x slower than this
    window formulation on the documents corpus at sf0.1. The window costs one
    shuffle on the id, which every downstream consumer (minhash signature
    groupBy, jaccard inverted index, decontaminate hit-set) would pay anyway
    and which Spark then reuses (hashpartitioning(id) satisfies the
    follow-up aggregation's clustering requirement).

    Semantics identical to ``explode(array_distinct(shingles(text, n)))``:
    word n-grams over the lower/punct-stripped text, whole-doc fallback for
    docs shorter than ``n`` words."""
    from pyspark.sql import Window as W

    c = F.lower(F.col(text_col))
    words = F.split(F.trim(F.regexp_replace(c, r"[^\w\s]", "")), r"\s+")
    base = df.select(F.col(id_col).alias("__id"), words.alias("__w"))
    if n <= 1:
        out = base.select("__id", F.explode("__w").alias("__shingle"))
    else:
        long = base.filter(F.size("__w") >= n).select(
            "__id", F.posexplode("__w").alias("__pos", "__word")
        )
        w = W.partitionBy("__id").orderBy("__pos")
        leads = [F.lead("__word", j).over(w) for j in range(1, n)]
        sh = long.select(
            "__id",
            F.concat_ws(" ", F.col("__word"), *leads).alias("__shingle"),
            F.lead("__word", n - 1).over(w).alias("__last"),
        )
        complete = sh.filter(F.col("__last").isNotNull()).select("__id", "__shingle")
        short = base.filter(F.size("__w") < n).select(
            "__id", F.array_join("__w", " ").alias("__shingle")
        )
        out = complete.union(short)
    return out.dropDuplicates(["__id", "__shingle"]) if distinct else out


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every char
    k-gram (the rolling-hash family — xxhash64 over sliding substrings),
    slide a window of ``window`` consecutive hashes, keep each window's
    minimum, distinct per doc. Robust to insertions/reordering — the
    chunk-level dedup fingerprint the spec's "rolling hash" calls for.

    Physical shape: the k-gram hashes are computed ONCE via posexplode (the
    pure column-expression form would re-evaluate the hash array per window —
    the CollapseProject trap documented in ops/dedup.py), then the sliding
    min is a per-doc window function. One shuffle on the doc id.

    Returns (id_col, fingerprint) rows.
    """
    from pyspark.sql import Window as W

    c = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n_grams = F.greatest(F.length(c) - k + 1, F.lit(0))
    grams = (
        df.select(F.col(id_col), c.alias("__norm"), n_grams.alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__norm"),
            F.posexplode(F.sequence(F.lit(1), F.col("__n"))).alias("pos", "__i"),
        )
        .select(
            F.col(id_col),
            F.col("pos"),
            _hash64(
                F.substring(F.col("__norm"), F.col("__i"), F.lit(k)), hash_fn
            ).alias("__h"),
        )
    )

    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("__wmin", F.min("__h").over(w))
        .select(F.col(id_col), F.col("__wmin").alias("fingerprint"))
        .dropDuplicates([id_col, "fingerprint"])
    )


_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def normalize_url(col, drop_params_re: str = _TRACKING_PARAM_RE) -> Column:
    """Canonical URL for web-corpus dedup: lowercase scheme+host, drop the
    port, strip trailing slashes and the fragment, remove tracking params
    (``drop_params_re``), sort surviving query params. Invalid URLs -> NULL.

    Pure column expression over ``try_parse_url`` + array ops — JVM-side,
    whole-stage codegen, no UDF. No reference counterpart (spec addition:
    the usual first step before exact_dedup on a crawled corpus).
    """
    u = to_column(col)
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    q = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(drop_params_re),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    out = F.concat(
        proto, F.lit("://"), host, path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(proto.isNull() | host.isNull(), F.lit(None).cast("string")).otherwise(out)


def url_domain(col, registrable: bool = False) -> Column:
    """Lowercased host of a URL (NULL when unparsable); ``registrable=True``
    approximates the registrable domain by keeping the last two labels
    (``news.bbc.co.uk`` -> ``co.uk`` caveat applies — a full public-suffix
    list is a data dependency, not shipped). Pure column expression."""
    host = F.lower(F.try_parse_url(to_column(col), F.lit("HOST")))
    if not registrable:
        return host
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n <= 2, host).otherwise(
            F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
        )
    )


def filter_by_domain_blocklist(
    df: DataFrame,
    url_col: str,
    blocklist: "DataFrame | Sequence[str]",
    keep_blocked: bool = False,
    registrable: bool = False,
) -> DataFrame:
    """Drop rows whose URL's domain is on a blocklist — the corpus-hygiene
    pass every crawled-data pipeline runs (spam/adult/malware domain lists).

    The blocklist side is BROADCAST (domain lists are millions of rows at
    most — far under broadcast limits), so the corpus never shuffles: scan →
    codegen'd host extraction → broadcast hash anti-join (or semi-join with
    ``keep_blocked=True`` for the audit view). Accepts a one-column
    DataFrame or a plain sequence of domains."""
    dom = url_domain(F.col(url_col), registrable=registrable).alias("__dom")
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        bl = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "__bl_dom string"
        )
    else:
        bl = blocklist.select(
            F.lower(F.col(blocklist.columns[0])).alias("__bl_dom")
        )
    how = "left_semi" if keep_blocked else "left_anti"
    out = (
        df.withColumn("__dom", dom)
        .join(F.broadcast(bl.dropDuplicates()), F.col("__dom") == F.col("__bl_dom"), how)
    )
    return out.drop("__dom")


def ngram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Train an n-gram language model from a reference corpus: returns
    (context, word, count, context_count) rows — the sufficient statistics
    for :func:`ngram_lm_score`. Context = the n-1 preceding words (empty
    string for n=1). One explode + two count aggregations, all JVM-side;
    the model is (distinct n-grams) rows — typically millions, broadcast-
    or shuffle-joinable downstream."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # positioned tokens -> (context, word) pairs via window lead — the
    # shingle_rows machinery, but keeping the context/word split point
    from pyspark.sql import Window as W

    words_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")), r"\s+"
    )
    tok = df.select(F.monotonically_increasing_id().alias("__rid"), words_arr.alias("__w")) \
        .select("__rid", F.posexplode("__w").alias("__pos", "__word"))
    if n == 1:
        pairs = tok.select(F.lit("").alias("context"), F.col("__word").alias("word"))
    else:
        w = W.partitionBy("__rid").orderBy("__pos")
        leads = [F.lead("__word", j).over(w) for j in range(1, n)]
        pairs = tok.select(
            F.concat_ws(" ", F.col("__word"), *leads[:-1]).alias("context"),
            leads[-1].alias("word"),
        ).filter(F.col("word").isNotNull())
    grams = pairs.groupBy("context", "word").agg(F.count("*").alias("count"))
    ctx = grams.groupBy("context").agg(F.sum("count").alias("context_count"))
    return grams.join(ctx, "context").select("context", "word", "count", "context_count")


def ngram_lm_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 2,
    alpha: float = 1.0,
    vocab_size: Optional[int] = None,
) -> DataFrame:
    """CCNet-style LM quality signal: per-doc mean log-probability and
    perplexity under the :func:`ngram_lm_train` model, with Laplace
    smoothing P(w|ctx) = (c + alpha)/(C + alpha*V). Docs whose text looks
    nothing like the reference corpus (boilerplate, other languages,
    garbage) score low — the standard perplexity-bucket filter
    (Wenzek et al., "CCNet", 2020 uses KenLM; the sufficient statistics
    and the filtering semantics are the same).

    Output: (id_col, n_grams, avg_logprob, perplexity).

    Docs with fewer than ``n`` tokens have no n-grams: they are still
    emitted (n_grams=0, null avg_logprob/perplexity) so downstream joins
    never silently lose rows — treat null as "no signal", not "bad doc".

    Scale shape: docs explode to (id, context, word) rows ONCE; a single
    equi-join against the model (AQE broadcasts small LMs, shuffle-joins
    big ones — both sides narrow), then one per-id aggregation. Unseen
    n-grams keep the smoothed floor via the left join's null branch."""
    if vocab_size is None:
        # clamp: an EMPTY model has 0 distinct words, which would zero the
        # smoothing denominator (0 + alpha*0) and divide-by-zero into null
        # scores instead of the smoothed floor
        vocab_size = max(1, lm.select("word").distinct().count())
    from pyspark.sql import Window as W

    words_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")), r"\s+"
    )
    tok = df.select(F.col(id_col).alias("__id"), words_arr.alias("__w")).select(
        "__id", F.posexplode("__w").alias("__pos", "__word")
    )
    if n == 1:
        pairs = tok.select("__id", F.lit("").alias("context"), F.col("__word").alias("word"))
    else:
        w = W.partitionBy("__id").orderBy("__pos")
        leads = [F.lead("__word", j).over(w) for j in range(1, n)]
        pairs = tok.select(
            "__id",
            F.concat_ws(" ", F.col("__word"), *leads[:-1]).alias("context"),
            leads[-1].alias("word"),
        ).filter(F.col("word").isNotNull())
    # two joins, not one: a SEEN context with an UNSEEN word must still use
    # the context's total count in the denominator (one (context, word)
    # left join would zero it and collapse smoothing to 1/V — caught by the
    # DuckDB oracle during development)
    gram_counts = lm.select("context", "word", "count")
    ctx_counts = lm.select("context", "context_count").dropDuplicates(["context"])
    joined = pairs.join(gram_counts, ["context", "word"], "left").join(
        ctx_counts, "context", "left"
    )
    logp = F.log(
        (F.coalesce(F.col("count"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("context_count"), F.lit(0)) + F.lit(float(alpha) * vocab_size))
    )
    scored = joined.groupBy("__id").agg(
        F.count("*").alias("n_grams"),
        F.avg(logp).alias("avg_logprob"),
    )
    # left-join back to the full id set: docs shorter than n tokens produce
    # zero pairs and would otherwise vanish from the output entirely
    ids = df.select(F.col(id_col).alias("__id")).dropDuplicates()
    return ids.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
        "avg_logprob",
        F.exp(-F.col("avg_logprob")).alias("perplexity"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the RAG / long-
    context prep pass (split long docs into model-window-sized pieces
    before embedding or packing; ``overlap`` tokens repeat at each boundary
    so no span is ever cut mid-context).

    Output: (id_col, chunk_id, chunk_text, n_tokens) — chunk_id 0-based in
    document order; the last chunk may be short but always contributes at
    least one new token.

    Scale shape: ZERO shuffles — chunk starts are a per-row ``sequence``
    and each chunk is a slice+join of the row's own token array, then
    posexplode. The higher-order functions run interpreted (Catalyst), but
    per CHUNK, not per token — ~chunk_tokens× fewer lambda evaluations
    than the per-token explode forms, which is why this op tolerates the
    HOF form the shingle pipeline had to abandon (ops/text.shingle_rows).

    No reference counterpart (spec addition). Oracle: __spark_entry__
    ``chunk_documents`` replicates slicing in DuckDB list arithmetic."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    # blank/whitespace-only text: split(trim('')) yields [''] (size 1), which
    # would overstate n_tokens as 1 — count 0 tokens for blank docs (they
    # still emit one empty chunk so no doc vanishes)
    n = F.when(
        F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(words))
    # starts: 0, step, 2*step ... while start < n - overlap (last chunk must
    # add >= 1 new token); degenerate short doc -> single chunk 0
    num = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), num - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(words, i * F.lit(step) + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * F.lit(step)).alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col("__c.chunk_text").alias("chunk_text"),
            F.col("__c.n_tokens").alias("n_tokens"),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep: str = r"\n{2,}",
    chunk_words: int = 0,
    joiner: str = "",
) -> DataFrame:
    """Corpus-wide segment-level deduplication — the CCNet/C4-style pass that
    drops boilerplate paragraphs repeated across documents, keeping only the
    FIRST occurrence (ordered by (id, position)) and reassembling each doc
    from its surviving segments.

    Segmentation: split on the ``sep`` regex (paragraph mode), or — when
    ``chunk_words`` > 0 — into non-overlapping fixed word windows (line/chunk
    mode for corpora without paragraph structure). ``joiner`` defaults to
    "\\n\\n" for paragraph mode, " " for chunk mode.

    Output: one row per input doc, (id_col, text_col) with the deduplicated
    text ("" when every segment was seen earlier).

    Scale shape: (id, pos, segment) rows shuffle once keyed on the segment
    for the first-occurrence window, once on the doc id for reassembly. Each
    window group is one distinct segment's duplicate set — no skew beyond
    true boilerplate, which is exactly what you want surfaced (and droppable
    upstream with a max-duplicates filter).

    No reference counterpart (spec addition). Oracle: __spark_entry__
    ``segment_dedup_chunks`` replicates chunking + first-occurrence-wins +
    reassembly in DuckDB on the raw strings (the hash only routes the
    shuffle; the dedup decision is over exact segments either way).
    """
    from pyspark.sql import Window as W

    if not joiner:
        joiner = " " if chunk_words else "\n\n"
    if chunk_words:
        ws = F.split(F.trim(F.col(text_col)), r"\s+")
        nseg = F.ceil(F.size(ws) / float(chunk_words)).cast("int")
        segs = F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.array_join(F.slice(ws, i * chunk_words + 1, chunk_words), " "),
        )
    else:
        segs = F.split(F.col(text_col), sep)

    seg = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(segs).alias("__pos", "__seg"),
    )
    w = W.partitionBy("__seg").orderBy("__id", "__pos")
    kept = (
        seg.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                    lambda s: s["__seg"],
                ),
                joiner,
            ).alias("__text")
        )
    )
    ids = df.select(F.col(id_col).alias("__id"))
    return (
        ids.join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
        )
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    min_line_chars: int = 4,
) -> DataFrame:
    """Onion/CCNet-style boilerplate REMOVAL: lines whose document
    frequency crosses a threshold (cookie banners, nav menus, footers —
    the per-site template text that survives per-document quality gates)
    are stripped from EVERY document, unlike :func:`segment_dedup` which
    keeps the first occurrence. The classic web-corpus cleaning pass
    (Pomikálek's Onion, CCNet §3.1, both public).

    A line is boilerplate when its TRIMMED form is at least
    ``min_line_chars`` long and appears in
    ``>= max(min_docs, ceil(min_doc_frac * n_docs))`` distinct documents.
    Short trimmed lines are never counted or stripped (blank separators
    and "---" rules would otherwise dominate the frequency table).

    Output: one row per input doc — ``(id_col, text_col, n_stripped)``
    with surviving lines rejoined in order (NULL text passes through with
    ``n_stripped`` 0).

    Scale shape: explode to (id, pos, line); document frequencies come
    from ONE groupBy over (hash, id)-distinct rows keyed on the 64-bit
    xxhash64 of the TRIMMED line (exact semantics — no case folding) —
    8-byte shuffle keys, the full text never shuffles for counting (the
    exact_dedup convention; collisions merge lines at the negligible
    n²/2⁶⁴ rate documented there). The
    corpus-size scalar rides a broadcast 1-row cross join (no driver
    round-trip), boilerplate membership is a broadcast-sized anti join on
    the fingerprint (the boiler set is threshold-pruned), one (id)
    shuffle for reassembly. The DuckDB oracle decides over exact strings
    — identical results absent a 64-bit collision (oracle
    ``strip_boilerplate_docs``).
    """
    if not 0 < min_doc_frac <= 1:
        raise ValueError("strip_boilerplate: min_doc_frac must be in (0, 1]")
    if min_docs < 2:
        raise ValueError("strip_boilerplate: min_docs must be >= 2")
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    lines = base.select(
        "__id",
        F.posexplode(F.split(F.col("__t"), "\n")).alias("__pos", "__line"),
    )
    eligible = lines.filter(F.length(F.trim("__line")) >= min_line_chars)
    n_docs = base.filter(F.col("__t").isNotNull()).agg(
        F.count(F.lit(1)).alias("__n")
    )
    freq = (
        eligible.select(F.xxhash64(F.trim("__line")).alias("__key"), "__id")
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    boiler = (
        freq.crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("__df")
            >= F.greatest(
                F.lit(int(min_docs)),
                F.ceil(F.lit(float(min_doc_frac)) * F.col("__n")),
            )
        )
        .select("__key")
    )
    kept = lines.join(
        F.broadcast(boiler),
        F.xxhash64(F.trim(F.col("__line"))) == F.col("__key"),
        "left_anti",
    )
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
        ).alias("__clean"),
        F.count(F.lit(1)).alias("__kept"),
    )
    n_lines = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("__total"))
    return (
        base.join(rebuilt, "__id", "left")
        .join(n_lines, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__t").isNotNull(), F.coalesce("__clean", F.lit("")))
            .alias(text_col),
            F.coalesce(
                F.col("__total") - F.coalesce("__kept", F.lit(0)), F.lit(0)
            ).cast("int").alias("n_stripped"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per doc:

    - ``n_words``: whitespace token count (lowercased, punctuation-stripped,
      same normalization as :func:`shingles`).
    - ``top_word_frac``: occurrences of the most frequent word / n_words —
      high values flag keyword-stuffed or degenerate docs.
    - ``dup_2gram_frac``: fraction of 2-gram occurrences whose 2-gram appears
      more than once in the doc (occurrence-fraction variant of Gopher's
      duplicate-n-gram character fraction).

    Single-pass shape (r04, measured 1.6× the old two-pass form at sf0.1):
    both signals derive from ONE posexplode projection; 2-grams come from a
    window ``lead`` (not a second explode; the HOF explode(shingles(...))
    form measured ~7× slower still — interpreted lambdas). Catalyst then
    does something better than the hand plan: it PRUNES the window out of
    the word-count branch (words don't need ``lead``), so that branch is
    explode → map-side partial count → a narrow (id, word, count) shuffle,
    while only the gram branch pays the window's id-shuffle — every
    exchange in the final plan carries aggregated or windowed rows keyed by
    the id, never raw tokens, and the final per-id merge is a broadcast
    join (plan-guarded). Filter chains compose downstream, e.g.
    ``.filter(C.top_word_frac < 0.2)``.

    No reference counterpart (spec addition). Oracled by __spark_entry__
    ``repetition_stats``."""
    from pyspark.sql import Window as W

    words_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")), r"\s+"
    )
    tok = df.select(F.col(id_col).alias("__id"), words_arr.alias("__warr")).select(
        "__id", F.posexplode("__warr").alias("__pos", "__w")
    )
    w = W.partitionBy("__id").orderBy("__pos")
    win = tok.select("__id", "__w", F.lead("__w", 1).over(w).alias("__next"))
    word_stats = (
        win.groupBy("__id", "__w")
        .agg(F.count("*").alias("__c"))
        .groupBy("__id")
        .agg(
            F.sum("__c").alias("n_words"),
            (F.max("__c") / F.sum("__c")).alias("top_word_frac"),
        )
    )
    grams = win.filter(F.col("__next").isNotNull()).select(
        "__id", F.concat_ws(" ", "__w", "__next").alias("__g")
    )
    # one-word docs produce no lead pairs; their single 2-gram is the whole
    # doc (shingles()'s short-doc fallback)
    short = (
        win.groupBy("__id")
        .agg(F.count("*").alias("__n"), F.max("__w").alias("__g"))
        .filter(F.col("__n") == 1)
        .select("__id", "__g")
    )
    gram_stats = (
        grams.union(short)
        .groupBy("__id", "__g")
        .agg(F.count("*").alias("__c"))
        .groupBy("__id")
        .agg(
            (
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0)))
                / F.sum("__c")
            ).alias("dup_2gram_frac")
        )
    )
    return (
        word_stats.join(gram_stats, "__id")
        .select(
            F.col("__id").alias(id_col),
            "n_words", "top_word_frac", "dup_2gram_frac",
        )
    )


GOPHER_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,   # '#' or '…' per word
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_stopword_hits": 2,         # docs with <2 common-word hits are junk
    "max_top_word_frac": 0.2,
    "max_dup_2gram_frac": 0.2,
}


def gopher_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    thresholds: Optional[dict[str, float]] = None,
    keep_rejected: bool = False,
    with_signals: bool = False,
) -> DataFrame:
    """Gopher/MassiveText-style document quality gate (Rae et al. 2021,
    table A1 rules re-expressed on this engine's signals): word-count
    bounds, mean word length, symbol-per-word ratio, bullet/ellipsis line
    fractions, minimum stopword evidence, and the repetition signals from
    :func:`repetition_stats`. ``thresholds`` overrides any
    :data:`GOPHER_DEFAULTS` key; ``keep_rejected=True`` inverts the gate
    (audit view); ``with_signals=True`` keeps the computed signal columns.

    All line/symbol signals are pure column expressions (codegen); the two
    repetition signals reuse repetition_stats' explode+groupBy — so the
    whole gate costs one explode pass plus a per-id join, same as
    repetition_stats alone. No reference counterpart (spec addition)."""
    th = {**GOPHER_DEFAULTS, **(thresholds or {})}
    c = F.col(text_col)
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^([-*•])"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))) / n_lines
    )
    n_words_ws = F.greatest(whitespace_token_count(c), F.lit(1))
    symbol_ratio = (
        (F.length(c) - F.length(F.regexp_replace(c, r"[#…]", ""))) / n_words_ws
    )
    # one alternation pass, not 21 per-word rlike scans: stopword_hits is
    # the count of DISTINCT stopwords present, and every alternative is
    # \b-anchored so exactly the whole-word alternative can match — the
    # two forms are equivalent, this one scans the text once
    sw_pat = r"\b(" + "|".join(_EN_STOPWORDS) + r")\b"
    sw = F.size(
        F.array_distinct(F.regexp_extract_all(F.lower(c), F.lit(sw_pat), 1))
    )
    # row-local signals attach as a projection (no self-join, no shuffle);
    # only the aggregated repetition signals need the per-id join
    with_sigs = (
        df.withColumn("mean_word_len", mean_word_length(c))
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ellipsis_frac)
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("stopword_hits", sw)
    )
    rep = repetition_stats(df, id_col, text_col)
    joined = with_sigs.join(rep, id_col)
    passed = (
        (F.col("n_words") >= th["min_words"])
        & (F.col("n_words") <= th["max_words"])
        & (F.col("mean_word_len") >= th["min_mean_word_len"])
        & (F.col("mean_word_len") <= th["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= th["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_line_frac"])
        & (F.col("stopword_hits") >= th["min_stopword_hits"])
        & (F.col("top_word_frac") <= th["max_top_word_frac"])
        & (F.col("dup_2gram_frac") <= th["max_dup_2gram_frac"])
    )
    out = joined.filter(~passed if keep_rejected else passed)
    if not with_signals:
        out = out.select(*df.columns)
    return out


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact-substring near-duplicate candidates (the MOSS report step):
    docs sharing >= ``min_shared`` winnowing fingerprints contain matching
    character k-gram regions — the scalable stand-in for suffix-array
    substring dedup (Lee et al., "Deduplicating Training Data...").

    Returns (id_a, id_b, shared) with id_a < id_b.

    Scale shape: inverted-index self-join on the fingerprint (same posting-
    list analysis as n-gram Jaccard — boilerplate fingerprints fan out;
    pre-filter fingerprints whose posting list exceeds a cap upstream if the
    corpus has them), then one pair-key aggregation."""
    fp = winnow_fingerprints(df, id_col, text_col, k=k, window=window, hash_fn=hash_fn)
    a = fp.select(F.col(id_col).alias("__ia"), F.col("fingerprint").alias("__f"))
    b = fp.select(F.col(id_col).alias("__ib"), F.col("fingerprint").alias("__f"))
    return (
        a.join(b, "__f")
        .filter(F.col("__ia") < F.col("__ib"))
        .groupBy(F.col("__ia").alias("id_a"), F.col("__ib").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_k: int = 0,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Corpus vocabulary: (word, count, doc_freq) over the same normalization
    as :func:`shingles` — the frequency table tokenizer training (BPE vocab
    seeding) and stopword discovery start from.

    One explode + one groupBy(word) with map-side partial aggregation;
    ``top_k`` adds a TakeOrdered (per-partition heap, no extra shuffle).
    ``id_col`` identifies a doc for doc_freq; without one a synthetic id is
    materialized BEFORE the explode (inline monotonically_increasing_id
    would re-evaluate per exploded row and inflate doc_freq to count).
    No reference counterpart (spec addition)."""
    if id_col is None:
        base = df.withColumn("__doc", F.monotonically_increasing_id())
        base = base.localCheckpoint(eager=False)
    else:
        base = df.withColumn("__doc", F.col(id_col))
    words = base.select(
        "__doc",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")),
                r"\s+",
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(
            F.count("*").alias("count"),
            F.count_distinct("__doc").alias("doc_freq"),
        )
        .filter(F.col("count") >= min_count)
    )
    if top_k:
        vocab = vocab.orderBy(F.col("count").desc(), F.col("word")).limit(top_k)
    return vocab


def analyze_text(df: DataFrame, text_col: str = "text", prefix: str = "") -> DataFrame:
    """Convenience: append the full text-analysis signal set."""
    c = F.col(text_col)
    return df.withColumns({
        f"{prefix}n_tokens": whitespace_token_count(c),
        f"{prefix}n_tokens_bpe": regex_token_count(c),
        f"{prefix}punct_ratio": punct_ratio(c),
        f"{prefix}stopword_ratio": stopword_ratio(c),
        f"{prefix}quality": quality_score(c),
        f"{prefix}lang_guess": language_id(c),
        f"{prefix}fingerprint": fingerprint(c),
    })


# -- PII redaction -----------------------------------------------------------
# Patterns kept to syntax shared by Java regex (Spark, codegen'd
# regexp_replace) and RE2 (DuckDB), so the same literal oracles both engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # international-ish phone numbers: optional +CC, separators, 9-14 digits
    "phone": (r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{2,4}", "<PHONE>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "credit_card": (r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b", "<CC>"),
}
# order matters: ssn/credit_card before phone (a bare SSN also matches the
# phone pattern), email before phone (digits in local parts)
_PII_ORDER = ("email", "ssn", "credit_card", "ipv4", "phone")


def redact_pii(col, kinds: Optional[Sequence[str]] = None) -> Column:
    """Replace common PII spans with typed placeholder tokens — the C4/Dolma
    -style scrub pass every public-corpus pipeline runs before training.
    Pure chained ``regexp_replace`` column expressions: whole-stage codegen,
    zero shuffles, linear scan at any scale. ``kinds`` subsets/reorders
    {email, ssn, credit_card, ipv4, phone} (default: all, in an order that
    keeps overlapping patterns from shadowing each other).

    No reference counterpart (spec addition: large-scale training-data ops)."""
    c = col if isinstance(col, Column) else F.col(col)
    for kind in kinds if kinds is not None else _PII_ORDER:
        pattern, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts per kind plus a total — the audit view
    (what WOULD be redacted). Counts follow redact_pii's replacement order
    exactly: each kind is counted on the text AFTER earlier kinds were
    replaced, so an SSN never double-counts as a phone number. Still pure
    codegen'd column expressions — zero shuffles."""
    c = F.col(text_col)
    counts = {}
    for kind in _PII_ORDER:
        pattern, token = PII_PATTERNS[kind]
        counts[f"n_{kind}"] = F.regexp_count(c, F.lit(pattern))
        c = F.regexp_replace(c, pattern, token)
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in counts.items()])
    total = None
    for kind in _PII_ORDER:
        col = F.col(f"n_{kind}")
        total = col if total is None else total + col
    return out.withColumn("n_pii_total", total)


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    group_by: "Optional[Sequence[str]]" = None,
    percentiles: "Sequence[float]" = (0.5, 0.9, 0.99),
    exact: bool = False,
) -> DataFrame:
    """Per-group corpus profile for training-mix design: document counts,
    word/char volumes, and word-count percentiles — the numbers a data-mix
    spreadsheet starts from (how much of each language/source, how long are
    the docs, where is the tail).

    Output: group columns + (n_docs, total_words, total_chars, avg_words,
    p{NN}_words ...). ``group_by=None`` profiles the whole corpus as one row.

    ``exact=False`` (default, the scale path) uses approx_percentile
    (one-pass sketch, mergeable map-side); ``exact=True`` uses the exact
    percentile aggregate — linear-interpolated identically to DuckDB's
    quantile_cont, so the exact form is oracle-verifiable bit-for-bit.
    One shuffle on the group keys either way. No reference counterpart
    (spec addition)."""
    c = F.col(text_col)
    n_words = F.when(
        F.coalesce(F.trim(c), F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(c), r"\s+")))
    base = df.select(
        *[F.col(g) for g in (group_by or [])],
        n_words.alias("__nw"),
        F.length(F.coalesce(c, F.lit(""))).alias("__nc"),
    )
    pct_aggs = []
    for p in percentiles:
        name = f"p{int(round(p * 100))}_words"
        fn = F.percentile if exact else F.approx_percentile
        args = (F.col("__nw"), F.lit(float(p))) if exact else (
            F.col("__nw"), F.lit(float(p)), F.lit(10000)
        )
        pct_aggs.append(fn(*args).cast("double").alias(name))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nw").cast("long").alias("total_words"),
        F.sum("__nc").cast("long").alias("total_chars"),
        F.avg("__nw").alias("avg_words"),
        *pct_aggs,
    ]
    if group_by:
        return base.groupBy(*group_by).agg(*aggs)
    return base.agg(*aggs)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    quality_col: Optional[str] = None,
    text_col: str = "text",
    keep_null_urls: bool = True,
) -> DataFrame:
    """Canonical-URL deduplication: keep ONE document per
    :func:`normalize_url` key — the standard web-corpus pre-pass (the same
    page crawled under utm-tagged / fragment / trailing-slash variants).

    Winner per URL: highest ``quality_col`` if given, else
    :func:`quality_score` over ``text_col``; ties (and the no-signal case)
    break on the lowest ``id_col``, so the cut is deterministic. Documents
    whose URL fails to parse (NULL canonical form) pass through untouched
    by default — set ``keep_null_urls=False`` to drop them.

    One shuffle on the canonical-URL key (window top-1); no reference
    counterpart (spec addition)."""
    from pyspark.sql import Window as W

    q = F.col(quality_col) if quality_col else quality_score(F.col(text_col))
    canon = normalize_url(F.col(url_col))
    w = W.partitionBy("__canon").orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    withk = df.withColumn("__canon", canon).withColumn("__q", q)
    nulls = withk.filter(F.col("__canon").isNull()).drop("__canon", "__q")
    kept = (
        withk.filter(F.col("__canon").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__canon", "__q", "__rn")
    )
    return kept.unionByName(nulls) if keep_null_urls else kept


def contamination_report(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str = "text",
    probe_id_col: Optional[str] = None,
    probe_text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Audit companion to :func:`datachain_spark.ops.dedup.decontaminate`:
    instead of dropping contaminated docs, report HOW each one overlaps the
    probe set — per (corpus doc, probe doc): shared distinct n-grams, the
    corpus doc's total distinct n-grams, and the contamination fraction.
    The numbers triage borderline hits (1 shared 3-gram of boilerplate vs
    an embedded eval question) before committing to a drop policy.

    Output: (id_col, probe_id, n_shared, n_doc_ngrams, frac_shared),
    one row per contaminated (doc, probe) pair.

    Scale shape: both sides shingle via the codegen'd window form; the
    probe side broadcasts (eval suites are small next to the corpus); one
    count aggregation on the pair key. No reference counterpart."""
    pid = probe_id_col or id_col
    corpus_sh = shingle_rows(df, id_col, text_col, n=ngram).select(
        "__id", F.col("__shingle").alias("__sh")
    )
    probe_sh = (
        shingle_rows(probes, pid, probe_text_col, n=ngram)
        .select(F.col("__id").alias("__pid"), F.col("__shingle").alias("__sh"))
    )
    totals = corpus_sh.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_doc_ngrams")
    )
    pairs = (
        corpus_sh.join(F.broadcast(probe_sh), "__sh")
        .groupBy("__id", "__pid")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(totals, "__id")
        .select(
            F.col("__id").alias(id_col),
            F.col("__pid").alias("probe_id"),
            F.col("n_shared"),
            F.col("n_doc_ngrams"),
            (F.col("n_shared").cast("double") / F.col("n_doc_ngrams"))
            .alias("frac_shared"),
        )
    )


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col_a: str = "text",
    text_col_b: Optional[str] = None,
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """ONE-ROW corpus-level n-gram overlap summary between two datasets:
    ``(ngrams_a, ngrams_b, shared_ngrams, jaccard, frac_a_in_b,
    frac_b_in_a)`` over each side's DISTINCT word n-grams. The
    dataset-comparison audit ("how much of candidate corpus B already
    sits in training set A?") that the per-(doc, probe) forms
    (:func:`contamination_report`, decontaminate) don't answer — those
    need a small probe side; here BOTH corpora can be 100 TB.

    Scale shape: each side reduces to its distinct 64-bit n-gram hashes
    (one shuffle per side, the exact_dedup fingerprint convention —
    collisions merge n-grams at the negligible rate documented there),
    the intersection is one hash-keyed join of the two distinct sets, and
    only three counters reach the final 1-row result. ``hash_fn="md5"``
    selects the portable family; the DuckDB oracle counts exact shingle
    strings — identical absent a 64-bit collision. Zero denominators
    yield NULL fractions (empty corpus = no evidence, not 0% overlap).
    """
    tb = text_col_b or text_col_a

    def dset(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(F.explode(shingles(F.col(col), ngram)).alias("__s"))
            .filter(F.length("__s") > 0)
            .select(_hash64(F.col("__s"), hash_fn).alias("__h"))
            .distinct()
        )

    ha, hb = dset(df_a, text_col_a), dset(df_b, tb)
    na = ha.agg(F.count(F.lit(1)).alias("ngrams_a"))
    nb = hb.agg(F.count(F.lit(1)).alias("ngrams_b"))
    ns = ha.join(hb, "__h").agg(F.count(F.lit(1)).alias("shared_ngrams"))
    a, b, s = F.col("ngrams_a"), F.col("ngrams_b"), F.col("shared_ngrams")
    return (
        na.crossJoin(nb)
        .crossJoin(ns)
        .select(
            a, b, s,
            F.try_divide(s.cast("double"), (a + b - s).cast("double"))
            .alias("jaccard"),
            F.try_divide(s.cast("double"), a.cast("double"))
            .alias("frac_a_in_b"),
            F.try_divide(s.cast("double"), b.cast("double"))
            .alias("frac_b_in_a"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    ppl_col: str,
    by=None,
    head_q: float = 1.0 / 3.0,
    middle_q: float = 2.0 / 3.0,
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): label each doc by where its LM perplexity falls within its
    group's distribution — ``head`` (ppl <= the ``head_q`` quantile,
    lowest perplexity = most fluent), ``middle`` (<= ``middle_q``), else
    ``tail``. ``by`` is the grouping (CCNet buckets per language, so the
    thresholds adapt to each language's LM quality); None buckets
    globally. Compose with :func:`ngram_lm_score` upstream for the
    perplexity itself. NULL perplexities land in ``tail``.

    Scale: thresholds are exact interpolated percentiles from ONE
    aggregation (<= |groups| rows out, map-side partial), broadcast back —
    the corpus itself never shuffles.
    """
    gcols = [by] if isinstance(by, str) else list(by or [])
    c = F.col(ppl_col)
    thresholds = df.groupBy(*gcols).agg(
        F.percentile(c, head_q).alias("__t1"),
        F.percentile(c, middle_q).alias("__t2"),
    )
    # null-safe join-back: a NULL group key is a real group (groupBy made
    # thresholds for it) — shared idiom, see ops/common.py
    from .common import broadcast_group_join

    joined = broadcast_group_join(df, gcols, thresholds)
    label = (
        F.when(c <= F.col("__t1"), F.lit("head"))
        .when(c <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn(bucket_col, label).drop("__t1", "__t2")


# Unicode scripts worth distinguishing in a web corpus. Java spells the
# property \p{IsXxx}; RE2 (DuckDB) spells it \p{Xxx} — SCRIPTS carries the
# bare name so operator and oracle derive their own spelling from one list.
SCRIPTS = [
    "Latin", "Cyrillic", "Han", "Arabic", "Devanagari",
    "Greek", "Hangul", "Hiragana", "Katakana", "Hebrew", "Thai",
]


def script_profile(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    scripts: Optional[Sequence[str]] = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-document Unicode-script census: one count column per script
    (``n_latin``, ``n_han``, ...) plus ``n_chars`` and the dominant
    ``script`` label ('und' when no script chars at all) — the
    writing-system companion to the stopword ``language_id`` (catches
    what stopword lists can't: CJK, mixed-script spam, transliteration).

    One codegen regexp count per script per row — a single scan, zero
    shuffles, zero Python. Ties break alphabetically (deterministic).
    ``keep_cols`` passes extra columns through (the text column itself is
    dropped — it is the wide one).
    """
    names = list(scripts) if scripts is not None else list(SCRIPTS)
    if not names:
        raise ValueError("script_profile: scripts must be non-empty")
    c = F.col(text_col)
    counts = {
        s: F.coalesce(
            F.regexp_count(c, F.lit(r"\p{Is" + s + "}")), F.lit(0)
        ).cast("long")
        for s in names
    }
    # argmax via array_max over (count, reversed-name) structs: count wins,
    # then the alphabetically FIRST script (max of reversed comparison needs
    # care — use min-name ordering by negating via sort: struct(count, name)
    # picks the LAST name on ties, so compare on (count, -rank) instead)
    ranked = [
        F.struct(
            counts[s].alias("n"),
            F.lit(len(names) - i).alias("r"),  # earlier name = larger r
            F.lit(s.lower()).alias("s"),
        )
        for i, s in enumerate(sorted(names))
    ]
    best = F.array_max(F.array(*ranked))
    dominant = F.when(best["n"] > 0, best["s"]).otherwise(F.lit("und"))
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        *[counts[s].alias(f"n_{s.lower()}") for s in names],
        F.coalesce(F.length(c), F.lit(0)).cast("long").alias("n_chars"),
        dominant.alias("script"),
    )


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    redundancy signal Dolma/Gopher-family pipelines gate on: templated,
    repeated or machine-generated text compresses far below prose (~0.3
    vs ~0.6+); near-1.0 flags already-compressed or random payloads.

    Arrow-batched mapInPandas (zlib is stdlib C — the batch transfer, not
    the compression, is the cost); deterministic for a fixed zlib version
    and level, so differential-testable against Python directly, but not
    SQL-expressible (unit-verified, the BPE/pack_greedy precedent). NULL
    or empty text -> NULL ratio. Keeps only (id, n_bytes, ratio) — join
    back by id to gate.
    """
    import zlib

    from pyspark.sql import types as T

    schema = T.StructType([
        df.schema[id_col],
        T.StructField("n_bytes", T.LongType()),
        T.StructField(out_col, T.DoubleType()),
    ])

    def batches(it):
        import pandas as pd

        for pdf in it:
            texts = pdf[text_col]
            n_bytes, ratios = [], []
            for t in texts:
                if t is None or t == "":
                    n_bytes.append(0)
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                n_bytes.append(len(raw))
                ratios.append(len(zlib.compress(raw, level)) / len(raw))
            yield pd.DataFrame({
                id_col: pdf[id_col], "n_bytes": n_bytes, out_col: ratios,
            })

    return df.select(id_col, text_col).mapInPandas(batches, schema)


def ngram_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: Optional[str] = None,
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Distinct word-n-gram hashes of a corpus — the stored reference set
    :func:`novelty_score` probes (one BIGINT column ``ngram_hash``).
    Save it next to a dataset version and score later snapshots without
    rescanning this corpus; union + distinct new snapshots in to advance
    it (the :func:`~datachain_spark.ops.dedup.fingerprint_index` shape,
    one level below whole-document identity)."""
    _ = id_col  # the index is id-free; accepted for API symmetry
    rows = shingle_rows(
        df.select(F.monotonically_increasing_id().alias("__sid"), text_col),
        "__sid", text_col, n=ngram, distinct=True,
    )
    return (
        rows.select(_hash64(F.col("__shingle"), hash_fn).alias("ngram_hash"))
        .distinct()
    )


def substring_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document word-n-gram posting frame ``(id_col, ngram_hash)`` —
    the stored index :func:`find_substring` probes at query time (the
    doc-addressed sibling of the corpus-level :func:`ngram_index`).
    Save it as a dataset version beside the corpus; a phrase query then
    touches only the index rows whose hashes match the needle's grams
    (a literal IN predicate the parquet scan prunes on) plus the
    candidate documents — never the corpus text. One distinct row per
    (doc, gram); size is bounded by total words, like the span-dedup
    gram table (ops/dedup.remove_duplicate_spans)."""
    # distinct=False + one distinct over the HASH projection: the hash
    # collapses duplicate shingles anyway, so deduping shingle_rows first
    # would just add a second (wider) shuffle to every index build
    rows = shingle_rows(df, id_col, text_col, n=ngram, distinct=False)
    return rows.select(
        F.col("__id").alias(id_col),
        _hash64(F.col("__shingle"), hash_fn).alias("ngram_hash"),
    ).distinct()


def find_substring(
    corpus: DataFrame,
    index: DataFrame,
    needle: str,
    id_col: str,
    text_col: str = "text",
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact phrase search at query time WITHOUT a corpus text scan
    (r08 verdict task 7 — the suffix-automaton-free substring probe):
    find every document whose shingle-normalized text (lowercased,
    punctuation stripped, single-spaced — the :func:`shingle_rows`
    normalization) contains ``needle`` at word boundaries.

    Two-phase, both index-pruned:

    1. CANDIDATES: the needle's own word ``ngram``-grams are hashed with
       the index's hash family (one tiny local frame — never a Python
       re-implementation of the hash) and pushed into the stored index
       as a literal ``ngram_hash IN (...)`` predicate, which Catalyst
       pushes to the parquet scan (plan-guarded in tests). A document
       qualifies only when it carries ALL the needle's distinct grams —
       necessary for containment, so candidates are a superset.
    2. CONFIRM: only candidate documents are (semi-)joined back to the
       corpus and checked for the contiguous phrase; gram hits that are
       scattered or reordered die here. Output: ``(id_col, pos)`` with
       ``pos`` the 1-based character position of the first occurrence
       in the normalized text.

    The needle must have at least ``ngram`` words after normalization —
    the index resolution (same bound as the span-dedup gram table).
    100-TB shape: the corpus text is read only for the candidate set;
    the index scan reads one 8-byte column under a pushed IN filter.
    """
    import re as _re

    # re.ASCII: Spark's Java regex \w/\s are ASCII-only, Python's are
    # Unicode — without the flag a needle with accented word chars
    # normalizes differently from the index/confirm side and silently
    # matches nothing (the tokenize_query precedent, ops/retrieval.py)
    words = [
        w for w in _re.split(
            r"\s+",
            _re.sub(r"[^\w\s]", "", needle.lower(), flags=_re.ASCII).strip(),
            flags=_re.ASCII,
        ) if w
    ]
    if len(words) < ngram:
        raise ValueError(
            f"find_substring: needle has {len(words)} normalized words; "
            f"the stored index resolves phrases of >= {ngram} words"
        )
    grams = [" ".join(words[i:i + ngram])
             for i in range(len(words) - ngram + 1)]
    spark = corpus.sparkSession
    keys = [
        r[0]
        for r in spark.createDataFrame([(g,) for g in grams], "g string")
        .select(_hash64(F.col("g"), hash_fn)).collect()
    ]
    k = len(set(keys))
    cands = (
        index.filter(F.col("ngram_hash").isin(keys))
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("ngram_hash")).alias("__k"))
        .filter(F.col("__k") == k)
        .select(id_col)
    )
    norm = F.array_join(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")
            ),
            r"\s+",
        ),
        " ",
    )
    phrase = " ".join(words)
    pos = F.locate(f" {phrase} ", F.concat(F.lit(" "), norm, F.lit(" ")))
    return (
        corpus.join(cands, id_col, "left_semi")
        .select(F.col(id_col), pos.cast("long").alias("pos"))
        .filter(F.col("pos") > 0)
    )


def novelty_score(
    df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document NOVELTY vs a reference corpus: the fraction of the
    doc's distinct word n-grams absent from an :func:`ngram_index` —
    the data-freshness / near-duplication signal curation pipelines rank
    by when deciding what a new crawl actually adds (novelty ~0 means
    the doc is re-hashed boilerplate even when no single document
    duplicates it; the per-doc complement of the corpus-level
    :func:`corpus_overlap`). Output: ``(id_col, n_ngrams, n_novel,
    novelty)``. Shingling uses :func:`shingle_rows`'s whole-doc fallback:
    a doc with fewer than ``ngram`` words (including the empty doc)
    contributes its single whole-text shingle, so an empty doc gets
    ``n_ngrams=1`` and novelty 1.0 unless the index itself was built
    over a corpus containing an empty doc — filter empty/whitespace-only
    texts upstream if they should not be scored.

    Shape: the doc side explodes ONCE to distinct (id, gram-hash) rows;
    one hash-keyed LEFT join against the index (both sides shuffle on
    the 64-bit key — no broadcast assumption, the index can be as large
    as the corpus it summarizes) and one id-keyed count aggregation.
    Raw text never shuffles.
    """
    if ngram < 1:
        raise ValueError("novelty_score: ngram must be >= 1")
    rows = shingle_rows(df, id_col, text_col, n=ngram, distinct=True)
    # shingle_rows emits internal (__id, __shingle) names
    hashed = rows.select(
        F.col("__id").alias(id_col),
        _hash64(F.col("__shingle"), hash_fn).alias("__h"),
    )
    probe = index.select(
        F.col("ngram_hash").alias("__h"), F.lit(True).alias("__seen")
    ).distinct()
    joined = hashed.join(probe, "__h", "left")
    out = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
        .cast("long").alias("n_novel"),
    )
    return out.withColumn(
        "novelty", F.try_divide(F.col("n_novel"), F.col("n_ngrams"))
    )


def contamination_matrix(
    corpora: DataFrame,
    benchmarks: DataFrame,
    corpus_col: str = "corpus",
    suite_col: str = "suite",
    text_col: str = "text",
    bench_text_col: Optional[str] = None,
    ngram: int = 3,
    hash_fn: str = "xxhash64",
    corpora_grams: Optional[DataFrame] = None,
) -> DataFrame:
    """Cross-corpus CONTAMINATION MATRIX: N training corpora x M
    benchmark suites -> one row per (corpus, suite) with the n-gram
    overlap — the release-review artifact answering "which of our
    corpora leak which eval suites" in ONE plan instead of N·M
    :func:`corpus_overlap` calls. Output: ``(corpus, suite,
    ngrams_corpus, ngrams_suite, shared_ngrams,
    frac_suite_in_corpus)``; pairs with zero overlap keep their row
    (counts 0, fraction 0), suites/corpora with no n-grams at all get
    NULL fractions via try_divide.

    Scale shape: each side reduces ONCE to its distinct (label,
    gram-hash) rows — the 100-TB corpus text is scanned once no matter
    how many suites — then one hash-keyed join between the two distinct
    sets (no broadcast assumption; AQE broadcasts the suite side when
    it is small, the usual case) and one (corpus, suite) count. Labels
    must not contain the unit-separator character ``\\x1f`` (used to
    ride the per-row shingle id).

    INCREMENTAL path: pass ``corpora_grams`` — a (``corpus_col``,
    ``ngram_hash``) frame, i.e. per-corpus :func:`ngram_index` outputs
    stacked with their labels — and the corpus text is NEVER rescanned:
    audit a new benchmark release against stored 8-byte gram indexes of
    every historical corpus (build them with the same ``ngram`` and
    ``hash_fn``). ``corpora`` is then only consulted for the grid's
    corpus labels (pass the gram frame itself if its labels cover all
    corpora).
    """
    if ngram < 1:
        raise ValueError("contamination_matrix: ngram must be >= 1")
    sep = "\x1f"
    btc = bench_text_col or text_col

    def labeled_grams(df: DataFrame, label: str, tcol: str, out: str):
        tagged = df.select(
            F.concat_ws(
                sep,
                F.col(label).cast("string"),
                F.monotonically_increasing_id().cast("string"),
            ).alias("__rid"),
            F.col(tcol).alias("__t"),
        )
        rows = shingle_rows(tagged, "__rid", "__t", n=ngram, distinct=False)
        return (
            rows.filter(
                F.col("__shingle").isNotNull()
                & (F.length("__shingle") > 0)
            )
            .select(
                F.substring_index(F.col("__id"), sep, 1).alias(out),
                _hash64(F.col("__shingle"), hash_fn).alias("__h"),
            )
            .distinct()
        )

    if corpora_grams is not None:
        gc = corpora_grams.select(
            F.col(corpus_col).cast("string").alias("corpus"),
            F.col("ngram_hash").alias("__h"),
        ).distinct()
    else:
        gc = labeled_grams(corpora, corpus_col, text_col, "corpus")
    gb = labeled_grams(benchmarks, suite_col, btc, "suite")
    grid = (
        corpora.select(F.col(corpus_col).cast("string").alias("corpus"))
        .distinct()
        .crossJoin(
            benchmarks.select(
                F.col(suite_col).cast("string").alias("suite")
            ).distinct()
        )
    )
    nc = gc.groupBy("corpus").agg(
        F.count(F.lit(1)).cast("long").alias("ngrams_corpus")
    )
    nb = gb.groupBy("suite").agg(
        F.count(F.lit(1)).cast("long").alias("ngrams_suite")
    )
    shared = (
        gc.join(gb, "__h")
        .groupBy("corpus", "suite")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
    )
    return (
        grid.join(nc, "corpus", "left")
        .join(nb, "suite", "left")
        .join(shared, ["corpus", "suite"], "left")
        .select(
            "corpus", "suite",
            F.coalesce("ngrams_corpus", F.lit(0)).alias("ngrams_corpus"),
            F.coalesce("ngrams_suite", F.lit(0)).alias("ngrams_suite"),
            F.coalesce("shared_ngrams", F.lit(0)).alias("shared_ngrams"),
            F.try_divide(
                F.coalesce("shared_ngrams", F.lit(0)).cast("double"),
                F.coalesce("ngrams_suite", F.lit(0)).cast("double"),
            ).alias("frac_suite_in_corpus"),
        )
    )





def overlap_matrix(
    corpora: DataFrame,
    corpus_col: str = "corpus",
    text_col: str = "text",
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairwise N x N corpus n-gram overlap — the near-duplication grid
    across EVERY pair of labeled corpora in one plan (which crawls
    re-collect which, which mixture components are redundant): one row
    per unordered pair (a < b by label) with ``(corpus_a, corpus_b,
    ngrams_a, ngrams_b, shared_ngrams, jaccard)``. The self-pair is
    omitted (jaccard 1 by definition); zero-overlap pairs keep their
    row; empty corpora yield NULL jaccard via try_divide.

    Scale shape: the corpus text reduces ONCE to distinct (label,
    gram-hash) rows, then ONE hash-keyed self-join restricted to
    label_a < label_b produces every pair's intersection counts — cost
    is the gram-collision fan-out, never |corpus|² text comparisons.
    Same machinery as :func:`contamination_matrix` (labels must not
    contain ``\\x1f``)."""
    if ngram < 1:
        raise ValueError("overlap_matrix: ngram must be >= 1")
    sep = "\x1f"
    tagged = corpora.select(
        F.concat_ws(
            sep,
            F.col(corpus_col).cast("string"),
            F.monotonically_increasing_id().cast("string"),
        ).alias("__rid"),
        F.col(text_col).alias("__t"),
    )
    rows = shingle_rows(tagged, "__rid", "__t", n=ngram, distinct=False)
    grams = (
        rows.filter(
            F.col("__shingle").isNotNull() & (F.length("__shingle") > 0)
        )
        .select(
            F.substring_index(F.col("__id"), sep, 1).alias("corpus"),
            _hash64(F.col("__shingle"), hash_fn).alias("__h"),
        )
        .distinct()
    )
    labels = corpora.select(
        F.col(corpus_col).cast("string").alias("corpus")
    ).distinct()
    grid = (
        labels.select(F.col("corpus").alias("corpus_a"))
        .crossJoin(labels.select(F.col("corpus").alias("corpus_b")))
        .filter(F.col("corpus_a") < F.col("corpus_b"))
    )
    counts = grams.groupBy("corpus").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    ga = grams.select(F.col("corpus").alias("corpus_a"), "__h")
    gb = grams.select(F.col("corpus").alias("corpus_b"), "__h")
    shared = (
        ga.join(gb, "__h")
        .filter(F.col("corpus_a") < F.col("corpus_b"))
        .groupBy("corpus_a", "corpus_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
    )
    na = counts.select(
        F.col("corpus").alias("corpus_a"), F.col("__n").alias("ngrams_a")
    )
    nb = counts.select(
        F.col("corpus").alias("corpus_b"), F.col("__n").alias("ngrams_b")
    )
    a, b, s = F.col("ngrams_a"), F.col("ngrams_b"), F.col("shared_ngrams")
    return (
        grid.join(na, "corpus_a", "left")
        .join(nb, "corpus_b", "left")
        .join(shared, ["corpus_a", "corpus_b"], "left")
        .select(
            "corpus_a", "corpus_b",
            F.coalesce(a, F.lit(0)).alias("ngrams_a"),
            F.coalesce(b, F.lit(0)).alias("ngrams_b"),
            F.coalesce(s, F.lit(0)).alias("shared_ngrams"),
            F.try_divide(
                F.coalesce(s, F.lit(0)).cast("double"),
                (
                    F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
                    - F.coalesce(s, F.lit(0))
                ).cast("double"),
            ).alias("jaccard"),
        )
    )


def zipf_profile(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """ONE-ROW Zipf rank-frequency profile of a corpus — the
    distributional-health gate (natural language fits log(freq) ~
    -1·log(rank); template-generated, looped, or synthetic corpora bend
    the slope and the fit): ``(n_tokens, n_types, top_freq, zipf_slope,
    r2)`` from an ordinary-least-squares fit of ln(freq) on ln(rank)
    over the ``top_k`` most frequent tokens (ties broken by token text
    so the rank order is deterministic).

    Scale shape: one token count aggregation (map-side combined — the
    shuffle carries distinct tokens, not the corpus), a TakeOrdered
    top-k truncation (orderBy().limit(k) — Spark keeps k rows per
    partition and merges, never a global sort), then the rank comes
    from sort_array over ONE collected k-row array (bounded by top_k by
    construction) + posexplode — no window with an empty partition spec
    anywhere in the plan — and a 5-counter fold closes the regression.
    The raw corpus is scanned once."""
    if top_k < 2:
        raise ValueError("zipf_profile: top_k must be >= 2")
    tok = F.explode(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")
            ),
            r"\s+",
        )
    ).alias("__tok")
    toks = df.select(tok).filter(F.length("__tok") > 0)
    counts = toks.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__f")
    )
    top = counts.orderBy(F.desc("__f"), F.asc("__tok")).limit(int(top_k))
    # rank = position in the (freq desc, token asc) order, computed by
    # sorting ONE <=top_k-element array (struct sorts lexicographically;
    # negated freq makes ascending sort_array give the desired order)
    packed = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("__f")).alias("__nf"),
                    F.col("__tok").alias("__t"),
                )
            )
        ).alias("__arr")
    )
    ranked = packed.select(
        F.posexplode("__arr").alias("__p", "__s")
    ).select(
        (F.col("__p") + 1).alias("__r"),
        (-F.col("__s.__nf")).cast("long").alias("__f"),
    ).select(
        F.log(F.col("__r").cast("double")).alias("__lr"),
        F.log(F.col("__f").cast("double")).alias("__lf"),
        "__f", "__r",
    )
    totals = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct("__tok").cast("long").alias("n_types"),
    )
    lr, lf = F.col("__lr"), F.col("__lf")
    fit = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("__k"),
        F.sum(lr).alias("__sx"), F.sum(lf).alias("__sy"),
        F.sum(lr * lr).alias("__sxx"), F.sum(lf * lf).alias("__syy"),
        F.sum(lr * lf).alias("__sxy"),
        F.max(F.when(F.col("__r") == 1, F.col("__f")))
        .cast("long").alias("top_freq"),
    )
    k = F.col("__k")
    cov = k * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = k * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = k * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return totals.crossJoin(F.broadcast(fit)).select(
        "n_tokens", "n_types", "top_freq",
        F.try_divide(cov, varx).alias("zipf_slope"),
        F.try_divide(cov * cov, varx * vary).alias("r2"),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
    pmi_round: int = 6,
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information: ``pmi = ln((c_ab / N_bi) / ((c_a / N_uni) · (c_b /
    N_uni)))`` over pairs seen at least ``min_count`` times — the
    corpus-health sibling of :func:`zipf_profile` (template/boilerplate
    corpora surface as implausibly strong collocations; natural text
    yields the expected named-entity/idiom pairs).

    Tokenization matches every other text operator. Scale shape: the
    bigram extraction is pure per-row array algebra (``zip_with`` over
    two shifted slices — no window, no posexplode-with-lead), so the
    only shuffles carry DISTINCT unigrams and bigrams (map-side
    combined), never the corpus; the two unigram joins key on the token;
    the final cut is TakeOrdered. PMI is rounded to ``pmi_round``
    decimals BEFORE the ranking so cross-engine float ulps cannot flip
    adjacent ranks (ties break on the word pair).
    """
    if k < 1:
        raise ValueError("collocations: k must be >= 1")
    if min_count < 1:
        raise ValueError("collocations: min_count must be >= 1")
    w = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", "")),
        r"\s+",
    )
    words = F.filter(w, lambda x: F.length(x) > 0)
    toks = df.select(words.alias("__w")).filter(F.size("__w") > 0)
    uni = (
        toks.select(F.explode("__w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pair_arr = F.zip_with(
        F.slice(F.col("__w"), 1, F.greatest(F.size("__w") - 1, F.lit(0))),
        F.slice(F.col("__w"), 2, F.greatest(F.size("__w") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bi_full = (
        toks.filter(F.size("__w") >= 2)
        .select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p.a").alias("word_a"), F.col("__p.b").alias("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    bi = bi_full.filter(F.col("c_ab") >= min_count)
    # totals fold the already-shuffled count tables (sum of unigram counts
    # == total tokens; sum of pair counts == total adjacent pairs), so
    # Catalyst reuses each branch's exchange instead of rescanning the
    # corpus two more times — 2 corpus scans total, not 4
    n_uni = uni.agg(F.sum("c").cast("double").alias("__nu"))
    n_bi = bi_full.agg(
        F.coalesce(F.sum("c_ab"), F.lit(0)).cast("double").alias("__nb")
    )
    joined = (
        bi.join(uni.withColumnRenamed("word", "word_a")
                   .withColumnRenamed("c", "c_a"), "word_a")
        .join(uni.withColumnRenamed("word", "word_b")
                 .withColumnRenamed("c", "c_b"), "word_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.round(
        F.log(
            (F.col("c_ab") / F.col("__nb"))
            / ((F.col("c_a") / F.col("__nu")) * (F.col("c_b") / F.col("__nu")))
        ),
        pmi_round,
    )
    return (
        joined.select(
            "word_a", "word_b", "c_ab",
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "word_a", "word_b")
        .limit(int(k))
    )
