"""Trainable byte-pair-encoding tokenizer: distributed counts, broadcast
encode.

The reference ships no tokenizer (token counting there is whitespace/regex
arithmetic — mirrored in ops/text.whitespace_token_count /
regex_token_count); real pipelines need actual subword tokenization for
packing budgets, perplexity filters and train-ready token ids. This module
implements classic BPE (Sennrich et al. 2016, public) the way production
trainers (HuggingFace tokenizers, the GPT-2 encoder) structure it:

- **Training operates on the word-frequency table, not the corpus.** The
  only distributed pass is ONE split→explode→groupBy(word) count with
  map-side combine; the merge loop then runs driver-side over at most
  ``max_words`` (word, count) rows — O(vocab), not O(corpus). This is not
  a shortcut: it is exactly how real BPE trainers work, because merge
  statistics within a word are independent of the word's context. At
  100 TB the count pass is the same shuffle as `ops/text.vocabulary`; the
  top-``max_words`` cap bounds driver memory (tail words contribute
  negligible pair mass — documented approximation, standard practice).
- **Encoding is a zero-shuffle Arrow-batched pass.** The merge ranks ship
  to executors inside the mapInPandas closure (broadcast-sized: one small
  dict); each executor keeps a word→tokens memo across batches, so the
  per-word merge loop runs once per DISTINCT word per executor — under a
  Zipfian word distribution the hit rate makes the pass I/O-bound.

Determinism: merge selection breaks count ties lexicographically on the
pair, so the same corpus always yields the same merge table on any engine
(floating point never enters). Not DuckDB-oracle-able (the merge loop is
iterative); verified instead by a from-scratch Python reference
differential in tests (the pack_greedy / PQ precedent).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to each word's final symbol (Sennrich-style),
#: so merges never cross word boundaries and word endings tokenize distinctly
_EOW = "</w>"

#: executor-process-global word→tokens memo, keyed per merge table; Python
#: workers are reused across tasks, so the cache amortizes across the whole
#: task stream. Bounded: a memo is cleared when it exceeds _MEMO_MAX_WORDS
#: (Zipf means the head re-fills instantly; the bound caps worker memory)
_WORD_MEMO: dict = {}
_MEMO_MAX_WORDS = 1_000_000


def _word_counts(
    df: DataFrame, text_col: str, lowercase: bool, max_words: int
) -> list[tuple[str, int]]:
    """ONE distributed aggregation: (word, count) for the top ``max_words``
    words by count (ties broken by word so the cut is deterministic)."""
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    cleaned = F.trim(txt)
    words = F.when(
        F.coalesce(cleaned, F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(F.split(cleaned, r"\s+"))
    counts = (
        df.select(F.explode(words).alias("__w"))
        # Spark trim strips only ASCII spaces, so text with leading
        # tabs/newlines splits with a leading '' — filter it (the
        # ops/text.vocabulary guard) or it eats a max_words slot
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w"))
        .limit(max_words)
    )
    return [(r["__w"], r["__c"]) for r in counts.collect()]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    lowercase: bool = True,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the ordered merge table ``[(left, right), ...]`` — a plain
    driver-side artifact (like PQ codebooks / IVF centroids) to pass to
    ``bpe_encode``/``bpe_token_count`` or persist with the dataset.

    The driver loop is the standard indexed trainer: pair counts plus a
    pair→words inverted index, so each merge touches only the words that
    contain the pair. Stops early when no pair occurs twice (merging
    singletons would just memorize words).
    """
    if num_merges < 0:
        raise ValueError("bpe_train: num_merges must be >= 0")
    vocab = _word_counts(df, text_col, lowercase, max_words)
    # word -> (symbol tuple, count); start from characters + EOW on the last
    symbols: dict[int, tuple[tuple[str, ...], int]] = {}
    for i, (w, c) in enumerate(vocab):
        chars = tuple(w[:-1]) + (w[-1] + _EOW,) if w else ()
        if chars:
            symbols[i] = (chars, c)

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in symbols.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # most frequent pair; ties break lexicographically — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words[best]):
            syms, c = symbols[wi]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(wi)
            # apply the merge left-to-right
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_syms = tuple(out)
            symbols[wi] = (new_syms, c)
            for a, b in zip(new_syms, new_syms[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(wi)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by ascending rank (the GPT-2 encoder loop)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + _EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_vocab(merges: Sequence[tuple[str, str]]) -> dict[str, int]:
    """Token→id table implied by a merge list: every merge product, in
    merge order, after the id space of the single characters that appear
    in the merges' components (sorted; deterministic)."""
    chars: set[str] = set()
    for a, b in merges:
        for part in (a, b):
            base = part[:-len(_EOW)] if part.endswith(_EOW) else part
            for ch in base:
                chars.add(ch)
                chars.add(ch + _EOW)
    vocab = {t: i for i, t in enumerate(sorted(chars))}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str,
    text_col: str = "text",
    out_col: str = "tokens",
    lowercase: bool = True,
    vocab: Optional[dict[str, int]] = None,
    keep_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Tokenize every document: ``(id_col, *keep_cols, out_col, n_tokens)``.

    ``out_col`` is ``array<string>`` of subword tokens, or ``array<int>``
    token ids when ``vocab`` is given (tokens missing from the vocab map
    to -1 — the caller decides the UNK policy). Zero shuffles: one
    Arrow-batched mapInPandas pass with a per-executor word→tokens memo.
    Blank/NULL text yields an empty array with n_tokens=0 (the
    ngram_lm_score contract: no rows are lost).
    """
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab_map = dict(vocab) if vocab is not None else None
    keep = list(keep_cols or [])
    src = df.select(id_col, *keep, F.col(text_col).alias("__text"))
    out_type = "array<int>" if vocab_map is not None else "array<string>"
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields[:-1]]
        + [f"`{out_col}` {out_type}", "n_tokens long"]
    )
    # cache key: the merge table + id mapping identify the memo contents;
    # the worker-process-global _WORD_MEMO survives across tasks (Python
    # workers are reused), so the per-word merge loop amortizes across the
    # executor's whole task stream, not just one partition
    cache_key = (hash(tuple(map(tuple, merges))), vocab_map is not None,
                 id(vocab) if vocab is not None else 0, bool(lowercase))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        memo = _WORD_MEMO.setdefault(cache_key, {})

        def words_of(t):
            if t is None:
                return []
            s = t.lower() if lowercase else t
            # ASCII \s+ split, matching the Java regex bpe_train uses —
            # Python str.split() also splits Unicode whitespace (NBSP,
            # U+2028, ideographic space), which would segment a different
            # word population than the one the merges were trained on
            return [w for w in re.split(r"\s+", s, flags=re.ASCII) if w]

        def encode_doc(t):
            toks: list = []
            for w in words_of(t):
                got = memo.get(w)
                if got is None:
                    if len(memo) >= _MEMO_MAX_WORDS:
                        memo.clear()
                    got = _encode_word(w, ranks)
                    if vocab_map is not None:
                        got = [vocab_map.get(s, -1) for s in got]
                    memo[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf["__text"].map(encode_doc)
            res = pdf.drop(columns=["__text"])
            res[out_col] = toks
            res["n_tokens"] = toks.map(len)
            yield res

    return src.mapInPandas(run, schema)


def bpe_token_count(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-doc BPE token counts ``(id_col, n_tokens)`` — the packing-budget
    input (`ops/packing.pack_sequences` consumes exactly this shape)."""
    return bpe_encode(
        df, merges, id_col, text_col=text_col, lowercase=lowercase
    ).select(id_col, "n_tokens")


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str = "text",
    word_col: str = "word",
) -> DataFrame:
    """Per-document vocabulary coverage: (id, n_tokens, n_oov, oov_rate)
    against a word vocabulary (a ``bpe_vocab`` word table, a frequency
    cut of :func:`ops.text.vocabulary`, or any one-column word frame) —
    the tokenizer-QA signal behind "how much of this corpus does my vocab
    actually cover". Blank docs report n_tokens=0 with NULL oov_rate.

    Shape: corpus explodes to words once, BROADCAST-left-joins the vocab
    (vocabularies are small by definition), one per-id aggregation — the
    corpus shuffles only on its own id. Tokenization matches every other
    text operator.
    """
    from .retrieval import _tokens

    words = F.when(
        F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "",
        F.array().cast("array<string>"),
    ).otherwise(_tokens(F.col(text_col)))
    grams = df.select(
        F.col(id_col).alias("__id"), F.explode_outer(words).alias("__w")
    )
    v = F.broadcast(
        vocab.select(F.col(word_col).alias("__w")).distinct()
        .withColumn("__in", F.lit(True))
    )
    joined = grams.join(v, "__w", "left")
    out = joined.groupBy("__id").agg(
        F.count("__w").cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("__w").isNotNull() & F.col("__in").isNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_oov"),
    )
    return out.select(
        F.col("__id").alias(id_col), "n_tokens", "n_oov",
        F.when(F.col("n_tokens") > 0,
               F.col("n_oov").cast("double") / F.col("n_tokens"))
        .alias("oov_rate"),
    )
