"""BPE tokenizer (ops/tokenize) — classic Sennrich merge semantics on the
textbook corpus, a from-scratch Python reference differential (training AND
encoding), round-trip/edge cases, and the zero-shuffle plan guard."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import tokenize
from datachain_spark.plans import shuffle_count


def _docs(session, texts):
    return session.spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------- Python reference
def _ref_train(word_counts, num_merges):
    """Unindexed from-scratch BPE trainer (recount every round)."""
    words = {
        w: (tuple(w[:-1]) + (w[-1] + "</w>",), c) for w, c in word_counts.items() if w
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_words = {}
        for w, (syms, c) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words[w] = (tuple(out), c)
        words = new_words
    return merges


def _ref_encode(word, merges):
    """Apply merges in training order (equivalent to rank order for a
    single word, since earlier merges are prerequisites of later ones)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    for a, b in merges:
        j = 0
        while j < len(syms) - 1:
            if syms[j] == a and syms[j + 1] == b:
                syms[j:j + 2] = [a + b]
            else:
                j += 1
    return syms


# ------------------------------------------------------------------ tests
def test_bpe_textbook_corpus(session):
    """The Sennrich et al. running example: low/lower/newest/widest."""
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = _docs(session, [" ".join(texts)])
    merges = tokenize.bpe_train(docs, num_merges=4)
    # ('e','s') and ('s','t</w>') both appear 9x (newest+widest); the
    # lexicographic tie-break picks ('e','s'), then ('es','t</w>') at 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    assert merges[2] == ("l", "o")  # 7x (low+lower)
    out = {r["doc_id"]: r for r in
           tokenize.bpe_encode(_docs(session, ["newest", "lowest"]),
                               merges, "doc_id").collect()}
    assert out[0]["tokens"][-1] == "est</w>"
    assert out[1]["tokens"][-1] == "est</w>"  # generalizes to unseen 'lowest'


def test_bpe_differential_vs_reference(session):
    """Train + encode must match an independent from-scratch implementation
    on a mixed corpus."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker brown foxes jumped over lazy dogs",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "the jay pig fox zebra and my wolves quack",
    ] * 3
    docs = _docs(session, texts)
    merges = tokenize.bpe_train(docs, num_merges=40)
    wc = Counter(w for t in texts for w in t.lower().split())
    assert merges == _ref_train(wc, 40)

    enc = {r["doc_id"]: list(r["tokens"]) for r in
           tokenize.bpe_encode(docs, merges, "doc_id").collect()}
    for i, t in enumerate(texts):
        expect = [s for w in t.lower().split() for s in _ref_encode(w, merges)]
        assert enc[i] == expect, f"doc {i}"


def test_bpe_encode_ids_and_counts(session):
    docs = _docs(session, ["aa ab aa", "ab aa", ""])
    merges = tokenize.bpe_train(docs, num_merges=2)
    vocab = tokenize.bpe_vocab(merges)
    out = {r["doc_id"]: r for r in
           tokenize.bpe_encode(docs, merges, "doc_id", vocab=vocab).collect()}
    assert all(isinstance(t, int) for t in out[0]["tokens"])
    assert out[0]["n_tokens"] == len(out[0]["tokens"])
    assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0  # blank survives
    counts = {r["doc_id"]: r["n_tokens"] for r in
              tokenize.bpe_token_count(docs, merges, "doc_id").collect()}
    assert counts == {i: out[i]["n_tokens"] for i in out}


def test_bpe_no_merges_chars_and_null_text(session):
    docs = session.spark.createDataFrame(
        [(1, "ab"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           tokenize.bpe_encode(docs, [], "doc_id").collect()}
    assert list(out[1]["tokens"]) == ["a", "b</w>"]
    assert list(out[2]["tokens"]) == [] and out[2]["n_tokens"] == 0


def test_bpe_determinism_and_early_stop(session):
    docs = _docs(session, ["x y z"])  # no pair occurs twice
    assert tokenize.bpe_train(docs, num_merges=10) == []
    docs2 = _docs(session, ["ab ab ba ba"])  # tie: ('a','b</w>') vs ('b','a</w>')
    m1 = tokenize.bpe_train(docs2, num_merges=1)
    m2 = tokenize.bpe_train(docs2.repartition(7), num_merges=1)
    assert m1 == m2 == [("a", "b</w>")]  # lexicographic tie-break, stable


def test_bpe_keep_cols_and_zero_shuffle_plan(session):
    docs = session.spark.createDataFrame(
        [(1, "en", "aa ab"), (2, "fr", "ab")],
        "doc_id long, lang string, text string",
    )
    merges = [("a", "a</w>")]
    out = tokenize.bpe_encode(docs, merges, "doc_id", keep_cols=["lang"])
    assert shuffle_count(out) == 0, "encode must not shuffle"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["lang"] == "en" and list(rows[1]["tokens"]) == ["aa</w>", "a", "b</w>"]


def test_bpe_counts_feed_pack_sequences(session):
    """The pipeline composition: BPE token counts are the packing budget."""
    from datachain_spark.ops import packing

    docs = _docs(session, ["aa ab aa ab", "ab aa", "aa aa aa"])
    merges = tokenize.bpe_train(docs, num_merges=2)
    counts = tokenize.bpe_token_count(docs, merges, "doc_id")
    packed = packing.pack_sequences(
        counts, id_col="doc_id", token_col="n_tokens",
        max_tokens=8, num_shards=2,
    )
    rows = packed.collect()
    assert len(rows) == 3
    assert all(r["offset_end"] - r["offset_start"] == r["n_tokens"] for r in rows)


def test_bpe_validates_inputs(session):
    with pytest.raises(ValueError, match="num_merges"):
        tokenize.bpe_train(_docs(session, ["x"]), num_merges=-1)


def test_bpe_train_ignores_leading_whitespace_artifacts(session):
    # Spark trim strips only spaces: tab/newline-led text must not
    # contribute a '' word to the frequency table
    docs = _docs(session, ["\tab ab\n", "ab ab"])
    merges = tokenize.bpe_train(docs, num_merges=1)
    assert merges == [("a", "b</w>")]


def test_bpe_encode_ascii_split_matches_training(session):
    # NBSP is NOT a separator for either trainer (Java \s+) or encoder
    # (ASCII re.split): 'a\xa0b' stays ONE word on both sides
    docs = _docs(session, ["a\xa0b a\xa0b stu"])
    merges = tokenize.bpe_train(docs, num_merges=1)
    out = tokenize.bpe_encode(docs, merges, "doc_id").collect()[0]
    # 3 words total, each word's symbols end with the EOW marker
    assert out["tokens"][-1] == "u</w>"
    joined = "".join(out["tokens"])
    assert joined.count("</w>") == 3
