"""Data selection for LM training: DSIR hashed n-gram importance weights.

Implements the importance-resampling recipe of Xie et al., "Data Selection
for Language Models via Importance Resampling" (NeurIPS 2023, public):
score every RAW document by how much more likely its hashed n-gram features
are under a TARGET distribution (e.g. a high-quality domain corpus) than
under the raw distribution, then keep the highest-weight (or
gumbel-resampled) documents. No reference counterpart (spec addition) —
this is the standard targeted-data-mix pass a 100-TB pretraining pipeline
runs between quality filtering and packing.

Features: word unigrams + bigrams hashed into ``num_buckets`` counts
(the paper's hashed n-gram parameterization). Both corpus distributions are
Laplace-smoothed bucket histograms — ``num_buckets`` rows each, tiny next
to the corpus, broadcast back for the per-document weight sum.

Scale shape: the raw corpus explodes to (id, bucket) once; the two
histogram aggregates reduce to ``num_buckets``-row tables (map-side partial
combine does the heavy lifting); the log-ratio per bucket joins back by
BROADCAST, then one per-id aggregation. Two small shuffles keyed on bucket,
one keyed on the doc id — nothing quadratic, no driver-side state beyond
the plan itself.

``hash_fn="md5"`` uses the portable hash family every SQL engine
reproduces, so the whole path (bucketing included) is DuckDB-verifiable;
"xxhash64" (default) is the faster production family.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _seeded_hash64

# seed for the DSIR feature hash (any fixed constant; distinct from the
# bloom/minhash seed spaces so feature spaces never collide by construction)
_DSIR_SEED = 0x5D51


def _bucket_rows(
    df: DataFrame, id_col, text_col: str, num_buckets: int, hash_fn: str
) -> DataFrame:
    """(id, bucket) rows: one per word unigram and bigram occurrence."""
    cleaned = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", ""))
    # blank text: split(trim('')) yields [''] — one phantom feature; guard
    # to an empty array so blank docs report n_feats=0
    words = F.when(
        F.coalesce(cleaned, F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(F.split(cleaned, r"\s+"))
    df = df.select(F.col(id_col).alias("__id"), words.alias("__w"))
    unigrams = df.select("__id", F.explode("__w").alias("__g"))
    bigrams = df.select(
        "__id",
        F.explode(
            F.when(
                F.size("__w") < 2, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("__w"), i + 1),
                        F.element_at(F.col("__w"), i + 2),
                    ),
                )
            )
        ).alias("__g"),
    )
    grams = unigrams.unionAll(bigrams)
    return grams.select(
        "__id",
        F.pmod(
            _seeded_hash64(F.col("__g"), _DSIR_SEED, hash_fn), F.lit(num_buckets)
        ).alias("__b"),
    )


def _bucket_hist(rows: DataFrame) -> DataFrame:
    return rows.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    target_text_col: Optional[str] = None,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    logw(d) = Σ_{features g of d} [ log p̂_target(bucket(g))
                                    − log p̂_raw(bucket(g)) ]
    with p̂(b) = (count(b) + alpha) / (total + alpha·num_buckets) (Laplace).

    Output: (id_col, n_feats, log_weight) for EVERY raw doc — docs with no
    features (blank text) get n_feats=0, log_weight=0.0; downstream joins
    never lose rows (the ngram_lm_score contract).
    """
    t_col = target_text_col or text_col
    raw_rows = _bucket_rows(raw, id_col, text_col, num_buckets, hash_fn)
    tgt_rows = _bucket_rows(target, id_col, t_col, num_buckets, hash_fn)

    # the two histograms + totals: num_buckets rows each, broadcast class
    raw_hist = _bucket_hist(raw_rows.select("__b"))
    tgt_hist = _bucket_hist(tgt_rows.select("__b"))
    log_ratio = (
        raw_hist.withColumnRenamed("__c", "__cr")
        .join(tgt_hist.withColumnRenamed("__c", "__ct"), "__b", "full_outer")
        .crossJoin(
            F.broadcast(
                raw_hist.agg(F.sum("__c").alias("__nr")).crossJoin(
                    tgt_hist.agg(F.sum("__c").alias("__nt"))
                )
            )
        )
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("__nt"), F.lit(0)) + F.lit(alpha * num_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("__nr"), F.lit(0)) + F.lit(alpha * num_buckets))
                )
            ).alias("__lr"),
        )
    )

    scored = (
        raw_rows.join(F.broadcast(log_ratio), "__b", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__lr").alias("log_weight"),
        )
    )
    ids = raw.select(F.col(id_col).alias("__id")).dropDuplicates()
    return ids.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    n: int,
    text_col: str = "text",
    num_buckets: int = 8192,
    alpha: float = 1.0,
    seed: int = 42,
    gumbel: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Select ``n`` raw documents by importance weight.

    ``gumbel=True`` (paper's sampling-without-replacement): rank by
    logw(d) + G_d where G_d = −log(−log(u_d)) and u_d is a DETERMINISTIC
    per-doc uniform derived from the seeded doc-id hash — retry- and
    partition-stable, unlike rand(). ``gumbel=False`` takes the top-n
    weights outright. Ties (and the top-n cut) break on the id. The cut is
    a TakeOrderedAndProject — no global sort."""
    w = dsir_importance(
        raw, target, id_col, text_col=text_col,
        num_buckets=num_buckets, alpha=alpha, hash_fn=hash_fn,
    )
    key = F.col("log_weight")
    if gumbel:
        u = (
            F.pmod(
                _seeded_hash64(F.col(id_col).cast("string"), seed, hash_fn),
                F.lit(2**31),
            ).cast("double")
            + F.lit(1.0)
        ) / F.lit(float(2**31 + 1))  # u in (0, 1): both log() calls finite
        key = key + (-F.log(-F.log(u)))
    return (
        w.select(id_col, "n_feats", "log_weight", key.alias("rank_key"))
        .orderBy(F.col("rank_key").desc(), F.col(id_col))
        .limit(n)
    )
