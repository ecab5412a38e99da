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

Scale shape: the raw corpus explodes to (id, bucket) once; BOTH corpus
histograms come out of ONE source-tagged union aggregation (map-side
partial combine does the heavy lifting, ≤ num_buckets rows out — no
bucket-keyed join between histograms); the per-bucket log ratio joins back
by BROADCAST, then one per-id aggregation (explode_outer keeps featureless
docs without an id join-back). One small shuffle keyed on bucket, one
keyed on the doc id, zero sort-merge joins — nothing quadratic, no
driver-side state beyond the plan itself.

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
    df: DataFrame,
    id_col,
    text_col: str,
    num_buckets: int,
    hash_fn: str,
    keep_empty: bool = False,
) -> DataFrame:
    """(id, bucket) rows: one per word unigram and bigram occurrence.

    ``keep_empty=True`` uses ``explode_outer`` so a doc with zero features
    (blank text) still yields one row with a NULL bucket — the downstream
    per-doc aggregation then emits it with n_feats=0 instead of a join-back
    against the id set (which cost a sort-merge join in the first cut)."""
    cleaned = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", ""))
    # blank text: split(trim('')) yields [''] — one phantom feature; guard
    # to an empty array so blank docs report n_feats=0
    words = F.when(
        F.coalesce(cleaned, F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(F.split(cleaned, r"\s+"))
    bigrams = F.when(
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
    exploder = F.explode_outer if keep_empty else F.explode
    grams = df.select(F.col(id_col).alias("__id"), words.alias("__w")).select(
        "__id", exploder(F.concat(F.col("__w"), bigrams)).alias("__g")
    )
    return grams.select(
        "__id",
        F.when(
            F.col("__g").isNotNull(),
            F.pmod(
                _seeded_hash64(F.col("__g"), _DSIR_SEED, hash_fn),
                F.lit(num_buckets),
            ),
        ).alias("__b"),
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    target_text_col: Optional[str] = None,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
    cache_features: bool = False,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    ``cache_features=True`` localCheckpoints the raw (id, bucket) rows so
    the histogram pass and the per-doc pass share one featurization
    (measured −33% wall at sf0.1). Default OFF: the feature rows are ~2×
    the corpus token count, and at 100 TB materializing them to executor
    storage costs more than recomputing a scan + regex projection — enable
    it when the featurized corpus comfortably fits cluster storage.

    logw(d) = Σ_{features g of d} [ log p̂_target(bucket(g))
                                    − log p̂_raw(bucket(g)) ]
    with p̂(b) = (count(b) + alpha) / (total + alpha·num_buckets) (Laplace).

    Output: (id_col, n_feats, log_weight) for EVERY raw doc — docs with no
    features (blank text) get n_feats=0, log_weight=0.0; downstream joins
    never lose rows (the ngram_lm_score contract).
    """
    if num_buckets < 1:
        raise ValueError("dsir_importance: num_buckets must be >= 1")
    if alpha <= 0:
        raise ValueError("dsir_importance: alpha must be > 0 (Laplace smoothing)")
    t_col = target_text_col or text_col
    raw_rows = _bucket_rows(raw, id_col, text_col, num_buckets, hash_fn,
                            keep_empty=True)
    if cache_features:
        raw_rows = raw_rows.localCheckpoint(eager=False)
    tgt_rows = _bucket_rows(target, id_col, t_col, num_buckets, hash_fn)

    # BOTH histograms in ONE aggregation: tag the union by source and
    # conditional-count — no bucket-keyed full-outer join (which planned as
    # a sort-merge join in the first cut). ≤ num_buckets rows out.
    tagged = raw_rows.filter(F.col("__b").isNotNull()).select(
        "__b", F.lit(1).alias("__r"), F.lit(0).alias("__t")
    ).unionAll(tgt_rows.select("__b", F.lit(0).alias("__r"), F.lit(1).alias("__t")))
    hist = tagged.groupBy("__b").agg(
        F.sum("__r").alias("__cr"), F.sum("__t").alias("__ct")
    )
    totals = hist.agg(
        F.sum("__cr").alias("__nr"), F.sum("__ct").alias("__nt")
    )
    log_ratio = hist.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log(
                (F.col("__ct") + F.lit(alpha))
                / (F.coalesce(F.col("__nt"), F.lit(0)) + F.lit(alpha * num_buckets))
            )
            - F.log(
                (F.col("__cr") + F.lit(alpha))
                / (F.coalesce(F.col("__nr"), F.lit(0)) + F.lit(alpha * num_buckets))
            )
        ).alias("__lr"),
    )

    # per-doc sum: raw grams broadcast-join the ≤num_buckets-row ratio
    # table; explode_outer rows (null bucket = featureless doc) fall through
    # the left join and aggregate to (0, 0.0) — no id join-back needed
    return (
        raw_rows.join(F.broadcast(log_ratio), "__b", "left")
        .groupBy("__id")
        .agg(
            F.count(F.col("__b")).alias("n_feats"),
            F.coalesce(F.sum("__lr"), F.lit(0.0)).alias("log_weight"),
        )
        .select(
            F.col("__id").alias(id_col), "n_feats", "log_weight"
        )
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
    cache_features: bool = False,
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
        cache_features=cache_features,
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


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    id_col: str,
    token_col: Optional[str] = None,
    text_col: str = "text",
    num_ranges: Optional[int] = None,
) -> DataFrame:
    """Greedy best-first selection under a token budget: order documents by
    ``score_col`` DESC (ties break on ``id_col``), keep the maximal prefix
    whose cumulative token count stays <= ``budget`` ("take the best N
    billion tokens"). Adds a ``cum_tokens`` column (running total INCLUDING
    the row). Token counts come from ``token_col`` if given, else
    whitespace tokens of ``text_col``.

    NULL token counts (NULL ``token_col`` or NULL text) count as 0 —
    such rows are kept for free; filter upstream if unknown-length docs
    must not be selected. Greedy prefix, not a knapsack: a doc is skipped
    only if everything better-scored already exhausted the budget — the standard curation
    semantics (quality-ranked corpus truncation, e.g. the DCLM/FineWeb
    "top-k% by classifier score" recipe expressed in tokens).

    Scale: a global cumulative sum WITHOUT a single-partition window.
    (1) range-repartition by (score desc, id) — one shuffle, Spark samples
    range bounds; (2) per-partition sort + per-partition running sum
    (window partitioned BY the range id, so every partition cumsums
    independently); (3) per-partition token totals (num_ranges rows) are
    collected, prefix-summed on the driver, and rejoined as a broadcast
    offset. Driver contact: num_ranges longs. The plan survives 100 TB —
    the classic two-pass distributed prefix-sum.
    """
    from pyspark.sql import Window

    from .text import whitespace_token_count

    tokens = F.coalesce(
        (
            F.col(token_col)
            if token_col
            else whitespace_token_count(F.col(text_col))
        ).cast("long"),
        F.lit(0),
    )
    n_parts = num_ranges or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranked = (
        df.withColumn("__tok", tokens)
        .repartitionByRange(int(n_parts), F.col(score_col).desc(), F.col(id_col))
        .sortWithinPartitions(F.col(score_col).desc(), F.col(id_col))
        .withColumn("__part", F.spark_partition_id())
    )
    ranked = ranked.persist()
    w = (
        Window.partitionBy("__part")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ranked.withColumn("__cum_in", F.sum("__tok").over(w))
    # per-partition totals -> driver prefix offsets (num_ranges rows only),
    # rejoined as a broadcast table (a literal CASE chain would bloat the
    # plan past a few hundred ranges)
    totals = {
        r["__part"]: r["__t"] or 0
        for r in ranked.groupBy("__part").agg(F.sum("__tok").alias("__t")).collect()
    }
    offsets, acc = [], 0
    for p in sorted(totals):
        offsets.append((p, acc))
        acc += totals[p]
    if offsets:
        off_df = df.sparkSession.createDataFrame(offsets, "__part int, __off long")
        within = within.join(F.broadcast(off_df), "__part", "left")
    else:
        within = within.withColumn("__off", F.lit(0).cast("long"))
    return (
        within.withColumn(
            "cum_tokens", F.col("__cum_in") + F.coalesce(F.col("__off"), F.lit(0))
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__tok", "__part", "__cum_in", "__off")
    )


def cap_per_group(
    df: DataFrame,
    group_cols,
    id_col: str,
    max_rows: Optional[int] = None,
    token_budget: Optional[int] = None,
    score_col: Optional[str] = None,
    token_col: Optional[str] = None,
    text_col: str = "text",
) -> DataFrame:
    """Cap each group's contribution, best-first: within every group (the
    canonical case is the URL domain — SEO farms and boilerplate mills
    otherwise dominate a crawl) rank rows by ``score_col`` DESC (ties, or
    no score at all, break on ``id_col``) and keep at most ``max_rows``
    rows and/or rows while the group's cumulative token count stays <=
    ``token_budget`` (NULL token counts count as 0 — kept for free). At
    least one cap must be given. Adds nothing; drops
    the rank/cumsum scaffolding.

    Scale: ONE shuffle on the group key (the window); groups cumsum
    independently, so no global ordering exists anywhere — this is the
    per-group analog of :func:`select_token_budget` and composes with it
    (cap domains first, then cut the global budget).
    """
    from pyspark.sql import Window

    from .text import whitespace_token_count

    if max_rows is None and token_budget is None:
        raise ValueError("give max_rows and/or token_budget")
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = (
        [F.col(score_col).desc_nulls_last(), F.col(id_col)]
        if score_col
        else [F.col(id_col)]
    )
    w = Window.partitionBy(*gcols).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w))
    keep = F.lit(True)
    if max_rows is not None:
        keep = keep & (F.col("__rn") <= max_rows)
    drop = ["__rn"]
    if token_budget is not None:
        tokens = F.coalesce(
            (
                F.col(token_col)
                if token_col
                else whitespace_token_count(F.col(text_col))
            ).cast("long"),
            F.lit(0),
        )
        cum = F.sum(tokens).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn("__cum", cum)
        keep = keep & (F.col("__cum") <= token_budget)
        drop.append("__cum")
    return out.filter(keep).drop(*drop)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    key_col: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``n`` rows drawn with
    probability proportional to ``weight_col`` (Efraimidis–Spirakis A-ES:
    rank by log(u)/w with u a deterministic per-row uniform from the
    seeded id hash — retry- and partition-stable, never ``rand()``).

    Rows with NULL or non-positive weight are excluded (they have zero
    draw probability). ``id_col`` must be non-NULL — a NULL id has no
    deterministic uniform, so the draw would be silently biased; the job
    fails loudly if one appears (the check is an in-expression guard, not
    an extra scan). The cut is a TakeOrderedAndProject (no global sort);
    ties break on the id. Adds ``key_col`` (the A-ES rank key) so repeated
    draws with larger ``n`` are strict supersets — the standard
    reproducible-subsample contract.
    """
    if n < 1:
        raise ValueError("weighted_sample: n must be >= 1")
    if key_col in df.columns:
        # withColumn would silently OVERWRITE user data (and sample_n then
        # drops it) — mirror the top_k '__rk' collision guard
        raise ValueError(
            f"weighted_sample: key_col {key_col!r} already exists in the "
            "input — pass a different key_col"
        )
    id_str = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"weighted_sample: NULL value in id_col {id_col!r}")),
    ).otherwise(F.col(id_col).cast("string"))
    u = (
        F.pmod(
            _seeded_hash64(id_str, seed, hash_fn),
            F.lit(2**31),
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**31 + 1))  # u in (0, 1): log stays finite
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(n)
    )


def calibrate_scores(
    df: DataFrame,
    score_col: str,
    group_cols=None,
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-group percentile calibration of a raw score: ``out_col`` is the
    score's percent-rank in [0, 1] WITHIN its group, so one global
    threshold works across groups whose raw-score scales differ (the
    classic per-language quality-score problem — a perplexity of 500 is
    great for Finnish and terrible for English).

    Semantics: rank-based (ties share a percentile, like SQL
    percent_rank); NULL scores get NULL (they carry no evidence — route
    them with an explicit filter); a single-score group calibrates to 0.0.
    One window shuffle keyed on the group columns; NULL group values form
    their own group. Deterministic — same inputs, same percentiles, any
    partitioning. Replayable in DuckDB (rank + count share definitions),
    so cross-engine hash-verifiable without an md5 variant.
    """
    from pyspark.sql.window import Window

    groups = (
        [] if group_cols is None
        else [group_cols] if isinstance(group_cols, str)
        else list(group_cols)
    )
    score = F.col(score_col)
    # NULLS FIRST so null rows occupy ranks 1..n_nulls and rank() (not
    # dense_rank) puts the first non-null at n_nulls + 1: subtracting the
    # null count yields percent_rank over the non-null subset exactly
    w_ord = Window.partitionBy(*groups).orderBy(score.asc_nulls_first())
    w_all = Window.partitionBy(*groups)
    n_nonnull = F.count(score).over(w_all)
    n_nulls = F.count(F.lit(1)).over(w_all) - n_nonnull
    adj = F.rank().over(w_ord) - n_nulls
    pct = (
        F.when(score.isNull(), F.lit(None).cast("double"))
        .when(n_nonnull <= 1, F.lit(0.0))
        .otherwise((adj - F.lit(1)).cast("double") / (n_nonnull - F.lit(1)))
    )
    return df.withColumn(out_col, pct)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    key_col: str = "sample_key",
) -> DataFrame:
    """``n`` rows PER GROUP, drawn without replacement with probability
    proportional to ``weight_col`` (the grouped form of
    :func:`weighted_sample`, same Efraimidis–Spirakis keys): rank the A-ES
    key within each group, keep the top ``n``. One window shuffle on the
    group columns; NULL/non-positive weights are excluded, NULL ids fail
    loudly (the weighted_sample contract); larger ``n`` gives supersets.
    """
    from pyspark.sql.window import Window

    if n < 1:
        raise ValueError("weighted_sample_per_group: n must be >= 1")
    if key_col in df.columns:
        raise ValueError(
            f"weighted_sample_per_group: key_col {key_col!r} already exists "
            "in the input — pass a different key_col"
        )
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    id_str = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"weighted_sample_per_group: NULL value in id_col {id_col!r}")
        ),
    ).otherwise(F.col(id_col).cast("string"))
    u = (
        F.pmod(_seeded_hash64(id_str, seed, hash_fn), F.lit(2**31)).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**31 + 1))
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        key_col, F.log(u) / w
    )
    rn = F.row_number().over(
        Window.partitionBy(*groups).orderBy(F.col(key_col).desc(), F.col(id_col))
    )
    return keyed.withColumn("__rn", rn).filter(F.col("__rn") <= n).drop("__rn")
