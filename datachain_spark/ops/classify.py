"""Hashed-feature Naive-Bayes text classification (train + score).

The distributed, oracle-able analog of the fastText-style linear
classifiers LLM pipelines use for quality/domain/language filtering
(CCNet's fastText langid, DCLM's quality classifier): train a multinomial
Naive Bayes over hashed word uni+bigram features on a small LABELED seed,
then score an arbitrarily large corpus with a broadcast model. No
reference counterpart (spec addition) — the reference ships no trainable
classifier; this is the classifier-gating pass of a pretraining pipeline
re-expressed Spark-first.

Why Naive Bayes (and not logistic regression): training is ONE
aggregation — per-(label, bucket) counts with map-side partial combine —
so it needs no iterative driver loop, and every count (and therefore every
posterior) is exactly reproducible in DuckDB SQL, which makes the whole
train→score path value-hash verifiable. Accuracy on
language/domain-separation tasks is on par with linear models at this
feature scale.

Scale shape:
- ``nb_train``: labeled seed explodes to (label, bucket) feature rows;
  ONE groupBy(label, bucket) with map-side combine → model of
  ≤ n_labels × num_buckets rows (tiny, broadcastable); per-label totals
  ride a window over the aggregated frame, doc priors come from one
  groupBy(label) on the seed. No joins against the corpus.
- ``nb_classify``: the corpus explodes to (id, bucket) ONCE; a
  crossJoin against the ≤n_labels-row label table and a BROADCAST left
  join against the model produce per-(feature, label) log-probs — the
  corpus itself never shuffles for the join. Cost is n_labels × feature
  rows; intended for small label sets (binary quality gates, ~dozens of
  languages), which is the production regime. Two keyed aggregations
  ((id, label) then id) finish the argmax. Blank docs survive with
  n_feats=0 and a prior-only prediction (the ngram_lm_score contract:
  downstream joins never lose rows).

``hash_fn="md5"`` is the portable hash family every engine reproduces
(DuckDB-verifiable end to end); "xxhash64" (default) is the faster
production family. Feature space (cleaning, uni+bigrams, seed) is shared
with DSIR (`ops/selection._bucket_rows`) so calibration work transfers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .selection import _bucket_rows


def nb_train(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_buckets: int = 8192,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Train a multinomial NB model from a labeled seed corpus.

    Returns the model as a small DataFrame (≤ n_labels × num_buckets
    rows) with columns:

    - ``label`` — class label (cast to string)
    - ``bucket`` — hashed feature bucket observed under that label
    - ``feat_count`` — occurrences of that bucket in that label's docs
    - ``label_feats`` — total feature occurrences for the label
    - ``label_docs`` — number of seed docs with the label (prior numerator)
    - ``total_docs`` — total seed docs (prior denominator)

    The model is denormalized so ``nb_classify`` (and a SQL oracle) can
    score without re-touching the seed. ``num_buckets`` and ``hash_fn``
    are part of the feature space — pass the SAME values to
    ``nb_classify`` (they are deliberately not smuggled through the
    model frame, which would force a driver-side collect to recover
    them).
    """
    if num_buckets < 1:
        raise ValueError("nb_train: num_buckets must be >= 1")
    # NULL labels are excluded up front (and from total_docs): letting
    # them through would silently vanish from the model at the label join
    # while still deflating every prior via the total
    lab = labeled.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("string").alias("label"),
        F.col(text_col).alias("__text"),
    )
    # the "id" handed to the featurizer IS the label: training only needs
    # (label, bucket) counts, so no join-back against the seed is needed
    rows = _bucket_rows(lab, "label", "__text", num_buckets, hash_fn)
    feats = rows.groupBy(
        F.col("__id").alias("label"), F.col("__b").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("feat_count"))
    from pyspark.sql import Window

    w = Window.partitionBy("label")
    feats = feats.withColumn("label_feats", F.sum("feat_count").over(w))
    docs = lab.groupBy("label").agg(F.count(F.lit(1)).alias("label_docs"))
    totals = docs.agg(F.sum("label_docs").alias("total_docs"))
    return (
        feats.join(F.broadcast(docs), "label")
        .crossJoin(F.broadcast(totals))
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_buckets: int = 8192,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
    persist_model: bool = True,
) -> DataFrame:
    """Score every document against a broadcast NB model.

    log P(label | d) ∝ log(label_docs / total_docs)
                     + Σ_{features g} log p̂(bucket(g) | label)
    with p̂(b|label) = (feat_count + alpha) / (label_feats + alpha·num_buckets)
    (Laplace smoothing; unseen (label, bucket) pairs fall through the
    left join to feat_count = 0).

    Output, one row per input doc: ``(id_col, n_feats, pred_label,
    log_joint, margin)`` — ``pred_label`` is the argmax label (ties break
    on the LARGER label string, deterministically), ``log_joint`` its
    unnormalized log posterior, ``margin`` the log-odds gap to the
    runner-up label (NULL when the model has a single label). Gate on
    ``margin`` for precision/recall trade-offs, exactly like a fastText
    confidence threshold.

    ``num_buckets``, ``alpha``, ``hash_fn`` must match training.
    ``persist_model`` (default) localCheckpoints the model frame so its
    plan (the whole seed aggregation when passed straight from
    ``nb_train``) runs once instead of twice — once for the label-stat
    collect, once for the per-bucket broadcast; disable when the caller
    already persisted it.
    """
    if alpha <= 0:
        raise ValueError("nb_classify: alpha must be > 0 (Laplace smoothing)")
    import math

    if persist_model:
        model = model.localCheckpoint(eager=False)

    # driver contact: the k label-stat rows only (k = number of classes —
    # the num_cells-centroid class of contact, never the model body)
    stats = sorted(
        model.select("label", "label_feats", "label_docs", "total_docs")
        .distinct()
        .collect(),
        key=lambda r: r["label"],
    )
    if not stats:
        raise ValueError("nb_classify: empty model (no labels)")
    k = len(stats)
    priors = [
        math.log(r["label_docs"] / r["total_docs"]) for r in stats
    ]
    # per-label log-prob an UNSEEN (label, bucket) pair gets — the Laplace
    # floor; also the fill-in for buckets the model never saw at all
    floors = [
        math.log(alpha / (r["label_feats"] + alpha * num_buckets)) for r in stats
    ]

    # model pre-aggregated per bucket into a FIXED-label-order log-prob
    # array (≤ num_buckets rows — broadcast-sized by construction)
    mw = model.groupBy(F.col("bucket").alias("__b")).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("label"), F.col("feat_count")))
        ).alias("__m")
    )
    arr = F.array(*[
        F.log(
            (F.coalesce(F.try_element_at("__m", F.lit(r["label"])), F.lit(0))
             + F.lit(alpha))
            / F.lit(r["label_feats"] + alpha * num_buckets)
        )
        for r in stats
    ])
    mw = mw.select("__b", arr.alias("__larr"))

    # corpus explodes ONCE; one broadcast join; ONE shuffle (groupBy id)
    # with k codegen'd sum columns — no per-label row multiplication
    rows = _bucket_rows(df, id_col, text_col, num_buckets, hash_fn, keep_empty=True)
    joined = rows.join(F.broadcast(mw), "__b", "left")
    eff = F.when(
        F.col("__b").isNull(), F.array(*[F.lit(0.0)] * k)
    ).otherwise(
        F.coalesce(F.col("__larr"), F.array(*[F.lit(f) for f in floors]))
    )
    joined = joined.select("__id", "__b", eff.alias("__e"))
    agg = joined.groupBy("__id").agg(
        F.count(F.col("__b")).alias("n_feats"),
        *[
            (F.sum(F.col("__e")[i]) + F.lit(priors[i])).alias(f"__lj{i}")
            for i in range(k)
        ],
    )
    # argmax + runner-up over k columns: struct comparison orders by
    # (log_joint, label), so array_sort descends to exactly the documented
    # tie-break (larger label wins on equal posterior)
    ranked = F.reverse(
        F.array_sort(
            F.array(*[
                F.struct(
                    F.col(f"__lj{i}").alias("lj"),
                    F.lit(stats[i]["label"]).alias("label"),
                )
                for i in range(k)
            ])
        )
    )
    agg = agg.select("__id", "n_feats", ranked.alias("__a"))
    top = F.col("__a")[0]
    return agg.select(
        F.col("__id").alias(id_col),
        "n_feats",
        top["label"].alias("pred_label"),
        top["lj"].alias("log_joint"),
        (
            (top["lj"] - F.col("__a")[1]["lj"]) if k > 1
            else F.lit(None).cast("double")
        ).alias("margin"),
    )


def nb_filter(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    keep_label: str,
    text_col: str = "text",
    min_margin: float = 0.0,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep only docs the model assigns ``keep_label`` with at least
    ``min_margin`` log-odds over the runner-up — the classifier quality
    gate. Single-label models pass every predicted doc (margin is NULL).
    The corpus joins its own prediction on the id — one keyed join; at
    100 TB prefer persisting ``nb_classify`` output once and gating many
    downstream consumers off it."""
    preds = nb_classify(
        df, model, id_col, text_col=text_col,
        num_buckets=num_buckets, alpha=alpha, hash_fn=hash_fn,
    )
    keep = preds.filter(
        (F.col("pred_label") == keep_label)
        & (F.col("margin").isNull() | (F.col("margin") >= F.lit(min_margin)))
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
