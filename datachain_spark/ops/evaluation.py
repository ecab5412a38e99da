"""Model-quality evaluation over scored corpora: confusion matrices,
per-class precision/recall/F1, precision-recall curves at score
thresholds, and regression error metrics.

The companions to ``ops/classify`` (gate calibration: pick the NB/quality
threshold from the PR table, then filter) and to any scored dataset.

Scale shape: every metric here is ONE aggregation (or one aggregation +
a window over a BOUNDED frame — #classes or #thresholds rows, never the
data). The classic sort-every-row PR curve is deliberately replaced by a
threshold-grid formulation: scores bucket into the grid in the scan, the
cumulative pass runs over #thresholds rows — at 100 TB a global sort for
a curve nobody reads at row granularity is pure waste. No reference
counterpart (spec addition).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "confusion_matrix", "classification_report", "pr_at_thresholds",
    "regression_metrics",
]


def confusion_matrix(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """(label, pred, n) counts — one groupBy. NULL labels/predictions
    count as their own row (they usually mean a scoring bug worth seeing,
    not dropping)."""
    return (
        df.groupBy(F.col(label_col).alias("label"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class (class, n_true, n_pred, tp, precision, recall, f1) from
    ONE scan: the confusion counts aggregate once, and the per-class
    sums run over the #classes² confusion frame, not the data. Classes
    appearing only as labels or only as predictions still get a row
    (their precision/recall degrade to NULL/0 honestly — 0/0 is NULL).
    """
    cm = confusion_matrix(df, label_col, pred_col)
    as_label = cm.groupBy(F.col("label").alias("class")).agg(
        F.sum("n").alias("n_true"),
        F.sum(F.when(F.col("label").eqNullSafe(F.col("pred")), F.col("n"))
              .otherwise(F.lit(0))).alias("tp"),
    )
    as_pred = cm.groupBy(F.col("pred").alias("__pclass")).agg(
        F.sum("n").alias("n_pred")
    )
    # NULL-SAFE full join: the NULL class must merge into ONE row (a plain
    # equi-join splits it into a label-side and a pred-side row)
    rep = as_label.join(
        as_pred, F.col("class").eqNullSafe(F.col("__pclass")), "full"
    ).select(
        # coalesce is right in every case: pred-only classes surface via
        # __pclass; a genuinely-NULL class is NULL on whichever sides it
        # appears and stays NULL
        F.coalesce("class", "__pclass").alias("class"),
        F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
        F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
    )
    precision = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    recall = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true"))
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & ((precision + recall) > 0),
        2 * precision * recall / (precision + recall),
    )
    return rep.select(
        "class", "n_true", "n_pred", "tp",
        precision.alias("precision"), recall.alias("recall"), f1.alias("f1"),
    )


def pr_at_thresholds(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: Sequence[float],
    positive: object = True,
) -> DataFrame:
    """Precision/recall/F1 of the gate ``score >= t`` for each threshold:
    one row per t with (threshold, n_kept, tp, precision, recall, f1).

    ONE data aggregation: each row contributes to every threshold it
    clears via a conditional-sum pair per threshold (codegen, no explode,
    no sort); rows with NULL scores never pass any gate. The calibration
    table behind "keep everything the quality model scores above X".
    """
    ts = sorted(set(float(t) for t in thresholds))
    if not ts:
        raise ValueError("pr_at_thresholds: thresholds must be non-empty")
    s = F.col(score_col).cast("double")
    is_pos = F.col(label_col).eqNullSafe(F.lit(positive))
    # coalesce: F.sum over ZERO rows is NULL — an empty/fully-filtered
    # input must report 0 kept / 0 tp, not NULLs
    z = lambda c: F.coalesce(c, F.lit(0))  # noqa: E731
    aggs = [
        z(F.sum(F.when(is_pos, 1).otherwise(0))).alias("__pos_total"),
    ]
    for i, t in enumerate(ts):
        kept = s >= F.lit(t)
        aggs.append(z(F.sum(F.when(kept, 1).otherwise(0))).alias(f"__k{i}"))
        aggs.append(
            z(F.sum(F.when(kept & is_pos, 1).otherwise(0))).alias(f"__tp{i}")
        )
    one = df.agg(*aggs)
    rows = []
    for i, t in enumerate(ts):
        rows += [F.lit(t), F.col(f"__k{i}"), F.col(f"__tp{i}")]
    stacked = one.select(
        F.col("__pos_total"),
        F.stack(F.lit(len(ts)), *rows).alias("threshold", "n_kept", "tp"),
    )
    precision = F.when(F.col("n_kept") > 0, F.col("tp") / F.col("n_kept"))
    recall = F.when(F.col("__pos_total") > 0, F.col("tp") / F.col("__pos_total"))
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & ((precision + recall) > 0),
        2 * precision * recall / (precision + recall),
    )
    return stacked.select(
        "threshold",
        F.col("n_kept").cast("long"),
        F.col("tp").cast("long"),
        precision.alias("precision"), recall.alias("recall"), f1.alias("f1"),
    )


def regression_metrics(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """One row: (n, mae, rmse, r2) from ONE aggregation. Sums of absolute
    and squared errors go through exact DECIMAL so the metrics are
    fold-order independent — same inputs, same bits, any partitioning
    (cross-ENGINE the per-row double->DECIMAL quantization may differ by
    one ulp at rounding ties: compare at significant digits there); rows
    where either side is NULL are excluded (reported via n). R² uses the
    two-pass-free identity Σ(y−ŷ)²/Σ(y−ȳ)² with Σ(y−ȳ)² = Σy² − (Σy)²/n
    — exact under DECIMAL sums. A constant label column yields NULL r2.
    """
    y = F.col(label_col).cast("double")
    p = F.col(pred_col).cast("double")
    both = y.isNotNull() & p.isNotNull()
    err = F.when(both, y - p)
    # DECIMAL(38,6): 32 integer digits bounds |values| and |errors| at
    # ~3e15 before x² overflows the exact accumulator — beyond that ANSI
    # fails LOUDLY (NUMERIC_VALUE_OUT_OF_RANGE; rescale the label first),
    # never a silent drop
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    one = df.agg(
        F.count(F.when(both, 1)).cast("long").alias("n"),
        F.sum(dec(F.abs(err))).alias("__sae"),
        F.sum(dec(err * err)).alias("__sse"),
        F.sum(dec(F.when(both, y))).alias("__sy"),
        F.sum(dec(F.when(both, y * y))).alias("__syy"),
    )
    n = F.col("n")
    sse = F.col("__sse").cast("double")
    sst = F.col("__syy").cast("double") - (
        F.col("__sy").cast("double") * F.col("__sy").cast("double") / n
    )
    return one.select(
        "n",
        F.when(n > 0, F.col("__sae").cast("double") / n).alias("mae"),
        F.when(n > 0, F.sqrt(sse / n)).alias("rmse"),
        F.when((n > 0) & (sst > 0), 1 - sse / sst).alias("r2"),
    )
