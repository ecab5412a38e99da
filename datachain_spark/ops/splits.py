"""Stratified dataset splitting and cross-validation fold assignment.

``DataChain.train_test_split`` (chain.py) splits by hash BOUNDARIES —
zero-shuffle, proportional in expectation, the right default for huge
uniform corpora. The two operators here trade one window shuffle for
EXACT per-stratum proportions, which is what evaluation protocols demand
when strata (language, domain, label) are imbalanced:

- :func:`stratified_split`: each stratum independently ranked by a seeded
  per-row hash, then cut at exact cumulative-fraction boundaries — every
  stratum's train/val/test ratio matches the requested weights to within
  one row.
- :func:`kfold_assign`: deterministic fold ids; with ``strata_cols`` the
  folds are exactly balanced within each stratum (round-robin over the
  hash-ranked order), without them it is a zero-shuffle hash modulo.

Scale shape: the ranking window partitions on the strata columns, so ONE
shuffle keyed on strata; each stratum lands in one task — fine for
label-like cardinality (languages, domains, classes), but a single
giant stratum serializes into one task. For near-unique strata or a
handful of multi-TB ones, use hash-boundary ``train_test_split`` (still
proportional in expectation) — exactness is not worth a single-task sort
at that shape. NULL strata group together (one "unknown" stratum).

``hash_fn="md5"`` is the portable family DuckDB reproduces
(CAST('0x'||substring(md5(x),1,15) AS BIGINT)) so both operators are
cross-engine hash-verifiable end-to-end; "xxhash64" is the production
default. No reference counterpart (spec addition; the reference's
train_test_split is the boundary form only, toolkit/split.py:9-105).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _seeded_hash64

__all__ = ["stratified_split", "kfold_assign"]


def _rank_window(strata: Sequence[str], h: Column, id_col: str):
    # hash first (the shuffle key of the draw), id second (total order even
    # on the measure-zero chance of a hash collision)
    return Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())


def stratified_split(
    df: DataFrame,
    strata_cols: Union[str, Sequence[str]],
    weights: Sequence[float],
    id_col: str,
    labels: Optional[Sequence[str]] = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a split with EXACT
    per-stratum proportions (to within one row per boundary).

    Within each stratum, rows are ranked by a seeded hash of ``id_col``
    (deterministic — retry/partition stable, never ``rand()``); split ``i``
    takes ranks in ``(floor(c_{i-1}*n), floor(c_i*n)]`` with ``c`` the
    cumulative weight fractions and ``n`` the stratum size, so the last
    split absorbs rounding. ``labels`` defaults to ``["train", "test"]``
    for two weights, ``["train", "val", "test"]`` for three, else
    ``split_0..k-1``. ``id_col`` must be non-NULL (in-expression guard).
    """
    if len(weights) < 2 or any(w <= 0 for w in weights):
        raise ValueError("stratified_split: weights must be >=2 positive values")
    strata = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    if labels is None:
        labels = {
            2: ["train", "test"], 3: ["train", "val", "test"]
        }.get(len(weights), [f"split_{i}" for i in range(len(weights))])
    if len(labels) != len(weights):
        raise ValueError("stratified_split: labels must match weights")
    total = float(sum(weights))

    id_str = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"stratified_split: NULL value in id_col {id_col!r}")),
    ).otherwise(F.col(id_col).cast("string"))
    h = _seeded_hash64(id_str, seed, hash_fn)
    w = _rank_window(strata, h, id_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(Window.partitionBy(*strata))

    cum, boundaries = 0.0, []
    for wt in weights[:-1]:
        cum += wt / total
        boundaries.append(cum)
    # CASE rn <= floor(c_1*n) ... ELSE last — built inside-out so the
    # smallest boundary is tested first; same floor arithmetic the DuckDB
    # oracle replays (identical IEEE double product both engines)
    label_expr = F.lit(labels[-1])
    for c, lab in reversed(list(zip(boundaries, labels[:-1]))):
        label_expr = F.when(
            rn <= F.floor(F.lit(c) * n), F.lit(lab)
        ).otherwise(label_expr)
    return df.withColumn(split_col, label_expr)


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int,
    strata_cols: Union[str, Sequence[str], None] = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    fold_col: str = "fold",
) -> DataFrame:
    """Add ``fold_col`` in ``0..k-1`` for k-fold cross-validation.

    Without ``strata_cols``: ``pmod(seeded_hash(id), k)`` — zero shuffle,
    whole-stage codegen, balanced in expectation. With ``strata_cols``:
    round-robin over the hash-ranked order within each stratum — every
    stratum contributes to every fold as evenly as integers allow (one
    window shuffle on the strata; see the module note on giant strata).
    """
    if k < 2:
        raise ValueError("kfold_assign: k must be >= 2")
    id_str = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"kfold_assign: NULL value in id_col {id_col!r}")),
    ).otherwise(F.col(id_col).cast("string"))
    h = _seeded_hash64(id_str, seed, hash_fn)
    if strata_cols is None:
        return df.withColumn(fold_col, F.pmod(h, F.lit(k)).cast("int"))
    strata = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    rn = F.row_number().over(_rank_window(strata, h, id_col))
    return df.withColumn(fold_col, ((rn - F.lit(1)) % F.lit(k)).cast("int"))


def temporal_split(
    df: DataFrame,
    time_col: str,
    cutoff=None,
    test_frac: float = 0.2,
    embargo_seconds: float = 0.0,
    out_col: str = "split",
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Leakage-safe TEMPORAL split: train strictly before the cutoff minus
    an embargo gap, test at/after the cutoff — the time-series evaluation
    protocol where random splits leak future information into training
    (and, with overlapping-horizon labels, rows immediately before the
    boundary leak too: the ``embargo_seconds`` purge drops them into an
    explicit ``"embargo"`` bucket instead of silently training on them —
    the purged/embargoed split of the financial-ML literature).

    ``cutoff`` is an explicit timestamp/epoch boundary; with
    ``cutoff=None`` it is the ``1 - test_frac`` time quantile computed
    IN-PLAN (one 1-row aggregate broadcast back — the q22 scalar pattern,
    no driver round-trip). By default the quantile is
    ``approx_percentile`` (Greenwald-Khanna: mergeable,
    O(accuracy·log n) aggregation state — the :func:`sketch_quantiles`
    machinery), because an 80/20 split boundary tolerates the ≤
    n/``accuracy`` rank error while EXACT ``percentile`` buffers the
    whole value multiset in one aggregation buffer — an executor OOM at
    100 TB. ``exact=True`` opts into the exact quantile for small-data /
    oracle-parity runs. Adds ``out_col`` ∈ {'train', 'embargo',
    'test'}; NULL timestamps get a NULL split. Zero shuffles beyond the
    1-row bounds aggregate: the labeling itself is a pure projection, so
    a 100-TB corpus scans once.
    """
    if not 0.0 < test_frac < 1.0:
        raise ValueError("temporal_split: test_frac must be in (0, 1)")
    if embargo_seconds < 0:
        raise ValueError("temporal_split: embargo_seconds must be >= 0")
    if accuracy < 1:
        raise ValueError("temporal_split: accuracy must be >= 1")
    epoch = F.col(time_col).cast("timestamp").cast("double")
    if cutoff is not None:
        cut = F.lit(cutoff).cast("timestamp").cast("double")
        labeled = df.withColumn("__cut", cut)
    else:
        q = F.lit(1.0 - float(test_frac))
        cut_agg = (
            F.percentile(epoch, q)
            if exact
            else F.approx_percentile(epoch, q, F.lit(int(accuracy)))
        )
        glob = df.agg(cut_agg.cast("double").alias("__cut"))
        labeled = df.crossJoin(F.broadcast(glob))
    emb = F.lit(float(embargo_seconds))
    split = (
        F.when(epoch.isNull(), F.lit(None).cast("string"))
        .when(epoch >= F.col("__cut"), F.lit("test"))
        .when(epoch < F.col("__cut") - emb, F.lit("train"))
        .otherwise(F.lit("embargo"))
    )
    return labeled.withColumn(out_col, split).drop("__cut")


__all__.append("temporal_split")
