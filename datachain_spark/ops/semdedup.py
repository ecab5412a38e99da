"""SemDeDup: semantic deduplication over an embedding column.

Implements the recipe of Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication" (2023, public): k-means
cluster the embeddings, then inside each cluster drop every document whose
cosine similarity to an earlier-ranked cluster member is >= 1 - eps. The
paper's best-performing policy keeps the examples with the LOWEST
similarity to the cluster centroid, so the default ranking here puts the
farthest-from-centroid member first (``keep="far"``); ``keep="near"``
flips it. No reference counterpart (spec addition) — this is the standard
embedding-level dedup pass a 100-TB pretraining pipeline runs after
exact/MinHash dedup, catching paraphrases those miss.

Scale shape: clustering bounds the quadratic — pairwise comparison happens
only WITHIN a cell, never across the corpus, so cost is
sum(cell_size^2), controlled by ``num_cells`` (the paper uses ~100k
clusters for LAION; num_cells should grow with N so cells stay ~constant).
The plan is: one cell assignment pass (codegen'd argmin over centroid
literals for small k; a broadcast-join argmin past ``literal_cap`` so the
plan never exceeds Janino limits), one window shuffle keyed on cell to
rank members, one self-join shuffle keyed on cell for the candidate
pairs, one anti-join to drop losers. Centroids are the only driver-side
state (num_cells x dim floats) — the corpus is never collected.

Determinism: given fixed centroids the whole path is deterministic (rank
ties break on the id), so with id-ordered bootstrap centroids the output
is DuckDB-oracle-able — the oracle replicates Spark's fold-ordered
dot/norm exactly (list_reduce, same summation order).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.array import cosine_distance
from .similarity import assign_ivf_cells, kmeans_refine, train_centroids_sample


def _assign_cells(
    df: DataFrame,
    id_col: str,
    centroids: Sequence[Sequence[float]],
    vec_col: str,
    cell_col: str,
    literal_cap: int,
) -> DataFrame:
    """Nearest-centroid assignment. Small codebooks inline the centroids as
    literal arrays (whole-stage codegen, zero extra shuffles); past
    ``literal_cap`` total floats the centroids become a broadcast DataFrame
    and the argmin is a struct-min aggregation (ties -> lowest cell id,
    matching the literal path), joined back on the id — two shuffles but a
    bounded plan at any num_cells."""
    n_floats = len(centroids) * (len(centroids[0]) if centroids else 0)
    if n_floats <= literal_cap:
        return assign_ivf_cells(df, centroids, vec_col, cell_col)
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        schema="__cell int, __ce array<double>",
    )
    d = cosine_distance(F.col(vec_col), F.col("__ce"))
    best = (
        df.select(id_col, vec_col)
        .join(F.broadcast(cents))
        .groupBy(id_col)
        .agg(
            F.min(F.struct(d.alias("d"), F.col("__cell").alias("c")))["c"].alias(
                cell_col
            )
        )
    )
    return df.join(best, on=id_col)


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    centroids: Optional[Sequence[Sequence[float]]] = None,
    num_cells: int = 16,
    eps: float = 0.05,
    keep: str = "far",
    cell_col: str = "cell",
    kmeans_iters: int = 2,
    seed: int = 42,
    literal_cap: int = 32768,
) -> DataFrame:
    """(cell, id_keep, id_drop, sim) candidate pairs: within each cluster,
    ``id_drop`` is too similar (cosine >= 1 - eps) to the earlier-ranked
    ``id_keep``. Rank order is the survival policy: ``keep="far"`` ranks
    farthest-from-centroid first (the paper's best policy — low-similarity-
    to-centroid examples survive), ``keep="near"`` the reverse; ties break
    on the id so the cut is deterministic.

    A document may appear as id_drop against several keepers — the drop
    set is ``select(id_drop).distinct()``. Matching the paper's released
    implementation, a document is dropped if it is similar to ANY
    earlier-ranked member, whether or not that member itself survives."""
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    if not (0.0 <= eps <= 1.0):
        raise ValueError(f"eps must be in [0, 1], got {eps}")
    if centroids is None:
        boot = train_centroids_sample(df, vec_col, num_cells=num_cells, seed=seed)
        centroids = kmeans_refine(df, boot, vec_col, iters=kmeans_iters)

    assigned = _assign_cells(df, id_col, centroids, vec_col, cell_col, literal_cap)

    # distance to own centroid: one codegen'd lookup over the literal array
    # of centroid arrays (num_cells entries — small by construction)
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    cdist = cosine_distance(
        F.col(vec_col), F.element_at(cent_arr, F.col(cell_col) + 1)
    )
    ranked = assigned.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.col(cell_col),
        cdist.alias("__cd"),
    )
    order = (
        [F.col("__cd").desc(), F.col("__id")]
        if keep == "far"
        else [F.col("__cd").asc(), F.col("__id")]
    )
    w = Window.partitionBy(cell_col).orderBy(*order)
    ranked = ranked.withColumn("__rk", F.row_number().over(w))

    a, b = ranked.alias("a"), ranked.alias("b")
    sim = F.lit(1.0) - cosine_distance(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(
            b,
            (F.col(f"a.{cell_col}") == F.col(f"b.{cell_col}"))
            & (F.col("a.__rk") < F.col("b.__rk")),
        )
        .select(
            F.col(f"a.{cell_col}").alias(cell_col),
            F.col("a.__id").alias("id_keep"),
            F.col("b.__id").alias("id_drop"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 1.0 - eps)
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    centroids: Optional[Sequence[Sequence[float]]] = None,
    num_cells: int = 16,
    eps: float = 0.05,
    keep: str = "far",
    cell_col: Optional[str] = None,
    kmeans_iters: int = 2,
    seed: int = 42,
    literal_cap: int = 32768,
) -> DataFrame:
    """Survivors of semantic dedup: the input rows minus every document
    that semdedup_pairs marks as a drop. ``cell_col`` (optional) appends
    the cluster assignment to the output for downstream per-cluster
    sampling. One anti-join on the id — the corpus shuffles once."""
    if centroids is None:
        boot = train_centroids_sample(df, vec_col, num_cells=num_cells, seed=seed)
        centroids = kmeans_refine(df, boot, vec_col, iters=kmeans_iters)
    pairs = semdedup_pairs(
        df,
        id_col,
        vec_col,
        centroids=centroids,
        eps=eps,
        keep=keep,
        cell_col="__semcell",
        literal_cap=literal_cap,
    )
    losers = pairs.select(F.col("id_drop").alias(id_col)).distinct()
    out = df.join(losers, on=id_col, how="left_anti")
    if cell_col is not None:
        out = _assign_cells(out, id_col, centroids, vec_col, cell_col, literal_cap)
    return out
