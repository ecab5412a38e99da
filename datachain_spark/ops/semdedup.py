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
only WITHIN a cell, never across the corpus, so cost is sum(cell_size^2),
controlled by ``num_cells`` (the paper uses ~100k clusters for LAION;
num_cells should grow with N so cells stay ~constant). The plan is: one
Arrow-batched assignment pass (no shuffle), one window shuffle keyed on
cell to rank members, one self-join shuffle keyed on cell for the
candidate pairs, one anti-join to drop losers. Centroids are the only
driver-side state (num_cells x dim floats) — the corpus is never
collected.

Assignment methods: ``method="arrow"`` (default) computes the n x k
distance matrix per Arrow batch with a dim-ordered accumulation loop —
bit-identical to the SQL fold (see below) and ~20x faster than the
expression form, whose k-struct argmin exceeds Janino's codegen budget at
useful k and falls back to interpreted per-row HOF folds (the same
failure mode the PQ encode hit, ops/pq.py:285). ``method="expr"`` keeps
the pure-Column path: centroid literals inlined up to ``literal_cap``
total floats, a broadcast-join struct-min argmin past it.

Bit-exactness of the arrow path (the DuckDB oracle hashes every cell
assignment): dots and norms accumulate dimension-by-dimension from 0.0
(``S += V[:,j] * C[:,j]`` per j) — the same left fold as
``F.aggregate(zip_with(...))`` and DuckDB's ``list_reduce``; numpy ufunc
add/mul are plain IEEE doubles with no fused reordering. Argmin ties
break to the lowest cell on both paths (np.argmin first-occurrence ==
min-of-struct lexicographic). Rows whose vector is null, ragged, or
contains nulls get a NULL cell: they join no pairs, are never dropped,
and surface with cell NULL — the job never aborts (pq precedent).

Determinism: given fixed centroids the whole path is deterministic (rank
ties break on the id), so with id-ordered bootstrap centroids the output
is DuckDB-oracle-able — the oracle replicates the driver-side centroid
normalization and the fold-ordered dot/norm bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.array import dot_product, norm
from .similarity import kmeans_refine, train_centroids_sample


def _normalize_centroids(centroids: Sequence[Sequence[float]]) -> list[list[float]]:
    """Driver-side L2 normalization, left-fold sum from 0.0 so the oracle's
    ``list_reduce`` reproduces every double exactly. Zero-norm and
    non-finite (NaN/Inf element) centroids are rejected up front — a NaN
    centroid column would capture EVERY row's np.argmin (NaN propagates),
    collapsing the clustering into one poisoned O(n^2) cell; typically it
    means the training embeddings need cleaning (kmeans_refine averages
    NaNs straight into the centroid)."""
    out = []
    for i, c in enumerate(centroids):
        s = 0.0
        for x in c:
            s += float(x) * float(x)
        if not (s > 0.0 and math.isfinite(s)):
            raise ValueError(
                f"centroid {i} has unusable norm (sum of squares = {s!r}): "
                "zero-norm or non-finite centroids poison the argmin — "
                "clean the embeddings feeding centroid training"
            )
        n = math.sqrt(s)
        out.append([float(x) / n for x in c])
    return out


def _assign_arrow(
    rows: DataFrame,
    ncents: Sequence[Sequence[float]],
    vec_col: str,
    id_field,
) -> DataFrame:
    """mapInPandas assignment: per batch, accumulate the n x k dot matrix
    and the row norms dimension-by-dimension (bit-exact left fold), then
    argmin. Emits (__id, __v, __nrm, cell, __cd); invalid vectors emit
    NULL cell/cd and NaN norm. No shuffle — a pure map stage."""
    import numpy as np

    from .pq import _np_valid_vectors

    C = np.asarray([[float(x) for x in c] for c in ncents], dtype=np.float64)
    k, d = C.shape
    schema = T.StructType(
        [
            id_field,
            rows.schema[vec_col],
            T.StructField("__nrm", T.DoubleType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("__cd", T.DoubleType()),
        ]
    )

    def fn(it):
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            nrm = [None] * n
            cell = [None] * n
            cd = [None] * n
            if n:
                mask, V = _np_valid_vectors(pdf[vec_col], d)
                if V.shape[0]:
                    nv = V.shape[0]
                    S = np.zeros((nv, k), dtype=np.float64)
                    acc = np.zeros(nv, dtype=np.float64)
                    for j in range(d):
                        col = V[:, j]
                        S += col[:, None] * C[None, :, j]
                        acc += col * col
                    nr = np.sqrt(acc)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        dist = 1.0 - S / nr[:, None]
                    best = dist.argmin(axis=1)
                    bd = dist[np.arange(nv), best]
                    # zero-norm (all-zero vector) or non-finite norm: cosine
                    # is undefined — degrade to invalid like ragged/null rows
                    # (an unguarded 0 norm would NaN-poison the rank order
                    # and DIVIDE_BY_ZERO the pair join under ANSI mode)
                    usable = np.isfinite(nr) & (nr > 0.0)
                    vi = 0
                    for i, ok in enumerate(mask):
                        if ok:
                            if usable[vi]:
                                nrm[i] = float(nr[vi])
                                cell[i] = int(best[vi])
                                cd[i] = float(bd[vi])
                            vi += 1
            out = pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "__v": pdf[vec_col],
                    "__nrm": pd.Series(nrm, dtype="float64"),
                    "cell": pd.Series(cell, dtype="object"),
                    "__cd": pd.Series(cd, dtype="float64"),
                }
            )
            yield out

    return rows.mapInPandas(fn, schema)


def _valid_vec_expr(vec_col: str, nrm_col: str, dim: int):
    """Row validity mirroring the arrow path's _np_valid_vectors + usable
    norm: non-null, exactly ``dim`` elements, no null elements, and a
    finite positive norm (all-zero and NaN-containing vectors are out —
    cosine is undefined and an unguarded 0 norm DIVIDE_BY_ZEROs under
    ANSI mode)."""
    return (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == dim)
        & (~F.exists(F.col(vec_col), lambda x: x.isNull()))
        & (~F.isnan(F.col(nrm_col)))
        & (F.col(nrm_col) > 0)
        # isnan alone misses Infinity (an overflowed element): Inf norm
        # makes __cd NaN, which sorts FIRST under desc and then NaN>=tau
        # is true — the Inf row would keeper-drop its whole cell
        & (F.col(nrm_col) < F.lit(float("inf")))
    )


def _assign_cells_expr(
    df: DataFrame,
    id_col: str,
    ncents: Sequence[Sequence[float]],
    vec_col: str,
    cell_col: str,
    literal_cap: int,
    nrm_col: str = "__nrm",
    cd_col: str = "__cd",
) -> DataFrame:
    """Pure-Column assignment against PRE-NORMALIZED centroids; the input
    must already carry the row norm in ``nrm_col`` so each centroid
    distance is one dot fold. Small codebooks inline the centroids as
    literal arrays; past ``literal_cap`` total floats the centroids become
    a broadcast DataFrame and the argmin is a struct-min aggregation
    (ties -> lowest cell id, matching the literal path), joined back on
    the id — two shuffles but a bounded plan at any num_cells. Invalid
    rows (see _valid_vec_expr) get a NULL cell on both paths, matching
    the arrow method — without the guard a null distance field would sort
    FIRST through min(struct)/array_min and invalid rows would silently
    land in cell 0.

    Emits BOTH ``cell_col`` and ``cd_col`` (the distance to the assigned
    centroid) — the argmin struct already holds it, and deriving it here
    keeps the broadcast path free of centroid literals (a separate
    lookup-array expression would inline num_cells x dim literal doubles,
    exactly the unbounded plan the cap exists to avoid)."""
    dim = len(ncents[0]) if ncents else 0
    valid = _valid_vec_expr(vec_col, nrm_col, dim)
    n_floats = len(ncents) * dim
    if n_floats <= literal_cap:
        dists = [
            F.struct(
                (
                    F.lit(1.0)
                    - dot_product(F.col(vec_col), [float(x) for x in c])
                    / F.col(nrm_col)
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(ncents)
        ]
        # when() keeps the argmin (and its divisions) off invalid rows;
        # one struct column, then split — codegen CSEs the argmin
        best = F.when(valid, F.array_min(F.array(*dists)))
        return (
            df.withColumn("__best", best)
            .withColumn(cell_col, F.col("__best")["cell"])
            .withColumn(cd_col, F.col("__best")["d"])
            .drop("__best")
        )
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(ncents)],
        schema="__cell int, __nce array<double>",
    )
    d = F.lit(1.0) - dot_product(F.col(vec_col), F.col("__nce")) / F.col(nrm_col)
    best = (
        df.select(id_col, vec_col, nrm_col)
        .filter(valid)
        .join(F.broadcast(cents))
        .groupBy(id_col)
        .agg(F.min(F.struct(d.alias("d"), F.col("__cell").alias("c"))).alias("__best"))
        .select(
            id_col,
            F.col("__best")["c"].alias(cell_col),
            F.col("__best")["d"].alias(cd_col),
        )
    )
    return df.join(best, on=id_col, how="left")


def _ranked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    ncents: Sequence[Sequence[float]],
    keep: str,
    method: str,
    literal_cap: int,
    max_cell_size: Optional[int] = None,
    seed: int = 42,
    persist: bool = True,
) -> DataFrame:
    """(__id, __v, __nrm, cell, __sub, __rk) for every validly-assigned row:
    cell assignment + within-(cell, sub-cell) rank under the survival
    policy. NULL-cell (invalid-vector) rows are excluded — they take part
    in no comparisons.

    ``max_cell_size`` is the skew guard: a degenerate cluster (near-dup-
    heavy corpora) makes one cell's O(n^2) pair join explode. With a cap,
    any cell larger than it is hash-salted into ceil(n/cap) sub-cells and
    comparison stays within the sub-cell — bounded cost, at the price of
    missing cross-sub-cell duplicates (expected recall loss ~(1 - 1/s) per
    oversized cell; the standard batched-semantic-dedup tradeoff). Costs
    one per-cell count aggregation + a broadcast factor join; __sub is a
    constant 0 when the cap is off."""
    rows = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if method == "arrow":
        assigned = _assign_arrow(rows, ncents, "__v", rows.schema["__id"])
    else:
        rows = rows.withColumn("__nrm", norm(F.col("__v")))
        # assignment emits __cd too — the argmin struct already holds the
        # winning distance, and this keeps the broadcast path free of
        # centroid literals (no lookup-array expression)
        assigned = _assign_cells_expr(
            rows, "__id", ncents, "__v", "cell", literal_cap
        )
    assigned = assigned.filter(F.col("cell").isNotNull())
    if max_cell_size:
        # the counts branch is a second consumer of the assignment —
        # persist so the Arrow/expr distance pass executes once, not once
        # for the factors and again for the ranked plan
        assigned = assigned.persist()
        counts = assigned.groupBy("cell").agg(F.count("*").alias("__n"))
        factors = counts.select(
            "cell",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("__n") / F.lit(float(max_cell_size))).cast("long"),
            ).alias("__splits"),
        )
        assigned = (
            assigned.join(F.broadcast(factors), "cell")
            .withColumn(
                "__sub",
                F.pmod(
                    F.xxhash64(F.col("__id").cast("string"), F.lit(seed)),
                    F.col("__splits"),
                ),
            )
            .drop("__splits")
        )
    else:
        assigned = assigned.withColumn("__sub", F.lit(0).cast("long"))
    order = (
        [F.col("__cd").desc(), F.col("__id")]
        if keep == "far"
        else [F.col("__cd").asc(), F.col("__id")]
    )
    w = Window.partitionBy("cell", "__sub").orderBy(*order)
    ranked = assigned.withColumn("__rk", F.row_number().over(w)).select(
        "__id", "__v", "__nrm", "cell", "__sub", "__rk"
    )
    # consumed by BOTH sides of the candidate self-join, plus the cell_col
    # join-back in semdedup(): persist so the Arrow assignment + rank
    # window execute once, not once per reference (minhash sig precedent;
    # LRU-evicts under memory pressure). The cached blocks live until the
    # session drops them — a long-lived session looping semdedup over many
    # shards should pass persist=False (recompute) or clearCache between
    # shards; the oracle/test harness clears explicitly where plan shape
    # matters.
    return ranked.persist() if persist else ranked


def _validate(keep: str, eps: float, method: str) -> None:
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    if not (0.0 <= eps <= 1.0):
        raise ValueError(f"eps must be in [0, 1], got {eps}")
    if method not in ("arrow", "expr"):
        raise ValueError(f"method must be 'arrow' or 'expr', got {method!r}")


def _pairs_from_ranked(ranked: DataFrame, cell_col: str, tau: float) -> DataFrame:
    a, b = ranked.alias("a"), ranked.alias("b")
    sim = dot_product(F.col("a.__v"), F.col("b.__v")) / (
        F.col("a.__nrm") * F.col("b.__nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.__sub") == F.col("b.__sub"))
            & (F.col("a.__rk") < F.col("b.__rk")),
        )
        .select(
            F.col("a.cell").alias(cell_col),
            F.col("a.__id").alias("id_keep"),
            F.col("b.__id").alias("id_drop"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= tau)
    )


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
    method: str = "arrow",
    literal_cap: int = 32768,
    max_cell_size: Optional[int] = None,
    persist: bool = True,
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
    _validate(keep, eps, method)
    if centroids is None:
        boot = train_centroids_sample(df, vec_col, num_cells=num_cells, seed=seed)
        centroids = kmeans_refine(df, boot, vec_col, iters=kmeans_iters)
    ncents = _normalize_centroids(centroids)
    ranked = _ranked(
        df, id_col, vec_col, ncents, keep, method, literal_cap,
        max_cell_size=max_cell_size, seed=seed, persist=persist,
    )
    return _pairs_from_ranked(ranked, cell_col, 1.0 - eps)


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
    method: str = "arrow",
    literal_cap: int = 32768,
    max_cell_size: Optional[int] = None,
    persist: bool = True,
) -> DataFrame:
    """Survivors of semantic dedup: the input rows minus every document
    that semdedup_pairs marks as a drop. ``cell_col`` (optional) appends
    the cluster assignment (NULL for invalid vectors) — served from the
    persisted assignment pass, not recomputed. One anti-join on the id plus,
    with cell_col, one id-keyed join back — the corpus shuffles once for
    the dedup itself. ``max_cell_size`` bounds the worst-case pair join on
    skewed clusters by hash sub-cell salting (see _ranked — bounded cost,
    a small documented recall loss on oversized cells only)."""
    _validate(keep, eps, method)
    if centroids is None:
        boot = train_centroids_sample(df, vec_col, num_cells=num_cells, seed=seed)
        centroids = kmeans_refine(df, boot, vec_col, iters=kmeans_iters)
    ncents = _normalize_centroids(centroids)
    ranked = _ranked(
        df, id_col, vec_col, ncents, keep, method, literal_cap,
        max_cell_size=max_cell_size, seed=seed, persist=persist,
    )
    pairs = _pairs_from_ranked(ranked, "cell", 1.0 - eps)
    losers = pairs.select(F.col("id_drop").alias(id_col)).distinct()
    out = df.join(losers, on=id_col, how="left_anti")
    if cell_col is not None:
        cells = ranked.select(
            F.col("__id").alias(id_col), F.col("cell").alias(cell_col)
        )
        out = out.join(cells, on=id_col, how="left")
    return out
