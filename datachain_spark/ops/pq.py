"""Product quantization (PQ) for embedding columns: memory-compressed ANN.

Jegou et al., "Product Quantization for Nearest Neighbor Search" (TPAMI
2011, public): split each d-dim vector into ``m`` subvectors, learn a
``k``-entry codebook per subspace, store each vector as ``m`` uint8-ish
codes (d·4 bytes → m bytes, e.g. 64-dim float32 → 8 bytes at m=8/k=256),
and answer queries with asymmetric distance computation (ADC): per query,
precompute the m×k table of query-subvector→code distances, then each
stored vector's approximate distance is a sum of m table lookups — no
float vector ever touched at query time.

Spark-first shape:
- ``train_pq``: per-subspace k-means. ALL subspaces train in one DataFrame
  pass per iteration (explode to (sub, subvec) rows → broadcast-join the
  current m·k-row codebook → per-row argmin via min(struct(dist, code)) →
  groupBy (sub, code) mean). Driver state is the m×k×(d/m) codebook —
  kilobytes. Init is deterministic (hash-ranked sample rows), so training
  is retry-stable and reproducible.
- ``pq_encode``: same assignment join, one pass, producing the codes
  array<int> column. MATERIALIZE this (save) — it is the compressed index.
- ``pq_adc_topk``: the m×k lookup table rides the plan as a nested literal
  array; each row's score is an m-term fold over its codes (per-CODE cost,
  not per-dimension), then TakeOrderedAndProject for the top-k.

The codebooks are plain Python lists (list[list[list[float]]],
[m][k][d/m]) — serializable, versionable next to the dataset.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _seeded_hash64


def _subvec(vec, m: int, d_sub: int, sub: int):
    return F.slice(vec, sub * d_sub + 1, d_sub)


def _sq_dist(a, b, d_sub: int):
    # sum of squared differences, UNROLLED over the d_sub known-at-plan-time
    # indices: pure codegen arithmetic. The HOF form (zip_with + aggregate)
    # evaluates interpreted per joined row — measured 5x slower on the
    # (rows x k)-row assignment join. Left-to-right fold from 0.0 matches
    # the DuckDB oracle's list_reduce order bit-for-bit.
    out = F.lit(0.0)
    for i in range(d_sub):
        diff = F.element_at(a, i + 1) - F.element_at(b, i + 1)
        out = out + diff * diff
    return out


def _explode_subvecs(df: DataFrame, vec_col: str, m: int, d_sub: int) -> DataFrame:
    subs = F.array(*[
        F.struct(F.lit(s).alias("__sub"), _subvec(F.col(vec_col), m, d_sub, s).alias("__sv"))
        for s in range(m)
    ])
    return df.select("__rid", F.explode(subs).alias("__x")).select(
        "__rid", F.col("__x.__sub").alias("__sub"), F.col("__x.__sv").alias("__sv")
    )


def _codebook_df(spark, codebooks) -> DataFrame:
    rows = [
        (s, c, [float(v) for v in codebooks[s][c]])
        for s in range(len(codebooks))
        for c in range(len(codebooks[s]))
    ]
    return spark.createDataFrame(rows, "__sub int, __code int, __cent array<double>")


def _assign(subvecs: DataFrame, cb: DataFrame, d_sub: int) -> DataFrame:
    """(rid, sub) -> nearest code, deterministic ties (lowest code wins)."""
    d = _sq_dist(F.col("__sv"), F.col("__cent"), d_sub)
    return (
        subvecs.join(F.broadcast(cb), "__sub")
        .groupBy("__rid", "__sub")
        .agg(F.min(F.struct(d.alias("__d"), F.col("__code").alias("__c"))).alias("__best"))
        .select("__rid", "__sub", F.col("__best.__c").alias("__code"),
                F.col("__best.__d").alias("__dist"))
    )


def train_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    iters: int = 5,
    id_cols: Optional[Sequence[str]] = None,
    seed: int = 42,
) -> "list[list[list[float]]]":
    """Learn the [m][k][d/m] PQ codebooks by per-subspace k-means.

    Deterministic: initial centroids are the k hash-ranked sample rows per
    subspace (seeded row hash — retry/partitioning stable), then ``iters``
    Lloyd rounds, every subspace updated in one DataFrame pass per round.
    Driver contact: one k·m-row collect per round (the codebook itself).
    Empty clusters keep their previous centroid.

    Rows are keyed by hash(id_cols + vector content) — the vector rides
    the key even when ``id_cols`` is given, so two rows that share an id
    but carry DIFFERENT vectors stay separate samples (a key of ids alone
    would merge them and pick a partition-order-dependent survivor,
    breaking the determinism guarantee). ``id_cols=None`` keys purely by
    content: duplicate vectors collapse to one sample (distinct-vector
    k-means, duplicates deweighted); with ``id_cols``, distinct (id,
    vector) pairs each weigh 1."""
    first = df.select(F.col(vec_col)).first()
    if first is None:
        raise ValueError("train_pq: empty input")
    d = len(first[0])
    if d % m != 0:
        raise ValueError(f"train_pq: dim {d} not divisible by m={m}")
    d_sub = d // m

    key = F.concat_ws(
        ",",
        *[F.col(c).cast("string") for c in (id_cols or [])],
        F.col(vec_col).cast("array<string>").cast("string"),
    )
    base = df.select(
        _seeded_hash64(key, seed, "xxhash64").alias("__rid"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    sv = _explode_subvecs(base.withColumnRenamed("__v", vec_col), vec_col, m, d_sub)

    # init: per subspace, the k sample subvectors with the smallest row hash
    from pyspark.sql import Window

    w = Window.partitionBy("__sub").orderBy("__rid", "__sv")
    init = (
        sv.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("__sub", (F.col("__rn") - 1).alias("__code"), F.col("__sv"))
        .collect()
    )
    codebooks = [[None] * min(k, len([r for r in init if r["__sub"] == s]))
                 for s in range(m)]
    for r in init:
        codebooks[r["__sub"]][r["__code"]] = [float(x) for x in r["__sv"]]

    spark = df.sparkSession
    for _ in range(iters):
        cb = _codebook_df(spark, codebooks)
        d_expr = _sq_dist(F.col("__sv"), F.col("__cent"), d_sub)
        # one job per round: the argmin agg CARRIES the subvector (first()
        # — it is functionally determined by (rid, sub)), so the cluster
        # means need no re-join against sv (which cost a second shuffle
        # join + job per round in the first cut)
        assigned = (
            sv.join(F.broadcast(cb), "__sub")
            .groupBy("__rid", "__sub")
            .agg(
                F.min(
                    F.struct(d_expr.alias("__d"), F.col("__code").alias("__c"))
                ).alias("__best"),
                F.first("__sv").alias("__sv"),
            )
        )
        means = (
            assigned.groupBy("__sub", F.col("__best.__c").alias("__code"))
            .agg(
                F.array(*[
                    F.avg(F.element_at(F.col("__sv"), i + 1)) for i in range(d_sub)
                ]).alias("__mean")
            )
            .collect()
        )
        for r in means:
            codebooks[r["__sub"]][r["__code"]] = [float(x) for x in r["__mean"]]
    return [list(cb) for cb in codebooks]


def pq_encode(
    df: DataFrame,
    codebooks: "list[list[list[float]]]",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    keep_vec: bool = False,
    method: str = "numpy",
) -> DataFrame:
    """Compress vectors to their m nearest-codebook codes (array<int>) —
    the output (ids + m small ints per row) is the index to materialize.

    ``method="numpy"`` (default, the scale path): one Arrow-batched
    mapInPandas pass; per batch the (B,k) distance matrix per subspace is
    elementwise-squared-then-summed (NOT a gemm), so each distance is the
    same left-to-right fold the JVM path and the DuckDB oracle compute —
    bit-identical codes, ties to the lowest code via argmin. No shuffle,
    no row blowup.

    ``method="join"``: pure-JVM broadcast join + per-(row,sub) argmin.
    Correct but materializes rows×k joined rows — the k-fold blowup is why
    the vectorized path is the default."""
    m = len(codebooks)
    if method == "numpy":
        return _pq_encode_np(df, codebooks, vec_col, code_col, keep_vec)
    if method != "join":
        raise ValueError(f"pq_encode: unknown method {method!r}")
    d_sub = _validated_d_sub(df, codebooks, vec_col)
    d = m * d_sub
    out_cols = [c for c in df.columns if c != vec_col or keep_vec]
    # rid = CONTENT hash of the vector, not monotonically_increasing_id():
    # mid() is recomputed independently on each side of the base<->codes
    # self-join and is partition-order dependent, so under AQE re-plans or
    # task retries the two subtrees could disagree and rows would silently
    # pair with wrong codes. Codes are a pure function of the vector, so
    # hash-colliding duplicate vectors joining one shared codes row is
    # exactly right. Dirty vectors (null / wrong length / null elements)
    # are excluded from the encode side and LEFT-join to NULL codes —
    # which also keeps the hash safe from concat_ws's null-element
    # dropping (only clean, equal-length vectors are ever hashed).
    valid = (
        F.col("__vd").isNotNull()
        & (F.size("__vd") == d)
        & ~F.exists("__vd", lambda x: x.isNull() | F.isnan(x))
    )
    base = df.withColumn("__vd", F.col(vec_col).cast("array<double>")).withColumn(
        "__rid",
        F.when(
            valid, F.xxhash64(F.concat_ws(",", F.col("__vd").cast("array<string>")))
        ),
    )
    sv = _explode_subvecs(
        base.filter(F.col("__rid").isNotNull())
        .select("__rid", F.col("__vd").alias("__v_"))
        .dropDuplicates(["__rid"]),
        "__v_", m, d_sub,
    )
    assigned = _assign(sv, _codebook_df(df.sparkSession, codebooks), d_sub)
    codes = assigned.groupBy("__rid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__sub", "__code"))),
            lambda s: s["__code"],
        ).alias(code_col)
    )
    return base.join(codes, "__rid", "left").select(*out_cols, code_col)


def _validated_d_sub(df: DataFrame, codebooks, vec_col: str) -> int:
    """d/m with fail-fast checks: vectors must split evenly into the
    codebooks' m subspaces and the codebook width must equal d/m —
    otherwise trailing dimensions would be silently ignored."""
    m = len(codebooks)
    first = df.select(F.col(vec_col)).first()
    if first is None or first[0] is None:
        return len(codebooks[0][0])
    d = len(first[0])
    if d % m != 0:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    if len(codebooks[0][0]) != d // m:
        raise ValueError(
            f"pq: codebook width {len(codebooks[0][0])} != d/m = {d // m}"
        )
    return d // m


def _np_valid_vectors(series, d: int):
    """(valid_mask, stacked (n_valid, d) float64 array) for a pandas series
    of array values. A row is valid iff the vector is non-null, has exactly
    d elements and contains no null elements — anything else would either
    crash the whole batch (ragged np.asarray) or silently truncate."""
    import numpy as np

    vals = list(series)
    # null elements arrive as None OR NaN depending on the Arrow conversion
    # (x != x catches NaN); either marks the row invalid, matching the JVM
    # join path's exists(isNull) check
    mask = [
        v is not None
        and len(v) == d
        and not any(x is None or x != x for x in v)
        for v in vals
    ]
    V = np.asarray(
        [np.asarray(vals[i], dtype=np.float64) for i, ok in enumerate(mask) if ok]
    ).reshape(sum(mask), d)
    return mask, V


def _np_subspace_codes(V, C, m: int, d_sub: int):
    """Per-subspace argmin codes for stacked vectors V against codebooks C
    (list of (k, d_sub) arrays). Elementwise square then last-axis sum:
    numpy sums axes <= 128 sequentially, matching the JVM/DuckDB left fold
    bit-for-bit (a gemm-based expansion would not); argmin ties break to
    the lowest code, same as min(struct(dist, code))."""
    import numpy as np

    codes = np.empty((V.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = V[:, s * d_sub:(s + 1) * d_sub]
        diff = sub[:, None, :] - C[s][None, :, :]
        codes[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)
    return codes


def _pq_encode_np(
    df: DataFrame,
    codebooks,
    vec_col: str,
    code_col: str,
    keep_vec: bool,
) -> DataFrame:
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(codebooks)
    d_sub = _validated_d_sub(df, codebooks, vec_col)
    d = m * d_sub
    out_cols = [c for c in df.columns if c != vec_col or keep_vec]
    in_df = df.withColumn("__vd", F.col(vec_col).cast("array<double>"))
    schema = StructType(
        [in_df.schema[c] for c in out_cols]
        + [StructField(code_col, ArrayType(IntegerType()))]
    )
    cb = [[list(map(float, cent)) for cent in sub] for sub in codebooks]

    def encode(batches):
        import numpy as np

        C = [np.asarray(sub, dtype=np.float64) for sub in cb]  # m x (k, d_sub)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # null / wrong-length / null-element vectors degrade to NULL
            # codes instead of crashing the batch — one dirty row in a
            # 100 TB corpus must not abort the whole encode
            mask, V = _np_valid_vectors(pdf["__vd"], d)
            codes = _np_subspace_codes(V, C, m, d_sub)
            out = pdf[out_cols].copy()
            it = iter(codes)
            out[code_col] = [
                list(map(int, next(it))) if ok else None for ok in mask
            ]
            yield out

    return in_df.mapInPandas(encode, schema)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: "list[list[list[float]]]",
    query_vec: Sequence[float],
    code_col: str = "pq_codes",
    k: int = 10,
    id_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Asymmetric-distance top-k: the query's m×k distance table is
    computed driver-side (m·k·(d/m) flops — microseconds) and embedded as
    a nested literal; each row's approximate squared distance is an m-term
    lookup fold over its codes. TakeOrderedAndProject does the top-k."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    q = [float(v) for v in query_vec]
    lut = [
        [
            sum((q[s * d_sub + i] - cent[i]) ** 2 for i in range(d_sub))
            for cent in codebooks[s]
        ]
        for s in range(m)
    ]
    dist = _lut_fold(lut, code_col)
    cols = [F.col(c) for c in (id_cols or encoded.columns)]
    # tie-break: id_cols when given (fully deterministic cut), else the
    # code array — rows sharing distance AND codes are interchangeable for
    # ADC purposes; pass id_cols when distinct rows can share codes
    tb = [F.col(c) for c in id_cols] if id_cols else [F.col(code_col)]
    return (
        encoded.select(*cols, dist.alias("adc_distance"))
        .orderBy("adc_distance", *tb)
        .limit(k)
    )


def _lut_fold(lut: "list[list[float]]", code_col: str):
    """Σ_s lut[s][codes[s]] as codegen'd arithmetic — unrolled over the m
    known-at-plan-time subspaces (no interpreted HOF); left-to-right fold
    from 0.0 matches the oracle's list_reduce(list ORDER BY sub)
    bit-for-bit. Shared by pq_adc_topk and ivfpq_topk so the fold order
    can never diverge between them."""
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    dist = F.lit(0.0)
    for s in range(len(lut)):
        dist = dist + F.element_at(
            F.element_at(lut_lit, s + 1),
            F.element_at(F.col(code_col), s + 1).cast("int") + 1,
        )
    return dist


# ---------------------------------------------------------------- IVF + PQ


def ivfpq_encode(
    df: DataFrame,
    centroids: "list[list[float]]",
    codebooks: "list[list[list[float]]]",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_codes",
    keep_vec: bool = False,
) -> DataFrame:
    """IVF+PQ index build (the FAISS IVFPQ layout, public): assign each
    vector to its nearest coarse centroid (L2), then PQ-encode the RESIDUAL
    (v − centroid) — residual energy is much smaller than raw vectors, so
    the same code budget quantizes far more precisely.

    One vectorized mapInPandas pass (cell argmin + residual + per-subspace
    code argmin, all elementwise-then-sequential-sum so the DuckDB oracle
    reproduces every distance bit-for-bit). Output: input columns (minus
    the vector unless ``keep_vec``) + (cell_col int, code_col array<int>).
    MATERIALIZE it, partitioned by cell for probe locality."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(codebooks)
    d_sub = _validated_d_sub(df, codebooks, vec_col)
    out_cols = [c for c in df.columns if c != vec_col or keep_vec]
    in_df = df.withColumn("__vd", F.col(vec_col).cast("array<double>"))
    schema = StructType(
        [in_df.schema[c] for c in out_cols]
        + [StructField(cell_col, IntegerType()),
           StructField(code_col, ArrayType(IntegerType()))]
    )
    cents = [list(map(float, c)) for c in centroids]
    cb = [[list(map(float, cent)) for cent in sub] for sub in codebooks]

    d = m * d_sub

    def encode(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)                 # (ncells, d)
        B = [np.asarray(sub, dtype=np.float64) for sub in cb]   # m x (k, d_sub)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # dirty vectors (null / wrong length / null elements) get NULL
            # cell+codes rather than crashing the batch
            mask, V = _np_valid_vectors(pdf["__vd"], d)
            diff = V[:, None, :] - C[None, :, :]
            # sequential last-axis sum (d <= 128) — oracle-fold-exact
            cell_d = (diff * diff).sum(axis=2)
            cells = cell_d.argmin(axis=1).astype(np.int32)      # ties -> lowest
            R = V - C[cells]                                    # residuals
            codes = _np_subspace_codes(R, B, m, d_sub)
            out = pdf[out_cols].copy()
            cit = iter(cells)
            out[cell_col] = [int(next(cit)) if ok else None for ok in mask]
            kit = iter(codes)
            out[code_col] = [
                list(map(int, next(kit))) if ok else None for ok in mask
            ]
            yield out

    return in_df.mapInPandas(encode, schema)


def ivfpq_topk(
    encoded: DataFrame,
    centroids: "list[list[float]]",
    codebooks: "list[list[list[float]]]",
    query_vec: Sequence[float],
    n_probe: int = 4,
    k: int = 10,
    cell_col: str = "ivf_cell",
    code_col: str = "pq_codes",
    id_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """IVF+PQ search: probe the ``n_probe`` cells whose centroids are
    nearest the query (driver-side — ncells·d flops), then score ONLY those
    cells' rows by ADC over the residual query (q − centroid_of_cell),
    with one m×k lookup table per probed cell riding the plan as literals
    and a per-cell CASE dispatch. The cell filter prunes the scan when the
    index is partitioned by cell; the top-k is a TakeOrderedAndProject."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    q = [float(v) for v in query_vec]

    def _sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    ranked = sorted(
        range(len(centroids)), key=lambda c: (_sq(q, centroids[c]), c)
    )
    probed = ranked[:n_probe]

    luts = {}
    for c in probed:
        qr = [q[i] - float(centroids[c][i]) for i in range(len(q))]
        luts[c] = [
            [
                _sq(qr[s * d_sub:(s + 1) * d_sub], codebooks[s][code])
                for code in range(len(codebooks[s]))
            ]
            for s in range(m)
        ]

    dist = F.lit(None).cast("double")
    for c in probed:
        dist = F.when(F.col(cell_col) == c, _lut_fold(luts[c], code_col)).otherwise(dist)

    # literal LUTs are codegen-fast but plan size is n_probe·m·k doubles —
    # past ~8k literals (e.g. k=256, m=8, n_probe=4+) Catalyst analysis
    # slows and codegen falls back, so large configurations switch to a
    # broadcast LUT join with a per-row sub-ordered fold (identical fold
    # order, plan size O(1))
    total_lits = sum(len(row) for lut in luts.values() for row in lut)
    cols = [F.col(c) for c in (id_cols or encoded.columns)]
    if id_cols and cell_col not in id_cols:
        cols = cols + [F.col(cell_col)]
    tb = [F.col(c) for c in id_cols] if id_cols else [F.col(cell_col), F.col(code_col)]
    probed_rows = encoded.filter(
        F.col(cell_col).isin([int(c) for c in probed])
    )
    if total_lits <= 8192:
        scored = probed_rows.select(*cols, dist.alias("adc_distance"))
    else:
        spark = encoded.sparkSession
        lut_rows = [
            (int(c), s, code, float(luts[c][s][code]))
            for c in probed
            for s in range(m)
            for code in range(len(codebooks[s]))
        ]
        lut_df = spark.createDataFrame(
            lut_rows, "__cell int, __sub int, __code int, __d double"
        )
        exploded = probed_rows.select(
            *cols, F.posexplode(F.col(code_col)).alias("__sub", "__code")
        )
        scored = (
            exploded.join(
                F.broadcast(lut_df),
                (F.col(cell_col) == F.col("__cell"))
                & (exploded["__sub"] == lut_df["__sub"])
                & (exploded["__code"] == lut_df["__code"]),
            )
            .groupBy(*cols)
            .agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(exploded["__sub"], F.col("__d")))
                        ),
                        lambda s: s["__d"],
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("adc_distance")
            )
        )
    return scored.orderBy("adc_distance", *tb).limit(k)
