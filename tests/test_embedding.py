"""Embedding preprocessing ops: normalization, distributed covariance /
PCA, random projection. Numpy is the reference implementation for the
moment/eigen math; determinism and dirty-row degradation follow the
pq/semdedup test conventions."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import embedding


def _vec_df(spark, vecs, ids=None):
    ids = ids or list(range(len(vecs)))
    return spark.createDataFrame(
        [(i, [float(x) for x in v] if v is not None else None) for i, v in zip(ids, vecs)],
        "id long, v array<double>",
    )


@pytest.fixture(scope="module")
def rng_vecs():
    rng = np.random.RandomState(7)
    # anisotropic cloud so PCA has a meaningful axis ordering
    base = rng.randn(80, 6) * np.array([5.0, 3.0, 1.0, 0.5, 0.25, 0.1])
    rot = np.linalg.qr(rng.randn(6, 6))[0]
    return base @ rot


def test_normalize_unit_and_zero(spark):
    df = _vec_df(spark, [[3.0, 4.0], [0.0, 0.0], None])
    out = embedding.normalize_embeddings(df, "v", "u").orderBy("id").collect()
    assert out[0]["u"] == pytest.approx([0.6, 0.8])
    assert out[1]["u"] is None  # zero norm -> NULL, not NaN
    assert out[2]["u"] is None


def test_normalize_nan_vector_nulls(spark):
    df = _vec_df(spark, [[1.0, float("nan")], [2.0, 0.0]])
    out = embedding.normalize_embeddings(df, "v", "u").orderBy("id").collect()
    assert out[0]["u"] is None
    assert out[1]["u"] == pytest.approx([1.0, 0.0])


def test_covariance_matches_numpy(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist()).repartition(5)
    rows = embedding.embedding_covariance(df, "v").collect()
    d = rng_vecs.shape[1]
    assert len(rows) == d * (d + 1) // 2
    ref_cov = np.cov(rng_vecs.T, bias=True)
    ref_mean = rng_vecs.mean(axis=0)
    for r in rows:
        assert r["n"] == len(rng_vecs)
        assert r["cov"] == pytest.approx(ref_cov[r["i"], r["j"]], abs=1e-9)
        assert r["mean_i"] == pytest.approx(ref_mean[r["i"]], abs=1e-9)


def test_covariance_ddof_and_dirty_rows(spark, rng_vecs):
    vecs = rng_vecs.tolist() + [None, [1.0] * 3, [float("inf")] * 6]
    df = _vec_df(spark, vecs).repartition(4)
    rows = embedding.embedding_covariance(df, "v", ddof=1).collect()
    ref = np.cov(rng_vecs.T, bias=False)
    for r in rows:
        assert r["n"] == len(rng_vecs)  # dirty rows excluded
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=1e-9)


def test_pca_train_matches_numpy_eig(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist()).repartition(3)
    model = embedding.pca_train(df, "v", k=3)
    ref_cov = np.cov(rng_vecs.T, bias=True)
    vals = np.sort(np.linalg.eigvalsh(ref_cov))[::-1]
    assert model["explained_variance"] == pytest.approx(vals[:3].tolist(), rel=1e-9)
    comps = np.array(model["components"])
    # orthonormal rows
    assert comps @ comps.T == pytest.approx(np.eye(3), abs=1e-9)
    # sign convention: largest-|entry| positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_transform_variance_order_and_centering(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist())
    model = embedding.pca_train(df, "v", k=3)
    out = embedding.pca_transform(df, "v", model).orderBy("id").collect()
    proj = np.array([r["pca"] for r in out])
    # projected variance per component == explained_variance, mean ~ 0
    assert proj.mean(axis=0) == pytest.approx([0.0] * 3, abs=1e-9)
    assert proj.var(axis=0) == pytest.approx(model["explained_variance"], rel=1e-6)
    # off-diagonal decorrelation
    c = np.cov(proj.T, bias=True)
    assert abs(c[0, 1]) < 1e-6 and abs(c[0, 2]) < 1e-6


def test_pca_transform_dirty_rows_null(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist())
    model = embedding.pca_train(df, "v", k=2)
    dirty = _vec_df(spark, [None, [1.0, 2.0], rng_vecs[0].tolist()])
    out = embedding.pca_transform(dirty, "v", model).orderBy("id").collect()
    assert out[0]["pca"] is None
    assert out[1]["pca"] is None  # ragged length
    assert out[2]["pca"] is not None


def test_pca_determinism_under_repartition(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist())
    m1 = embedding.pca_train(df.repartition(2), "v", k=2)
    m2 = embedding.pca_train(df.repartition(13), "v", k=2)
    assert np.array(m1["components"]) == pytest.approx(
        np.array(m2["components"]), abs=1e-9
    )


def test_pca_train_k_bounds(spark):
    df = _vec_df(spark, [[1.0, 2.0], [3.0, 4.0]])
    with pytest.raises(ValueError):
        embedding.pca_train(df, "v", k=3)


def test_random_projection_matches_python_signs(spark):
    """The md5 sign family replays in plain Python (the oracle contract)."""
    import hashlib

    vecs = [[1.0, -2.0, 0.5, 3.0], [0.0, 1.0, 1.0, -1.0]]
    df = _vec_df(spark, vecs)
    out = (
        embedding.random_projection(df, "v", 3, seed=9, hash_fn="md5", scale=False)
        .orderBy("id")
        .collect()
    )

    def sign(p, i):
        h = int(hashlib.md5(f"9:{p}:{i}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    for row, v in zip(out, vecs):
        for p in range(3):
            ref = sum(x * sign(p, i) for i, x in enumerate(v))
            assert row["rp"][p] == pytest.approx(ref, abs=1e-12)


def test_random_projection_scale_and_null(spark):
    df = _vec_df(spark, [[2.0, 2.0], None])
    out = embedding.random_projection(df, "v", 4, seed=1).orderBy("id").collect()
    unscaled = embedding.random_projection(df, "v", 4, seed=1, scale=False).orderBy("id").collect()
    assert out[1]["rp"] is None
    for a, b in zip(out[0]["rp"], unscaled[0]["rp"]):
        assert a == pytest.approx(b / math.sqrt(4), abs=1e-12)


def test_random_projection_distance_preservation(spark):
    """Loose JL sanity: projecting 64->16 keeps pairwise distance ratios
    within a generous band for a handful of random points."""
    rng = np.random.RandomState(3)
    pts = rng.randn(12, 64)
    df = _vec_df(spark, pts.tolist())
    out = embedding.random_projection(df, "v", 16, seed=5).orderBy("id").collect()
    proj = np.array([r["rp"] for r in out])
    for a in range(0, 12, 3):
        for b in range(a + 1, 12, 3):
            orig = np.linalg.norm(pts[a] - pts[b])
            new = np.linalg.norm(proj[a] - proj[b])
            assert 0.4 < new / orig < 1.9


def test_covariance_single_shuffle_plan(spark, rng_vecs):
    """Scale guard: the covariance plan carries exactly one Exchange (the
    (i, j) groupBy over partition partials) — the corpus itself never
    shuffles."""
    df = _vec_df(spark, rng_vecs.tolist()).repartition(4)
    plan = embedding.embedding_covariance(df, "v")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    # repartition(4) contributes one; the groupBy one more; no others
    assert n_exchanges <= 2, plan


def test_projection_no_shuffle_plan(spark, rng_vecs):
    df = _vec_df(spark, rng_vecs.tolist())
    model = embedding.pca_train(df, "v", k=2)
    for out in (
        embedding.pca_transform(df, "v", model),
        embedding.random_projection(df, "v", 4),
        embedding.normalize_embeddings(df, "v", "u"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


# ------------------------------------------------- review-round regressions


def test_covariance_dim_is_majority_not_first(spark):
    """A ragged leading vector must not redefine the corpus dimension."""
    df = _vec_df(spark, [[1.0, 2.0], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]).coalesce(1)
    rows = embedding.embedding_covariance(df, "v").collect()
    assert rows[0]["n"] == 2  # the two 3-dim vectors, not the 2-dim outlier
    assert max(r["j"] for r in rows) == 2


def test_normalize_large_dim_values_exact(spark):
    """Norm is hoisted (O(d) per row); values must match numpy exactly."""
    rng = np.random.RandomState(1)
    vec = rng.randn(256).tolist()
    df = _vec_df(spark, [vec])
    out = embedding.normalize_embeddings(df, "v", "u").first()["u"]
    ref = np.array(vec) / np.linalg.norm(vec)
    assert out == pytest.approx(ref.tolist(), abs=1e-12)


def test_random_projection_empty_vector_nulls(spark):
    """A zero-length vector must project to NULL, not an array of NULLs
    (sequence(0,-1) descends and zip_with pads with NULLs otherwise)."""
    df = spark.createDataFrame([(0, []), (1, [1.0, 2.0])], "id long, v array<double>")
    out = embedding.random_projection(df, "v", 3, seed=2).orderBy("id").collect()
    assert out[0]["rp"] is None
    assert out[1]["rp"] is not None and None not in out[1]["rp"]


# ----------------------- r08: embedding drift -----------------------------


def test_embedding_drift_identical_and_shifted(spark):
    from datachain_spark.ops.embedding import embedding_drift

    base = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, -2.0]) for i in range(30)],
        "id long, v array<double>",
    )
    same = embedding_drift(base, base, "v").collect()[0]
    assert same["n_old"] == same["n_new"] == 30
    assert abs(same["centroid_l2"]) < 1e-12
    assert abs(same["centroid_cos"] - 1.0) < 1e-12
    assert abs(same["var_delta_l2"]) < 1e-12
    assert abs(same["mean_sq_norm_old"] - same["mean_sq_norm_new"]) < 1e-12

    # shift every vector by +1 on dim 0: centroid moves exactly 1,
    # variances unchanged
    from pyspark.sql import functions as F
    shifted = base.select(
        "id",
        F.array(
            F.col("v")[0] + F.lit(1.0), F.col("v")[1], F.col("v")[2]
        ).alias("v"),
    )
    d = embedding_drift(base, shifted, "v").collect()[0]
    assert abs(d["centroid_l2"] - 1.0) < 1e-9
    assert abs(d["var_delta_l2"]) < 1e-9

    # ragged minority rows are excluded by the modal-dimension rule
    ragged = base.union(spark.createDataFrame(
        [(99, [1.0])], "id long, v array<double>"
    ))
    r = embedding_drift(base, ragged, "v").collect()[0]
    assert r["n_new"] == 30

    import pytest as _pt
    short = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    with _pt.raises(ValueError, match="dimension mismatch"):
        embedding_drift(base, short, "v")


def test_embedding_drift_versions_resolution(session, tmp_path):
    from datachain_spark.catalog.metastore import Metastore
    from datachain_spark.ops.embedding import embedding_drift_versions

    ms = Metastore(str(tmp_path / "ms_ed"))
    old_ms, session.metastore = session.metastore, ms
    try:
        spark = session.spark
        v1 = spark.createDataFrame(
            [(i, [0.0, 1.0]) for i in range(10)], "id long, v array<double>"
        )
        v2 = spark.createDataFrame(
            [(i, [3.0, 5.0]) for i in range(10)], "id long, v array<double>"
        )
        ms.save_dataset(v1, "emb_ds")   # 1.0.0
        ms.save_dataset(v2, "emb_ds")   # 1.0.1
        got = embedding_drift_versions("emb_ds", "v", session=session).collect()[0]
        assert (got["v_old"], got["v_new"]) == ("1.0.0", "1.0.1")
        assert abs(got["centroid_l2"] - 5.0) < 1e-9  # (3,4) shift
        import pytest as _pt
        with _pt.raises(ValueError, match="no version before"):
            embedding_drift_versions("emb_ds", "v", v_new="==1.0.0", session=session)
    finally:
        session.metastore = old_ms
