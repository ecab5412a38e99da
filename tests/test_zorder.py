"""Z-order layout (ops/zorder) — key interleave known values, clustering
quality vs a single-column sort, write integration, and edge cases."""

import glob
import random

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops import zorder as z


def _py_zkey(qvals, bits):
    n = len(qvals)
    key = 0
    for i in range(bits):
        for j, q in enumerate(qvals):
            key |= ((q >> i) & 1) << (i * n + j)
    return key


def test_zorder_key_known_values(session):
    # bounds 0..15 with bits=4: identity quantization (v*16/15 floored...
    # actually frac*2^bits clamped) — verify against the Python interleave
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = session.spark.createDataFrame(rows, "x long, y long")
    bounds = z.zorder_bounds(df, ["x", "y"])
    assert bounds == {"x": (0.0, 15.0), "y": (0.0, 15.0)}
    out = df.withColumn("k", z.zorder_key(["x", "y"], bounds, bits=4)).collect()

    def q(v):
        frac = (v - 0.0) / 15.0
        return min(15, max(0, int(frac * 16)))

    for r in out:
        assert r["k"] == _py_zkey([q(r["x"]), q(r["y"])], 4)
    # distinct corners map to opposite curve ends
    ks = {(r["x"], r["y"]): r["k"] for r in out}
    assert ks[(0, 0)] == 0
    assert ks[(15, 15)] == 255


def test_zorder_key_validation_and_edges(session):
    df = session.spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        z.zorder_key([], {}, bits=8)
    with pytest.raises(ValueError):
        z.zorder_key(["x", "y"], {"x": (0, 1), "y": (0, 1)}, bits=32)
    # constant and all-null columns contribute zero bits, nulls -> level 0
    rows = [(1, None, 5), (2, None, 5), (None, None, 5)]
    df = session.spark.createDataFrame(rows, "x long, y long, c long")
    bounds = z.zorder_bounds(df, ["x", "y", "c"])
    out = df.withColumn("k", z.zorder_key(["x", "y", "c"], bounds, bits=4)).collect()
    got = {r["x"]: r["k"] for r in out}
    assert got[None] == 0 and got[1] == 0  # x=1 is min -> level 0
    assert got[2] > 0


def test_zorder_layout_tightens_both_dims(session, tmp_path):
    """The whole point: after z-order, per-file min/max spans shrink on
    BOTH columns; after a plain x-sort, y spans stay ~global."""
    rng = random.Random(42)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(20_000)]
    df = session.spark.createDataFrame(rows, "x long, y long")

    zp = str(tmp_path / "zord")
    # 16 files = 4 leading key bits (y7 x7 y6 x6): each file covers ~a
    # quarter-by-quarter block of the 2D domain, so BOTH spans sit near
    # 2500/10000 (plus boundary straddle; range boundaries come from a
    # randomized sample, so margins stay generous)
    dc.DataChain(df).to_parquet(zp, zorder_by=["x", "y"], zorder_files=16)
    sp = str(tmp_path / "sort")
    dc.DataChain(df.repartitionByRange(8, "x").sortWithinPartitions("x")).to_parquet(sp)

    def spans(path):
        files = [f for f in glob.glob(path + "/*.parquet")]
        assert len(files) >= 4
        sx, sy = [], []
        for f in files:
            r = session.spark.read.parquet(f).agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            ).collect()[0]
            sx.append(r["sx"])
            sy.append(r["sy"])
        return sum(sx) / len(sx), sum(sy) / len(sy)

    zx, zy = spans(zp)
    px, py = spans(sp)
    # z-order: both dims bounded well away from the 10k global span
    assert zx < 6_500 and zy < 6_500, (zx, zy)
    # plain x-sort: x tight but y spans ~everything — z-order must beat it
    assert py > 9_000, py
    assert zy < py * 0.7, (zy, py)


def test_zorder_write_roundtrip_and_exclusivity(session, tmp_path):
    df = session.spark.createDataFrame([(i, i * 2) for i in range(100)], "a long, b long")
    p = str(tmp_path / "rt")
    dc.DataChain(df).to_parquet(p, zorder_by=["a", "b"], zorder_bits=4)
    back = session.spark.read.parquet(p)
    assert back.count() == 100
    assert sorted(back.columns) == ["a", "b"]  # __zkey never leaks
    with pytest.raises(ValueError):
        dc.DataChain(df).to_parquet(p, zorder_by=["a"], sort_by=["b"])


def test_zorder_reused_bounds(session):
    """Precomputed bounds shared across batches give identical keys."""
    df1 = session.spark.createDataFrame([(i, i) for i in range(50)], "x long, y long")
    bounds = z.zorder_bounds(df1, ["x", "y"])
    k1 = df1.withColumn("k", z.zorder_key(["x", "y"], bounds, 6)).collect()
    k2 = df1.withColumn("k", z.zorder_key(["x", "y"], dict(bounds), 6)).collect()
    assert sorted(map(tuple, k1)) == sorted(map(tuple, k2))


def test_zorder_quantile_strategy_resists_skew(session):
    """A power-law column collapses minmax quantization onto a few levels;
    quantile quantization spreads it across ~2^bits equal-population
    levels — measured as distinct-key diversity on the same data."""
    rng = random.Random(7)
    # heavy tail: 99% of values tiny, a few huge
    rows = [(int(rng.paretovariate(0.5)), rng.randrange(1000)) for _ in range(5000)]
    df = session.spark.createDataFrame(rows, "x long, y long")
    bounds = z.zorder_bounds(df, ["x", "y"])
    mm = df.withColumn("k", z.zorder_key(["x", "y"], bounds, bits=6))
    qq = z._quantile_keyed(df, ["x", "y"], bits=6).withColumnRenamed("__zkey", "k")
    # x's contribution under minmax: almost all rows land on x-level 0
    mm_x_levels = mm.select(
        F.floor((F.col("x") - bounds["x"][0]) / (bounds["x"][1] - bounds["x"][0]) * 64)
    ).distinct().count()
    assert mm_x_levels < 15
    nmm = mm.select("k").distinct().count()
    nqq = qq.select("k").distinct().count()
    assert nqq > nmm * 2, (nmm, nqq)


def test_zorder_quantile_write_keeps_types(session, tmp_path):
    rng = random.Random(9)
    rows = [(int(rng.paretovariate(1.0)), rng.randrange(100)) for _ in range(2000)]
    df = session.spark.createDataFrame(rows, "x long, y long")
    p = str(tmp_path / "q")
    dc.DataChain(df).to_parquet(
        p, zorder_by=["x", "y"], zorder_files=4, zorder_strategy="quantile"
    )
    back = session.spark.read.parquet(p)
    assert back.count() == 2000
    assert dict(back.dtypes) == {"x": "bigint", "y": "bigint"}
    with pytest.raises(ValueError):
        z.zorder_layout(df, ["x"], strategy="rank")


def test_save_zorder_by(session, tmp_path):
    """save(zorder_by=...) stores the version Morton-clustered: data round-
    trips through the catalog, per-file spans tighten, and bucket_by is
    rejected alongside it."""
    rng = random.Random(21)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(10_000)]
    df = session.spark.createDataFrame(rows, "x long, y long")
    ch = dc.DataChain(df).save("zorder_saved", zorder_by=["x", "y"], zorder_files=8)
    assert ch.count() == 10_000
    back = dc.read_dataset("zorder_saved", session=session)
    assert back.count() == 10_000
    data_dir = session.metastore.version_data_path(
        "local.default.zorder_saved", "1.0.0"
    )
    files = glob.glob(data_dir + "/*.parquet")
    assert len(files) >= 4
    spans = []
    for f in files:
        r = session.spark.read.parquet(f).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).collect()[0]
        spans.append((r["sx"], r["sy"]))
    assert sum(s[0] for s in spans) / len(spans) < 7_000
    assert sum(s[1] for s in spans) / len(spans) < 7_000
    with pytest.raises(ValueError):
        dc.DataChain(df).save("zb", zorder_by=["x"], bucket_by=["y"])


def test_zorder_quantile_rejects_bounds(session):
    df = session.spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        z.zorder_layout(df, ["x", "y"], strategy="quantile",
                        bounds={"x": (0, 1), "y": (0, 1)})


def test_zorder_rejects_partition_cols_and_save_strategy(session, tmp_path):
    rng = random.Random(31)
    rows = [(int(rng.paretovariate(1.0)), rng.randrange(10)) for _ in range(1000)]
    df = session.spark.createDataFrame(rows, "x long, p long")
    with pytest.raises(ValueError):
        dc.DataChain(df).to_parquet(
            str(tmp_path / "bad"), zorder_by=["x"], partition_cols=["p"]
        )
    # save() exposes the quantile strategy for heavy-tailed columns
    ch = dc.DataChain(df).save(
        "zq_saved", zorder_by=["x", "p"], zorder_files=4,
        zorder_strategy="quantile",
    )
    assert ch.count() == 1000
