"""ops/selection.weighted_sample (A-ES determinism + Python md5
differential) and metastore vacuum_dataset retention GC."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops.selection import weighted_sample


def _docs(spark, n=50):
    return spark.createDataFrame(
        [(i, float(1 + (i * 13) % 17)) for i in range(n)], "id int, w double"
    )


def _py_keys(n=50, seed=7):
    keys = {}
    for i in range(n):
        w = float(1 + (i * 13) % 17)
        h = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16)
        u = ((h % 2**31) + 1.0) / (2**31 + 1.0)
        keys[i] = math.log(u) / w
    return keys


def test_weighted_sample_matches_python_reference(spark):
    out = weighted_sample(_docs(spark), "w", 10, "id", seed=7, hash_fn="md5")
    got = {r["id"]: r["sample_key"] for r in out.collect()}
    keys = _py_keys()
    expect = sorted(keys, key=lambda i: (-keys[i], i))[:10]
    assert sorted(got) == sorted(expect)
    for i, k in got.items():
        assert k == pytest.approx(keys[i], rel=1e-12)


def test_weighted_sample_superset_and_determinism(spark):
    df = _docs(spark)
    small = {r["id"] for r in weighted_sample(df, "w", 5, "id", hash_fn="md5").collect()}
    big = {r["id"] for r in weighted_sample(df, "w", 12, "id", hash_fn="md5").collect()}
    assert small < big  # larger draws are strict supersets
    again = {r["id"] for r in weighted_sample(df.repartition(7), "w", 5, "id", hash_fn="md5").collect()}
    assert small == again  # partitioning-independent


def test_weighted_sample_skips_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)], "id int, w double"
    )
    got = {r["id"] for r in weighted_sample(df, "w", 10, "id").collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample(df, "w", 0, "id")


def test_weighted_sample_null_id_fails_loudly(spark):
    # a NULL id has no deterministic uniform -> silently biased draw;
    # the in-expression guard must fail the job instead
    df = spark.createDataFrame(
        [(1, 5.0), (None, 3.0), (2, 2.0)], "id int, w double"
    )
    with pytest.raises(Exception, match="NULL value in id_col"):
        weighted_sample(df, "w", 2, "id").collect()


def test_dataset_card_empty_versions(session, tmp_path):
    # a manifest with zero versions -> clean error, not AttributeError
    from datachain_spark.catalog.metastore import DatasetNotFoundError

    dcs.read_values(k=[1], session=session).save("card_empty")
    rec = session.metastore.get_record("card_empty")
    rec.versions.clear()
    session.metastore._write_record(rec)
    with pytest.raises(DatasetNotFoundError, match="no versions"):
        dcs.dataset_card("card_empty", session=session)


# ------------------------------------------------------------- vacuum ----

def _mk_versions(session, name, n):
    for i in range(n):
        dcs.read_values(k=[1, 2], v=[i, i], session=session).save(name)


def test_vacuum_keeps_newest(session):
    _mk_versions(session, "vac_a", 5)
    ms = session.metastore
    versions = sorted(v.version for v in ms.get_record("vac_a").versions)
    removed = dcs.vacuum_dataset("vac_a", keep_last=2, session=session)
    assert sorted(removed) == versions[:3]
    left = sorted(v.version for v in ms.get_record("vac_a").versions)
    assert left == versions[3:]
    # latest still readable; vacuumed version gone
    assert dcs.read_dataset("vac_a", session=session).df.count() == 2
    with pytest.raises(Exception):
        dcs.read_dataset("vac_a", version=versions[0], session=session).df.count()


def test_vacuum_dry_run_and_grace(session):
    _mk_versions(session, "vac_b", 3)
    ms = session.metastore
    would = ms.vacuum_dataset("vac_b", keep_last=1, dry_run=True)
    assert len(would) == 2 and len(ms.get_record("vac_b").versions) == 3
    # every version is seconds old: a 1-hour grace protects them all
    assert ms.vacuum_dataset("vac_b", keep_last=1, older_than=3600) == []
    assert len(ms.get_record("vac_b").versions) == 3
    with pytest.raises(ValueError, match="keep_last"):
        ms.vacuum_dataset("vac_b", keep_last=0)


def test_vacuum_cli(session, tmp_path):
    import subprocess
    import sys

    _mk_versions(session, "vac_cli", 3)
    out = subprocess.run(
        [sys.executable, "-m", "datachain_spark.cli",
         "--metastore", session.metastore.root, "vacuum", "vac_cli",
         "--keep-last", "1", "--dry-run"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "would remove 2 version(s)" in out.stdout


def test_sample_n_uniform_exact(session):
    ch = dcs.read_values(id=list(range(100)), session=session)
    s1 = ch.sample_n(10, "id")
    assert s1.count() == 10 and "sample_key" not in s1.df.columns
    # determinism + superset under larger n
    ids1 = {r["id"] for r in s1.to_records()}
    ids1b = {r["id"] for r in ch.sample_n(10, "id").to_records()}
    assert ids1 == ids1b
    ids2 = {r["id"] for r in ch.sample_n(25, "id").to_records()}
    assert ids1 <= ids2


def test_flag_outliers_clamp(session):
    from datachain_spark.ops.sketches import flag_outliers

    df = session.spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("a", None)],
        "g string, v double",
    )
    out = {r["v"]: r for r in
           flag_outliers(df, "v", "g", clamp_col="v_clamped").collect()}
    assert out[100.0]["v_clamped"] == out[100.0]["fence_hi"]  # winsorized
    assert out[2.0]["v_clamped"] == 2.0
    assert out[None]["v_clamped"] is None
    with pytest.raises(ValueError, match="clamp_col"):
        flag_outliers(df, "v", "g", clamp_col="v")


def test_weighted_sample_key_col_collision_raises(spark):
    # ADVICE r05: withColumn silently overwrote a pre-existing sample_key
    from datachain_spark.ops.selection import weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, 1.0, 0.5)], "id int, w double, sample_key double"
    )
    with pytest.raises(ValueError, match="key_col"):
        weighted_sample(df, "w", 1, "id")
    with pytest.raises(ValueError, match="key_col"):
        weighted_sample_per_group(df, "id", "w", 1, "id")
    # a non-colliding key_col still works
    assert weighted_sample(df, "w", 1, "id", key_col="__aes").count() == 1
