"""ops/profile.profile_table (one-pass column profiling) and
card.dataset_card (metadata-only markdown cards) + CLI card."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops.profile import profile_table


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, None), (3, "a", 4.0)],
        "k int, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 3
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["null_frac"] == 0.25
    assert prof["s"]["n_distinct"] == 2  # NULL excluded
    assert prof["s"]["mean"] is None and prof["s"]["stddev"] is None
    assert prof["v"]["min_str"] == "1.0" and prof["v"]["max_str"] == "4.0"
    assert prof["v"]["mean"] == pytest.approx(7.0 / 3)


def test_profile_single_aggregation_plan(spark, tmp_path):
    # a real file source so the scan is visible in the physical plan —
    # spark.range() renders as 'Range' and would make a scan-count
    # assertion vacuously true
    p = str(tmp_path / "prof.parquet")
    spark.range(100).withColumn("s", F.col("id").cast("string")).write.parquet(p)
    prof = profile_table(spark.read.parquet(p))
    plan = prof._jdf.queryExecution().executedPlan().toString()
    # exactly one scan of the source, one aggregate tree — never a
    # per-column re-scan
    assert plan.count("Scan parquet") == 1, plan


def test_profile_skips_complex_and_validates(spark):
    df = spark.createDataFrame([(1, [1, 2])], "k int, arr array<int>")
    prof = profile_table(df)
    assert [r["column"] for r in prof.collect()] == ["k"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no scalar"):
        profile_table(df.select("arr"))


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "k int")
    row = profile_table(df).collect()[0]
    assert row["n_rows"] == 0 and row["null_frac"] == 0.0


def test_dataset_card_contents(session):
    dcs.read_values(k=[1, 2, 3], v=["x", "y", "z"], session=session).save(
        "card_t", description="test corpus", attrs={"stage": "raw"}
    )
    dcs.read_values(k=[1], v=["x"], session=session).save("card_t")
    md = dcs.dataset_card("card_t", session=session)
    assert "# local.default.card_t" in md and "test corpus" in md
    assert "1.0.1" in md and "1.0.0" in md  # both versions listed
    assert "| k | long |" in md and "| v | string |" in md
    assert "stage=raw" in md and "```json" in md
    with pytest.raises(Exception, match="not found"):
        dcs.dataset_card("nope_ds", session=session)


def test_session_spark_is_lazy(tmp_path):
    # metadata-only flows (dataset_card, vacuum, CLI card) must not boot
    # a JVM: Session.spark materializes on first use only
    from datachain_spark.session import Session

    sess = Session(metastore_dir=str(tmp_path / "ms"))
    assert sess._spark is None
    sess.metastore.list_datasets()  # metastore works without spark
    assert sess._spark is None
    sess.stop()  # no-op on the never-materialized spark


def test_dataset_card_cli(session):
    import subprocess
    import sys

    dcs.read_values(k=[1], v=["x"], session=session).save("card_cli")
    out = subprocess.run(
        [sys.executable, "-m", "datachain_spark.cli",
         "--metastore", session.metastore.root, "card", "card_cli"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "# local.default.card_cli" in out.stdout
