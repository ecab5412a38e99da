"""File-level zone maps (ops/pruning): index correctness, the overlap
rule (incl. NULL-zone conservatism), the one-row skip report, and that a
pruned read returns exactly what the full filtered scan returns."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.pruning import (
    file_stats_index,
    prune_report,
    prune_zones,
    pruned_read,
)


@pytest.fixture()
def two_file_dir(session, tmp_path):
    # two deterministic files: keys 0-49 and 50-99 (value NULL in file 0)
    d = str(tmp_path / "zones")
    df = session.spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") >= 50, F.col("id") * 2.0).alias("v"),
        (F.col("id") >= 50).cast("int").alias("half"),
    )
    df.repartition("half").write.partitionBy("half").parquet(d)
    return d


def test_index_and_zones(session, two_file_dir):
    idx = file_stats_index(
        session.spark.read.parquet(two_file_dir), ["k", "v"]
    )
    rows = {(r["k_min"], r["k_max"]): r for r in idx.collect()}
    assert set(rows) == {(0, 49), (50, 99)}
    assert all(r["n_rows"] == 50 for r in rows.values())
    lo = rows[(0, 49)]
    assert lo["v_min"] is None and lo["v_max"] is None
    hi = rows[(50, 99)]
    assert hi["v_min"] == 100.0 and hi["v_max"] == 198.0

    z = prune_zones(idx, {"k": (10, 20)}).collect()
    kept = {r["k_min"]: r["kept"] for r in z}
    assert kept == {0: True, 50: False}

    # NULL zone is conservatively kept even though no v matches
    z2 = prune_zones(idx, {"v": (0.0, 1.0)}).collect()
    kept2 = {r["k_min"]: r["kept"] for r in z2}
    assert kept2 == {0: True, 50: False}

    # conjunction across columns
    z3 = prune_zones(idx, {"k": (60, 70), "v": (0.0, 1.0)}).collect()
    assert {r["k_min"]: r["kept"] for r in z3} == {0: False, 50: False}


def test_prune_report_and_read(session, two_file_dir):
    df = session.spark.read.parquet(two_file_dir)
    idx = file_stats_index(df, ["k"])
    rep = prune_report(idx, {"k": (0, 10)}).first()
    assert rep["total_files"] == 2 and rep["kept_files"] == 1
    assert rep["total_rows"] == 100 and rep["kept_rows"] == 50
    assert rep["file_skip_frac"] == 0.5 and rep["row_skip_frac"] == 0.5

    pr = pruned_read(session.spark, idx, {"k": (0, 10)})
    got = sorted(r["k"] for r in pr.filter(F.col("k") <= 10).collect())
    want = sorted(
        r["k"] for r in df.filter(F.col("k") <= 10).collect()
    )
    assert got == want
    with pytest.raises(ValueError):
        pruned_read(session.spark, idx, {"k": (1000, 2000)})


def test_validation(session, two_file_dir):
    idx = file_stats_index(
        session.spark.read.parquet(two_file_dir), ["k"]
    )
    with pytest.raises(ValueError):
        file_stats_index(session.spark.read.parquet(two_file_dir), [])
    with pytest.raises(ValueError):
        prune_zones(idx, {})
    with pytest.raises(ValueError):
        prune_zones(idx, {"v": (0, 1)})  # no v zones in this index


def test_metastore_zone_workflow(session, sf_dir):
    # save a Z-ordered version (range-clustered files -> tight zones),
    # index it, answer a range predicate from the index, scan pruned
    import datachain_spark as dc

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)
    orders.save("zmap_orders", zorder_by=["o_orderkey"], zorder_files=4)
    ms = session.metastore
    dv = ms.zone_index_dataset(
        session.spark, "zmap_orders", ["o_orderkey"]
    )
    assert dv.attrs["zones_of"] == "zmap_orders"
    idx, _, _ = ms.load_dataset(session.spark, "zmap_orders__zones")
    assert idx.count() >= 2  # multiple files, each with its own zone

    lo_key = 5
    rep = ms.prune_stats(
        session.spark, "zmap_orders", {"o_orderkey": (0, lo_key)}
    ).first()
    assert rep["total_files"] >= 2
    assert rep["kept_files"] < rep["total_files"]  # zorder made zones tight

    pr = ms.read_pruned(
        session.spark, "zmap_orders", {"o_orderkey": (0, lo_key)}
    ).filter(F.col("o_orderkey") <= lo_key)
    full = orders.df.filter(F.col("o_orderkey") <= lo_key)
    assert sorted(r["o_orderkey"] for r in pr.collect()) == sorted(
        r["o_orderkey"] for r in full.collect()
    )

    # versions without an index refuse loudly
    from datachain_spark.error import DatasetNotFoundError

    orders.save("zmap_orders")  # new version, not indexed
    with pytest.raises(DatasetNotFoundError):
        ms.prune_stats(session.spark, "zmap_orders", {"o_orderkey": (0, 1)})
    # the OLD version's index still resolves by pinning the version
    assert ms.prune_stats(
        session.spark, "zmap_orders", {"o_orderkey": (0, 1)},
        version="1.0.0",
    ).first()["total_files"] >= 2


def test_cli_zones_and_prune(session, sf_dir, capsys):
    import datachain_spark as dc
    from datachain_spark.cli import main

    dc.read_parquet(f"{sf_dir}/orders.parquet", session=session).save(
        "cli_zmap", zorder_by=["o_orderkey"], zorder_files=4
    )
    ms = session.metastore_dir
    assert main(["--metastore", ms, "zones", "cli_zmap",
                 "--cols", "o_orderkey"]) == 0
    assert "cli_zmap__zones" in capsys.readouterr().out
    assert main(["--metastore", ms, "prune", "cli_zmap",
                 "--col", "o_orderkey", "--lo", "0", "--hi", "5"]) == 0
    out = capsys.readouterr().out
    assert "kept" in out and "skip" in out


def test_read_dataset_prune_param(session, sf_dir):
    import datachain_spark as dc
    import pytest as _pytest

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)
    orders.save("rd_zmap", zorder_by=["o_orderkey"], zorder_files=4)
    session.metastore.zone_index_dataset(
        session.spark, "rd_zmap", ["o_orderkey"]
    )
    got = dc.read_dataset(
        "rd_zmap", session=session, prune={"o_orderkey": (0, 9)}
    ).to_records()
    want = orders.filter(F.col("o_orderkey").between(0, 9)).to_records()
    assert sorted(r["o_orderkey"] for r in got) == sorted(
        r["o_orderkey"] for r in want
    )
    with _pytest.raises(ValueError, match="incompatible"):
        dc.read_dataset("rd_zmap", session=session, delta=True,
                        delta_on="o_orderkey", prune={"o_orderkey": (0, 1)})


def test_save_zone_index_param(session, sf_dir):
    import datachain_spark as dc

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)
    orders.save("svz", zorder_by=["o_orderkey"], zorder_files=4,
                zone_index=["o_orderkey"])
    # prune works immediately, no separate index step
    got = dc.read_dataset(
        "svz", session=session, prune={"o_orderkey": (0, 5)}
    ).to_records()
    want = orders.filter(F.col("o_orderkey") <= 5).to_records()
    assert len(got) == len(want)
    rep = session.metastore.prune_stats(
        session.spark, "svz", {"o_orderkey": (0, 5)}).first()
    assert rep["kept_files"] < rep["total_files"]


def test_pruned_read_base_path_keeps_partition_cols(session, two_file_dir):
    df = session.spark.read.parquet(two_file_dir)
    idx = file_stats_index(df, ["k"])
    pr = pruned_read(session.spark, idx, {"k": (60, 70)},
                     base_path=two_file_dir)
    assert "half" in pr.columns  # hive partition column survives
    assert {r["half"] for r in pr.select("half").distinct().collect()} == {1}
    # without base_path the leaf read loses it (the documented caveat)
    bare = pruned_read(session.spark, idx, {"k": (60, 70)})
    assert "half" not in bare.columns


def test_read_pruned_empty_survivors_returns_empty(session, sf_dir):
    import datachain_spark as dc

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)
    orders.save("zmap_empty", zorder_by=["o_orderkey"], zorder_files=4,
                zone_index=["o_orderkey"])
    out = session.metastore.read_pruned(
        session.spark, "zmap_empty", {"o_orderkey": (10**9, 2 * 10**9)}
    )
    assert out.count() == 0
    assert "o_orderkey" in out.columns  # version schema preserved
    # via the reader flag too
    assert dc.read_dataset(
        "zmap_empty", session=session,
        prune={"o_orderkey": (10**9, 2 * 10**9)},
    ).count() == 0
    # interval validation errors still raise (not swallowed as empty)
    with pytest.raises(ValueError, match="lacks zones"):
        session.metastore.read_pruned(
            session.spark, "zmap_empty", {"o_totalprice": (0, 1)})


def test_prune_zones_string_column_typed_bounds(session, tmp_path):
    # string zone columns: string bounds prune correctly; numeric bounds
    # raise instead of silently NULLing the overlap into a file drop
    d = str(tmp_path / "szones")
    df = session.spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("key_"), F.lpad(F.col("id").cast("string"), 3, "0"))
        .alias("s"),
        (F.col("id") >= 50).cast("int").alias("half"),
    )
    df.repartition("half").write.partitionBy("half").parquet(d)
    idx = file_stats_index(session.spark.read.parquet(d), ["s"])
    z = {r["s_min"]: r["kept"]
         for r in prune_zones(idx, {"s": ("key_000", "key_010")}).collect()}
    assert z == {"key_000": True, "key_050": False}
    with pytest.raises(ValueError, match="numeric bounds"):
        prune_zones(idx, {"s": (0, 10)})
    # report path inherits the same guard
    with pytest.raises(ValueError, match="numeric bounds"):
        prune_report(idx, {"s": (0.0, 10.0)})


def test_cli_prune_string_zone_column(session, sf_dir, capsys):
    import datachain_spark as dc
    from datachain_spark.cli import main

    dc.read_parquet(f"{sf_dir}/orders.parquet", session=session).save(
        "cli_zmap_str", zorder_by=["o_orderkey"], zorder_files=4,
        zone_index=["o_orderpriority"],
    )
    ms = session.metastore_dir
    # string bounds reach the string-typed zones untouched (pre-fix the
    # CLI float-coerced these and crashed / NULLed the comparison)
    assert main(["--metastore", ms, "prune", "cli_zmap_str",
                 "--col", "o_orderpriority",
                 "--lo", "1-URGENT", "--hi", "1-URGENT"]) == 0
    out = capsys.readouterr().out
    assert "kept" in out and "0 files indexed" not in out
    # unknown column errors cleanly instead of raising
    assert main(["--metastore", ms, "prune", "cli_zmap_str",
                 "--col", "nope", "--lo", "0", "--hi", "1"]) == 1


def test_file_stats_index_non_file_plan_empty(session):
    # an aggregated (shuffled) frame has no file identity: the fallback
    # must yield an EMPTY index, not one bogus global zone
    agg = session.spark.range(100).groupBy((F.col("id") % 3).alias("g")).count()
    idx = file_stats_index(agg, ["count"])
    assert idx.count() == 0
    rep = prune_report(idx, {"count": (0, 10)}).first()
    assert rep["total_files"] == 0 and rep["file_skip_frac"] is None
