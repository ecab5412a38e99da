"""Warehouse LAYOUT lifecycle on datachain_spark — how a 100-TB table
earns cheap range queries, composed from the engine's table-maintenance
operators:

    save a Z-ordered version (range-clustered files)
    -> build the file-level zone-map index (one column-pruned scan,
       #files rows, persisted as {name}__zones)
    -> answer "what would this predicate scan" from the INDEX alone
    -> run the pruned read and check it matches the full filtered scan
    -> compact a fragmented version and re-index the new layout

Run:  python examples/warehouse_layout.py [sf_dir]   (default sf0.001)

The point at scale: the zone index is manifest-sized (#files rows), so
every range-predicate cost question after the one-time index build is a
metadata lookup, not a scan — and Z-ordering is what makes the zones
tight enough to skip most files.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp())
    dc.Session._global = sess
    spark = sess.spark
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ms = sess.metastore

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet")
    n_total = orders.count()

    # ---- 1. Z-ordered save: files become disjoint o_orderkey ranges ----
    orders.save("wh_orders", zorder_by=["o_orderkey"], zorder_files=8)
    print(f"saved wh_orders v1.0.0 ({n_total} rows, 8 z-ordered files)")

    # ---- 2. one-time zone-map index (persisted, versioned) -------------
    dv = ms.zone_index_dataset(spark, "wh_orders", ["o_orderkey", "o_totalprice"])
    idx, _, _ = ms.load_dataset(spark, "wh_orders__zones")
    n_files = idx.count()
    print(f"zone index wh_orders__zones v{dv.version}: {n_files} files")

    # ---- 3. predicate cost from the index alone ------------------------
    mx = orders.df.agg(F.max("o_orderkey")).first()[0]
    lo, hi = 0, mx // 10
    rep = ms.prune_stats(spark, "wh_orders", {"o_orderkey": (lo, hi)}).first()
    print(
        f"predicate o_orderkey in [{lo}, {hi}]: "
        f"scan {rep['kept_files']}/{rep['total_files']} files, "
        f"skip {rep['file_skip_frac']:.0%} of files / "
        f"{rep['row_skip_frac']:.0%} of rows without touching data"
    )
    assert rep["kept_files"] < rep["total_files"], "z-order should prune"

    # ---- 4. pruned scan == full filtered scan --------------------------
    pruned = (
        ms.read_pruned(spark, "wh_orders", {"o_orderkey": (lo, hi)})
        .filter(F.col("o_orderkey").between(lo, hi))
    )
    full = orders.df.filter(F.col("o_orderkey").between(lo, hi))
    n_pruned, n_full = pruned.count(), full.count()
    assert n_pruned == n_full, (n_pruned, n_full)
    print(f"pruned read verified: {n_pruned} rows == full filtered scan")

    # ---- 5. compaction keeps the contract ------------------------------
    # a deliberately fragmented save (64 tiny files), then OPTIMIZE-style
    # rewrite into target-sized files as a new lineage-linked version
    dc.DataChain(orders.df.repartition(64), sess).save("wh_frag")
    cv = ms.compact_dataset(spark, "wh_frag", target_file_bytes=64 << 20)
    print(
        f"compacted wh_frag -> v{cv.version} "
        f"({cv.attrs['compacted_files']} files)"
    )
    assert ms.load_dataset(spark, "wh_frag", cv.version)[0].count() == n_total

    print("warehouse layout lifecycle complete")


if __name__ == "__main__":
    main(*sys.argv[1:2])
