"""Plan-shape probe for the .map()/batch_map Python-boundary narrowing.

Replicates the bench's laion_reference_workload map step (a dotted
struct-field param, `emd.file.path`) outside bench.main() — the bench
closure is not importable — and dumps its `.explain("formatted")` into
plans/<round>/laion_map_<tag>.txt, plus a batch_map probe over lineitem
into plans/<round>/batch_map_<tag>.txt.

Usage: python scripts/probe_map_boundary.py <tag>
"""

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
)


def _dump(df, name: str, tag: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"OK {name} -> {path}", file=sys.stderr)


def main() -> int:
    tag = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)

    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("map-boundary-probe")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import datachain_spark as dcs
    from datachain_spark.catalog.metastore import Metastore
    from datachain_spark.webdataset_laion import process_laion_meta

    # --- laion map step: gen(process_laion_meta) -> map(stem) ------------
    laion_dir = tempfile.mkdtemp(prefix="probe_laion_")
    rng = np.random.RandomState(42)
    np.savez(
        laion_dir + "/laion-000.npz",
        b32_img=rng.rand(16, 8).astype("float32"),
        b32_txt=rng.rand(16, 8).astype("float32"),
        l14_img=rng.rand(16, 8).astype("float32"),
        l14_txt=rng.rand(16, 8).astype("float32"),
        dedup=rng.rand(16, 2).astype("float32"),
    )
    sess = dcs.Session.get(spark=spark)
    ms = Metastore(tempfile.mkdtemp(prefix="probe_laion_ms_"))
    old_ms, sess.metastore = sess.metastore, ms
    try:
        def stem(path):
            return path.rsplit("/", 1)[-1].split(".")[0]

        ch = (
            dcs.read_storage(laion_dir, session=sess, update=True)
            .gen(emd=process_laion_meta)
            .map(stem=stem, params=["emd.file.path"], output={"stem": str})
        )
        _dump(ch.df, "laion_map", tag)
    finally:
        sess.metastore = old_ms

    # --- batch_map over lineitem -----------------------------------------
    li = dcs.read_parquet(
        os.path.join(SF_DIR, "lineitem.parquet"), session=sess
    ).filter(dcs.C.l_orderkey <= 400)

    def gross_batch(qty, price):
        return [q * p for q, p in zip(qty, price)]

    bm = li.batch_map(
        gross_batch, params=["l_quantity", "l_extendedprice"],
        output={"gross": float},
    ).select("l_orderkey", "l_linenumber", "gross")
    _dump(bm.df, "batch_map", tag)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
