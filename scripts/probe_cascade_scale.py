"""8x scale probe for the r11 lineage cascade (SCALE.md convention):
replicate sf0.1 orders 8x with key offsets, then measure

  (a) the no-op cascade walk (everything up_to_date) — must be FLAT
      (manifest JSON only, no data touched), and
  (b) the post-append cascade (both stages re-run incrementally).

Usage: PYTHONPATH=/root/repo python scripts/probe_cascade_scale.py [sf_dir]
"""

import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import datachain_spark as dc  # noqa: E402
from datachain_spark.catalog.metastore import Metastore  # noqa: E402
from datachain_spark.delta import delta_save  # noqa: E402
from datachain_spark.lineage import (  # noqa: E402
    refresh_downstream,
    register_pipeline,
)
from datachain_spark.session import Session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def build(sess, orders, tag):
    src, drv, rel = f"psrc_{tag}", f"pdrv_{tag}", f"prel_{tag}"

    def derived_fn():
        return delta_save(
            dc.read_dataset(src, session=sess),
            lambda ch: ch.mutate(
                price_band=F.floor(F.col("o_totalprice") / 1000.0)
                .cast("long")
            ),
            drv, "o_orderkey", delta_compare="o_totalprice", session=sess,
            profile=dict(group_cols="o_orderpriority",
                         value_col="o_totalprice",
                         lo=0.0, hi=600000.0, bins=64),
        )

    def released_fn():
        return delta_save(
            dc.read_dataset(drv, session=sess),
            lambda ch: ch.filter(dc.C("price_band") >= 100)
            .select("o_orderkey", "o_orderpriority", "price_band"),
            rel, "o_orderkey", delta_compare="price_band", session=sess,
        )

    register_pipeline(drv, derived_fn, session=sess)
    register_pipeline(rel, released_fn, session=sess)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save(src)
    derived_fn()
    released_fn()
    return src


def probe(sess, orders, label):
    tag = uuid.uuid4().hex[:8]
    src = build(sess, orders, tag)

    def best3(fn):
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    noop = best3(lambda: refresh_downstream(src, session=sess).collect())

    orders.save(src)  # upstream append (the %3==0 third)
    t0 = time.perf_counter()
    rep = refresh_downstream(src, session=sess).collect()
    full = time.perf_counter() - t0
    actions = sorted((r["dataset"].split(".")[-1][:4], r["action"])
                     for r in rep)
    print(f"{label}: noop_walk={noop:.3f}s cascade={full:.2f}s {actions}")
    return noop, full


def main():
    sess = Session(metastore_dir=tempfile.mkdtemp(prefix="probe_casc_"))
    Session._global = sess
    sess.spark.sparkContext.setLogLevel("ERROR")
    sess.spark.conf.set("spark.sql.shuffle.partitions", "32")
    sess._lineage_pipelines = {}

    orders1 = dc.read_parquet(f"{SF}/orders.parquet", session=sess)
    n1, f1 = probe(sess, orders1, "1x")

    base = orders1.df
    parts = []
    mk = base.agg(F.max("o_orderkey")).first()[0] + 1
    for i in range(8):
        parts.append(base.withColumn(
            "o_orderkey", (F.col("o_orderkey") + F.lit(i * mk)).cast("long")
        ))
    rep8 = parts[0]
    for p in parts[1:]:
        rep8 = rep8.unionByName(p)
    orders8 = dc.DataChain(rep8, sess)
    n8, f8 = probe(sess, orders8, "8x")

    print(f"RATIOS: noop_walk {n8 / n1:.2f}x  cascade {f8 / f1:.2f}x")


if __name__ == "__main__":
    main()
