"""LINEAGE-DRIVEN CASCADE REFRESH — the r11 capstone as one runnable
flow: the metastore records which datasets every save read; this
example builds a 3-stage publish chain, appends to the source, and
heals the WHOLE chain (including each stage's profile maintenance and
the final promotion gate) with one call:

    src --(delta, profile=)--> derived --(delta)--> released

    register_pipeline(name, fn)   # or let flag-style .save auto-register
    dc.datasets(stale=True)       # the work list: pins behind heads
    dc.refresh_downstream('src')  # topo-ordered incremental re-runs
    promote('released', ...)      # gate + persisted audit evidence
    promotions('released')        # replay the stored gate outcomes

Run:  python examples/cascade_refresh.py [sf_dir]   (default sf0.001)

At 100 TB the staleness walk reads manifest JSON only; each re-run is
that stage's own churn-tracking delta path. No downstream is ever
re-run by hand, in the wrong order, or silently left behind (strict
mode raises on a stale dataset with no registered pipeline).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp(prefix="dc_excasc_"))
    dc.Session._global = sess
    sess.spark.sparkContext.setLogLevel("ERROR")
    sess.spark.conf.set("spark.sql.shuffle.partitions", "8")

    from datachain_spark.delta import delta_save
    from datachain_spark.ops.release import promote, promotions

    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=sess)

    # ---- stage pipelines (each a re-runnable closure over a fresh read)
    def derived_fn():
        return delta_save(
            dc.read_dataset("src", session=sess),
            lambda ch: ch.mutate(
                price_band=F.floor(F.col("o_totalprice") / 1000.0)
                .cast("long")
            ),
            "derived", "o_orderkey", delta_compare="o_totalprice",
            session=sess,
            profile=dict(group_cols="o_orderpriority",
                         value_col="o_totalprice",
                         lo=0.0, hi=600000.0, bins=32),
        )

    def released_fn():
        return delta_save(
            dc.read_dataset("derived", session=sess),
            lambda ch: ch.filter(dc.C("price_band") >= 100)
            .select("o_orderkey", "o_orderpriority", "price_band"),
            "released", "o_orderkey", delta_compare="price_band",
            session=sess,
            profile=dict(group_cols="o_orderpriority",
                         distinct_col="o_orderkey"),
        )

    dc.register_pipeline("derived", derived_fn, session=sess)
    dc.register_pipeline("released", released_fn, session=sess)

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    derived_fn()
    released_fn()

    # ---- upstream append: only `derived` is stale until the cascade runs
    orders.save("src")
    stale = dc.stale_datasets(session=sess)
    assert [(r["dataset"], r["upstream"]) for r in stale] == [
        ("local.default.derived", "local.default.src")
    ], stale
    print(f"stale after append: {[(r['dataset'], r['pinned_version'], r['upstream_head']) for r in stale]}")

    rows = dc.refresh_downstream("src", session=sess).collect()
    actions = [(r["dataset"].split(".")[-1], r["action"],
                r["old_version"], r["new_version"]) for r in rows]
    print(f"cascade: {actions}")
    assert [a[:2] for a in actions] == [
        ("derived", "refreshed"), ("released", "refreshed")
    ], actions
    assert dc.stale_datasets(session=sess) == []

    # ---- the cascaded head equals a from-scratch rebuild
    got = dc.read_dataset("released", session=sess)
    want = (
        orders.mutate(price_band=F.floor(F.col("o_totalprice") / 1000.0)
                      .cast("long"))
        .filter(dc.C("price_band") >= 100)
    )
    n_got, n_want = got.count(), want.count()
    assert n_got == n_want, (n_got, n_want)
    print(f"released head == from-scratch rebuild ({n_got} rows)")

    # ---- gate the refreshed release; evidence persists either way
    ok, _ = promote("released",
                    policy=dict(min_rows=1, max_abs_row_delta_frac=2.0),
                    session=sess)
    assert ok
    audits = promotions("released", session=sess).collect()
    assert all(r["gate_passed"] for r in audits) and audits
    print(f"promotion gate PASS; audit rows persisted: {len(audits)}")
    print("CASCADE REFRESH OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
