"""THE PUBLISH PIPELINE, CLOSED — the r10 through-line as one runnable
flow: every piece of per-version state the warehouse keeps (zone maps,
gram postings, profile sketches) maintains itself THROUGH the delta
path, and promotion to "released" is gated on that state alone:

    delta_save(save_kwargs={'zone_index': ...},
               gram_index=..., profile=...)
        -> each incremental run refreshes the zone map, re-shingles only
           fingerprint-changed docs into the gram index, and folds a
           sketch of ONLY the new rows into the stored profile
           (pure-append runs take the increment-merge fast path; any
           modify/delete churn forces a full re-profile automatically)
    promote(name, policy=..., rules=...)
        -> drift thresholds (PSI, row-delta, row floors) read off the
           two stored profiles, schema policy off the stored schemas,
           expectation rules in ONE aggregation over the candidate —
           raises PromotionBlockedError when any check fails
    vacuum_dataset -> old data + its indexes GC'd, profiles KEPT
    release_report(v_old=<vacuumed>) -> still answers from sketch state

Run:  python examples/publish_gate.py [sf_dir]   (default sf0.001)

At 100 TB the gate costs a metadata read plus one scan of the candidate
version (the expectation rules); history costs nothing — it may not
even be retained.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp(prefix="dc_exgate_"))
    dc.Session._global = sess
    spark = sess.spark
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    from datachain_spark.delta import delta_save
    from datachain_spark.ops import expectations as ex
    from datachain_spark.ops.release import (
        PromotionBlockedError,
        promote,
        release_report,
    )

    docs = dc.read_parquet(f"{sf_dir}/documents.parquet", session=sess).mutate(
        n_chars=F.length("text").cast("double"),
        bucket=(dc.C("doc_id") % 5).cast("string"),
    )
    cfg = dict(group_cols="bucket", value_col="n_chars",
               lo=0.0, hi=4096.0, bins=64)
    maintain = dict(
        save_kwargs=dict(zone_index=["doc_id"]),
        gram_index=dict(id_col="doc_id"),
        profile=cfg,
        compact_target_bytes=1 << 30,  # OPTIMIZE in the same pass
    )

    # ---- three releases: v1 (%3==0) -> v2 (%2==0) churns keys (some
    # v1 docs drop -> the profile wiring detects the displacement and
    # re-profiles in full); v2 -> v3 (all docs) is a pure append (the
    # increment-merge fast path) ----
    for frac in (3, 2, 1):
        delta_save(
            docs.filter(dc.C("doc_id") % frac == 0), lambda ch: ch,
            "corpus", "doc_id", delta_compare="doc_id", **maintain,
        )
    rec = sess.metastore.get_record("corpus")
    versions = [v.version for v in rec.versions]
    print(f"3 delta releases (+ compacted copies) -> versions {versions}")

    # every piece of per-version state followed the saves
    rep = sess.metastore.prune_stats(
        spark, "corpus", {"doc_id": (0, 10)}
    ).first()
    assert rep["total_rows"] == docs.count(), "zone map lags the save"
    hits = sess.metastore.find_substring(
        spark, "corpus",
        " ".join(docs.df.filter(F.col("doc_id") == 1).select(
            F.split(F.trim(F.regexp_replace(
                F.lower("text"), r"[^\w\s]", "")), r"\s+")
        ).first()[0][:3]),
    ).count()
    assert hits >= 1, "gram index lags the save"
    print(f"zone map covers {rep['total_rows']} rows; phrase probe hits "
          f"{hits} docs — all maintained through delta_save")

    # ---- the gate: v2 -> v3 passes; a tight delta budget blocks ----
    policy = dict(max_psi=0.2, max_abs_row_delta_frac=3.0, min_rows=1)
    rules = [ex.not_null("text"), ex.in_range("n_chars", 0.0, 4096.0)]
    ok, rows = promote("corpus", policy=policy, rules=rules)
    assert ok
    print(f"promote: PASS ({len(rows)} checks, all green)")
    try:
        promote("corpus", policy=dict(max_abs_row_delta_frac=0.05))
        raise AssertionError("gate should have blocked")
    except PromotionBlockedError as exc:
        print(f"tight budget blocks as designed: {str(exc)[:80]}...")

    # ---- vacuum history; the report still answers about it ----
    removed = sess.metastore.vacuum_dataset("corpus", keep_last=1)
    print(f"vacuumed {removed}; data + indexes gone, profiles kept")
    rows = release_report("corpus", v_old=removed[-1]).collect()
    assert rows
    print(f"release_report vs vacuumed {removed[-1]}: {len(rows)} groups "
          "compared from surviving sketch state")
    print("PUBLISH GATE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
