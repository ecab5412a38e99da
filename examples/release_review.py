"""Dataset RELEASE REVIEW on datachain_spark — the audit a training-data
team runs before promoting corpus version N+1, composed from the
engine's operators:

    save two corpus versions -> row-level + summary diff
    -> embedding drift (centroid / variance shift between versions)
    -> incremental profile: per-version mergeable sketches (HLL
       registers + fixed-bin histograms) folded WITHOUT rescanning v1
    -> contamination matrix of the new version vs benchmark suites
    -> Zipf rank-frequency health check

Run:  python examples/release_review.py [sf_dir]   (default sf0.001)

Everything stays distributed: the diff is one full-outer join on keys,
drift ships d-row moment partials, the sketch merge reads a few KB of
stored state per group, and the contamination grid reduces each side to
distinct 64-bit gram hashes before its single join. At 100 TB the only
thing that grows is the scan of the NEW version.
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

    docs = dc.read_parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- two corpus versions: v2 drops a slice and edits some rows ----
    v1 = docs
    v2 = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .mutate(
            text=F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.col("text"), F.lit(" [edited]")),
            ).otherwise(F.col("text"))
        )
    )
    v1.save("corpus")          # 1.0.0
    v2.save("corpus")          # 1.0.1

    # ---- 1. what changed, row-wise ----
    from datachain_spark.ops.diff import dataset_diff

    summary = {
        (r["kind"], r["item"]): r["n"]
        for r in dataset_diff("corpus", on="doc_id").collect()
    }
    n_del = summary[("status", "D")]
    n_mod = summary[("status", "M")]
    assert n_del > 0 and n_mod > 0
    print(f"diff 1.0.0 -> 1.0.1: deleted={n_del} modified={n_mod} "
          f"(text column drove {summary[('column', 'text')]} of them)")

    # ---- 2. did the embedding distribution move? ----
    from datachain_spark.ops.embedding import embedding_drift_versions

    sess.metastore.save_dataset(emb, "emb")                       # 1.0.0
    sess.metastore.save_dataset(
        emb.filter(F.col("vec_id") % 13 != 0), "emb"
    )                                                             # 1.0.1
    drift = embedding_drift_versions("emb", "embedding").collect()[0]
    assert drift["n_new"] < drift["n_old"]
    print(f"embedding drift: centroid_l2={drift['centroid_l2']:.4f} "
          f"cos={drift['centroid_cos']:.4f} "
          f"var_delta_l2={drift['var_delta_l2']:.4f}")

    # ---- 3. incremental profile: merge stored sketches, rescan nothing ----
    from datachain_spark.ops.sketches import (
        histogram_quantiles,
        merge_profile_sketches,
        profile_sketch,
    )

    kw = dict(value_col="n_chars", distinct_col="source",
              lo=0.0, hi=4096.0, bins=32)
    sess.metastore.save_dataset(
        profile_sketch(v1.df, "lang", **kw), "corpus_profile"
    )
    sess.metastore.save_dataset(
        profile_sketch(v2.df, "lang", **kw), "corpus_profile"
    )
    rec = sess.metastore.get_record("corpus_profile")
    snaps = [
        sess.metastore.load_dataset(spark, "corpus_profile", dv.version)[0]
        for dv in rec.versions
    ]
    merged = merge_profile_sketches(snaps, "lang")
    p50 = histogram_quantiles(merged, "lang", [0.5], 0.0, 4096.0)
    rows = {r["lang"]: r for r in merged.collect()}
    med = {r["lang"]: r["estimate"] for r in p50.collect()}
    assert rows and all(r["n_rows"] > 0 for r in rows.values())
    some = sorted(rows)[0]
    print(f"merged profile: {len(rows)} langs; e.g. {some}: "
          f"n={rows[some]['n_rows']} distinct_sources~="
          f"{rows[some]['approx_distinct']:.0f} median_chars~={med[some]:.0f}")

    # ---- 4. does the new version leak the benchmark suites? ----
    from datachain_spark.ops.text import contamination_matrix

    benches = docs.df.filter(F.col("doc_id") % 7 == 0).select(
        F.col("lang").alias("suite"), "text"
    )
    grid = contamination_matrix(
        v2.df.select(F.col("source").alias("corpus"), "text"), benches
    )
    worst = grid.orderBy(F.desc("frac_suite_in_corpus")).first()
    assert grid.count() > 0
    print(f"contamination: worst cell {worst['corpus']} x {worst['suite']} "
          f"= {worst['frac_suite_in_corpus']:.3f} of suite grams")

    # ---- 5. distribution health ----
    from datachain_spark.ops.text import zipf_profile

    z = zipf_profile(v2.df, top_k=300).collect()[0]
    print(f"zipf: {z['n_types']} types / {z['n_tokens']} tokens, "
          f"slope={z['zipf_slope']:.2f} r2={z['r2']:.2f} "
          f"{'(degenerate/synthetic-looking)' if z['r2'] < 0.5 else ''}")

    print("release review complete")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
