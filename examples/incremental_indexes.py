"""INCREMENTAL INDEX MAINTENANCE on datachain_spark — the r09
through-line as one runnable pipeline: every index the warehouse keeps
(file-level zone maps, IVF vector cells, BM25 postings, profile
sketches) stays current through incremental saves WITHOUT rescanning
history:

    delta_save(zone_index=...)   -> pruned reads answer against v2
    delta_save(ann_index=...)    -> IVF refresh reuses centroids +
                                    stored assignments; only the churn
                                    is re-assigned
    delta_save(bm25_index=...)   -> lexical refresh re-tokenizes only
                                    fingerprint-changed docs
    profile_version(increment=)  -> v2's profile = stored v1 profile
                                    merged with a sketch of the new rows
    release_report               -> v1 vs v2 entirely from sketch state
                                    (neither data version is scanned)
    find_substring               -> phrase queries probe the stored gram
                                    index under a pushed IN filter

Run:  python examples/incremental_indexes.py [sf_dir]  (default sf0.001)

At 100 TB the refresh cost of every index tracks the CHURN, not the
corpus — k-means is never retrained, unchanged postings/assignments/
profiles are carried forward as stored rows, and the release gate reads
KB-sized profiles.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp(prefix="dc_exidx_"))
    dc.Session._global = sess
    spark = sess.spark
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ms = sess.metastore

    from datachain_spark.delta import delta_save
    from datachain_spark.ops.release import profile_version, release_report
    from datachain_spark.ops.retrieval import bm25_score
    from datachain_spark.ops.similarity import cosine_topk
    from datachain_spark.ops.text import find_substring, substring_index

    # ---- 1. zone maps through the delta path --------------------------
    orders = dc.read_parquet(f"{sf_dir}/orders.parquet", session=sess)
    kw = dict(zorder_by=["o_orderkey"], zorder_files=4,
              zone_index=["o_orderkey"])
    proc = lambda ch: ch.mutate(price2x=F.col("o_totalprice") * 2)  # noqa: E731
    delta_save(orders.filter(dc.C("o_orderkey") % 3 != 0), proc,
               "inv_orders", "o_orderkey", save_kwargs=kw)
    delta_save(orders, proc, "inv_orders", "o_orderkey", save_kwargs=kw)
    hi = orders.df.agg(F.max("o_orderkey")).first()[0] // 4
    pruned = ms.read_pruned(spark, "inv_orders", {"o_orderkey": (0, hi)})
    got = pruned.filter(F.col("o_orderkey") <= hi).count()
    want = orders.df.filter(F.col("o_orderkey") <= hi).count()
    assert got == want, (got, want)
    rep = ms.prune_stats(spark, "inv_orders", {"o_orderkey": (0, hi)}).first()
    assert rep["kept_files"] < rep["total_files"]
    print(f"zone refresh: pruned read kept {rep['kept_files']}/"
          f"{rep['total_files']} files, {got} rows == full filter")

    # ---- 2. IVF through the delta path --------------------------------
    emb = dc.read_parquet(f"{sf_dir}/embeddings.parquet", session=sess) \
        .mutate(embedding=F.col("embedding").cast("array<double>"))
    ann = dict(id_col="vec_id", num_cells=4, kmeans_iters=1)
    delta_save(emb.filter(dc.C("vec_id") % 4 != 0), lambda ch: ch,
               "inv_emb", "vec_id", delta_compare="vec_id", ann_index=ann)
    delta_save(emb, lambda ch: ch, "inv_emb", "vec_id",
               delta_compare="vec_id", ann_index=ann)
    qv = [float(x) for x in
          emb.df.filter(F.col("vec_id") == 1).first()["embedding"]]
    idx_top = [r["vec_id"] for r in ms.ann_search(
        spark, "inv_emb", qv, k=5, n_probe=4, id_cols=["vec_id"]).collect()]
    brute = [r["vec_id"] for r in cosine_topk(
        emb.df, qv, k=5, id_cols=["vec_id"]).collect()]
    assert idx_top == brute, (idx_top, brute)
    print(f"ivf refresh: full-probe top-5 == brute force {idx_top}")

    # ---- 3. BM25 through the delta path --------------------------------
    docs = dc.read_parquet(f"{sf_dir}/documents.parquet", session=sess) \
        .filter(dc.C("doc_id") < 200)
    delta_save(docs.filter(dc.C("doc_id") % 3 != 0), lambda ch: ch,
               "inv_docs", "doc_id", delta_compare="doc_id",
               bm25_index=dict(id_col="doc_id"))
    delta_save(docs, lambda ch: ch, "inv_docs", "doc_id",
               delta_compare="doc_id", bm25_index=dict(id_col="doc_id"))
    q = "spark window merge"
    got_s = {r["doc_id"]: round(r["score"], 9)
             for r in ms.bm25_search(spark, "inv_docs", q).collect()}
    want_s = {r["doc_id"]: round(r["score"], 9)
              for r in bm25_score(docs.df, q, "doc_id").collect()}
    assert got_s == want_s
    print(f"bm25 refresh: index search == direct scan over {len(got_s)} docs")

    # ---- 4. release gate from sketch state ------------------------------
    cfg = dict(group_cols="o_orderpriority", value_col="o_totalprice",
               lo=0.0, hi=600000.0, bins=64, session=sess)
    profile_version("inv_orders", version="1.0.0", **cfg)
    profile_version(
        "inv_orders",
        increment=ms.load_dataset(spark, "inv_orders")[0].join(
            ms.load_dataset(spark, "inv_orders", "1.0.0")[0]
            .select("o_orderkey"), "o_orderkey", "left_anti"),
        **cfg,
    )
    report = release_report("inv_orders", session=sess)
    files = report.inputFiles()
    rec = ms.get_record("inv_orders")
    for v in rec.versions:
        path = ms.version_data_path("inv_orders", v.version)
        assert not any(path in f for f in files), "report scanned data!"
    rows = report.collect()
    assert all(r["n_rows_new"] >= r["n_rows_old"] for r in rows)
    print(f"release report: {len(rows)} groups compared, "
          "0 data files scanned (profiles only)")

    # ---- 5. phrase search over the stored gram index --------------------
    words = (docs.df.filter(F.col("doc_id") == 0)
             .select(F.split(F.trim(F.regexp_replace(
                 F.lower(F.col("text")), r"[^\w\s]", "")), r"\s+")
                 .alias("w")).first()["w"])
    needle = " ".join(words[3:7])
    gram_idx = substring_index(docs.df, "doc_id", ngram=3)
    hits = find_substring(docs.df, gram_idx, needle, "doc_id", ngram=3)
    n_hits = hits.count()
    assert n_hits >= 1  # doc 0 matches itself
    print(f"find_substring: needle {needle!r} -> {n_hits} docs, "
          "corpus text read only for candidates")

    print("INCREMENTAL INDEXES OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
