"""Hybrid RETRIEVAL stack on datachain_spark — the RAG-shaped search a
training-data team runs over a corpus + its embeddings:

    BM25 lexical top-k over documents
    -> cosine top-k over the aligned embedding table
    -> reciprocal-rank fusion of the two lists (hybrid_topk)
    -> MMR diversification of the dense candidates
    -> keyword-in-context snippets for the fused winners
    -> persisted IVF index: build once, probe cells instead of scanning

Run:  python examples/hybrid_search.py [sf_dir]   (default sf0.001)

Scale shape: both branches are corpus-scale TakeOrdered cuts (the BM25
scan never explodes tokens; the cosine scan is one Arrow matmul pass);
everything after the cuts is O(n_per_branch). The IVF step shows the
repeated-query path: the one-time index makes each later probe touch
n_probe/num_cells of the vectors.
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
    emb = dc.read_parquet(f"{sf_dir}/embeddings.parquet").mutate(
        embedding=F.col("embedding").cast("array<double>")
    )
    query = "spark window merge"
    qv = [float(v) for v in emb.df.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]

    # ---- 1. hybrid: BM25 + cosine fused by RRF --------------------------
    fused = docs.hybrid_topk(emb, query, qv, k=5, n_per_branch=25)
    hits = fused.to_records()
    assert len(hits) == 5
    print(f"hybrid top-5 for {query!r}:")
    for h in hits:
        print(f"  doc {h['doc_id']:>5}  bm25_rank={h['bm25_rank']} "
              f"cos_rank={h['cos_rank']}  rrf={h['rrf_score']:.4f}")

    # ---- 2. MMR-diversified dense results --------------------------------
    diverse = emb.mmr_rerank(qv, "vec_id", k=5, lambda_=0.7, pool=25)
    print("MMR-diversified dense top-5:",
          [r["vec_id"] for r in diverse.to_records()])

    # ---- 3. snippets for the fused winners --------------------------------
    from datachain_spark.ops.retrieval import kwic

    winner_ids = [h["doc_id"] for h in hits]
    snip = kwic(
        docs.df.filter(F.col("doc_id").isin(winner_ids)),
        "merge", "doc_id", window=3,
    ).limit(3)
    for r in snip.collect():
        print(f"  doc {r['doc_id']} …{r['snippet']}…")

    # ---- 4. repeated-query path: persisted IVF index ---------------------
    emb.save("hs_vectors")
    ms = sess.metastore
    ms.ann_index_dataset(spark, "hs_vectors", "vec_id", num_cells=8)
    approx = ms.ann_search(spark, "hs_vectors", qv, k=5, n_probe=2,
                           id_cols=["vec_id"]).collect()
    exact = ms.ann_search(spark, "hs_vectors", qv, k=5, n_probe=8,
                          id_cols=["vec_id"]).collect()
    print("IVF probe (2/8 cells):", [r["vec_id"] for r in approx])
    print("IVF full probe       :", [r["vec_id"] for r in exact])
    assert approx[0]["vec_id"] == exact[0]["vec_id"] == 0

    print("hybrid retrieval stack complete")


if __name__ == "__main__":
    main(*sys.argv[1:2])
