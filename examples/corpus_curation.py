"""End-to-end LLM corpus curation on datachain_spark — the pipeline a
training-data team runs daily, composed from the engine's operators:

    read -> quality gates (Gopher + C4) -> boilerplate strip ->
    exact + fuzzy dedup -> decontaminate vs an eval set ->
    token-budget selection -> sequence packing -> save (versioned)

Run:  python examples/corpus_curation.py [sf_dir]   (default sf0.001)

Every stage is a narrow DataFrame transformation; nothing materializes
on the driver except the final summary row. At 100 TB the same code
runs unchanged — the gates are codegen'd projections, dedup shuffles
64-bit fingerprints, decontamination broadcasts the probe set, and the
token budget is a two-pass distributed prefix sum.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from datachain_spark import C
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp())
    dc.Session._global = sess
    sess.spark.sparkContext.setLogLevel("ERROR")
    sess.spark.conf.set("spark.sql.shuffle.partitions", "8")

    docs = dc.read_parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gates: Gopher heuristics + composite quality score
    # (the C4 line gate also composes here — .c4_clean("doc_id") — but
    # the synthetic fixture's lines lack terminal punctuation, so this
    # example uses the score gate)
    from datachain_spark.ops.text import quality_score
    gated = docs.gopher_filter("doc_id").mutate(
        q=quality_score(C("text"))
    ).filter(C("q") > 0.5).select_except("q")

    # 2. strip cross-document boilerplate lines (Onion/CCNet)
    cleaned = gated.strip_boilerplate("doc_id")

    # 3. exact dedup on normalized fingerprints
    deduped = cleaned.exact_dedup("doc_id")

    # 4. decontaminate against a held-out eval set (here: a doc slice)
    eval_probes = docs.filter(C("doc_id") % 97 == 0)
    decon = deduped.decontaminate(eval_probes, "doc_id", ngram=5)

    # 5. pack into fixed-length training sequences
    from datachain_spark.ops.packing import pack_sequences
    packed = pack_sequences(decon.df, "doc_id", max_tokens=512)

    # 6. save a versioned dataset + summary
    dc.DataChain(packed).save("curated_corpus")
    n_seq = dc.read_dataset("curated_corpus").count()
    print(f"docs in: {n0}  sequences out: {n_seq}")
    report = dc.read_dataset("curated_corpus").lint()
    errors = [f for f in report if f["severity"] == "error"]
    print(f"plan lint: {len(report)} findings, {len(errors)} errors")
    assert n_seq > 0 and not errors

    # 7. the per-stage audit the steps above hand-roll, as ONE frame
    # (ops/curation.curation_report) — save it next to the dataset and
    # diff it across corpus versions with dc.dataset_diff
    audit = docs.curation_report(
        "doc_id", quality_threshold=0.5, probes=eval_probes,
        decontaminate_kw={"ngram": 5},
    )
    audit.df.show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
