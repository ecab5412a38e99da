"""Structured Streaming layer: file-source stream -> windowed agg /
sessionization -> metastore sink."""

import os
import time

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.streaming import (
    read_stream,
    sessionize_stream,
    stream_to_dataset,
    windowed_agg,
)


@pytest.fixture()
def stream_dir(session, tmp_path):
    d = str(tmp_path / "stream_src")
    df = session.spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 10.0),
            (1, "2024-01-01 00:10:00", 20.0),
            (2, "2024-01-01 01:00:00", 5.0),
            (1, "2024-01-01 02:00:00", 7.0),
        ],
        "user_id long, ts_str string, value double",
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.write.parquet(d)
    return d


def test_windowed_agg_stream(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    assert stream.isStreaming
    agg = windowed_agg(
        stream, "ts", "1 hour", watermark="2 hours",
        group_cols=["user_id"],
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, n, total FROM win_agg ORDER BY user_id, total").collect()
    assert (1, 2, 30.0) in [tuple(r) for r in rows]  # two events in hour 0
    assert (1, 1, 7.0) in [tuple(r) for r in rows]


def test_sessionize_stream(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    sess_df = sessionize_stream(stream, "ts", "user_id", gap="30 minutes")
    q = (
        sess_df.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, n_events FROM sess_agg").collect()
    per_user = sorted((r["user_id"], r["n_events"]) for r in rows)
    # user 1: two sessions (00:05+00:10 within gap; 02:00 separate)
    assert per_user == [(1, 1), (1, 2), (2, 1)]


def test_stream_to_dataset_sink(session, stream_dir, tmp_path):
    spark = session.spark
    stream = read_stream(spark, stream_dir)
    q = stream_to_dataset(
        stream, "stream_ds", session.metastore, str(tmp_path / "cp3")
    )
    q.awaitTermination(120)
    back = dc.read_dataset("stream_ds", session=session)
    assert back.count() == 4
    rec = session.metastore.get_record("stream_ds")
    assert rec.latest_version().attrs.get("stream_batch_id") is not None


def test_stateful_running_counts(session, stream_dir, tmp_path):
    from datachain_spark.streaming import running_counts_stateful

    spark = session.spark
    stream = read_stream(spark, stream_dir)
    # timeout_minutes=None: finite replay must SELF-TERMINATE under
    # availableNow instead of looping in timeout-cleanup triggers until
    # awaitTermination gives up (the r08 181 s sweep cost)
    counts = running_counts_stateful(
        stream, "user_id", "value", timeout_minutes=None
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp4"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120) is True  # terminated, not timed out
    assert not q.isActive
    rows = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM state_counts").collect()}
    assert rows[1] == (3, 37.0)
    assert rows[2] == (1, 5.0)


def test_dedup_stream(session, tmp_path):
    """dropDuplicatesWithinWatermark contract, driven batch-by-batch in event
    -time order. Spark's FileStreamSource with maxFilesPerTrigger=1 picks
    files oldest-mtime-first, so each file below is one micro-batch with
    explicit mtimes; the middle batch advances the watermark past k=1's state
    expiry (00:05 + 1h) so the 03:00 re-occurrence is re-admitted. Ingesting
    out of event-time order would legitimately drop late rows instead — that
    is watermark semantics, not a bug."""
    import os
    import time

    import pandas as pd

    from datachain_spark.streaming import dedup_stream

    spark = session.spark
    d = tmp_path / "dup_src"
    d.mkdir()

    def write_batch(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["k", "v", "ts"])
        # tz-aware us timestamps -> Spark TimestampType (ntz is rejected by
        # withWatermark; ns precision is rejected by the parquet reader)
        pdf["ts"] = (
            pd.to_datetime(pdf["ts"]).dt.tz_localize("UTC").astype("datetime64[us, UTC]")
        )
        path = str(d / name)
        pdf.to_parquet(path)
        os.utime(path, (mtime, mtime))

    t0 = time.time() - 1000
    write_batch(
        "b1.parquet",
        [
            (1, "a", "2024-01-01 00:05:00"),
            (1, "a-dup", "2024-01-01 00:06:00"),  # same key within horizon
            (2, "b", "2024-01-01 00:10:00"),
        ],
        t0,
    )
    # advances the watermark to 01:30 > 01:05 (k=1's expiry). Watermark
    # updates are applied at the START of the NEXT batch, so a spacer batch
    # is needed before the expired key is physically evicted.
    write_batch("b2.parquet", [(3, "c", "2024-01-01 02:30:00")], t0 + 60)
    write_batch("b3.parquet", [(4, "d", "2024-01-01 02:45:00")], t0 + 120)
    # same key, state expired and evicted -> re-admitted
    write_batch("b4.parquet", [(1, "a-later", "2024-01-01 03:00:00")], t0 + 180)

    stream = read_stream(spark, str(d), max_files_per_trigger=1)
    deduped = dedup_stream(stream, ["k"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = [r["k"] for r in spark.sql("SELECT k FROM dedup_out").collect()]
    # within-horizon duplicate dropped; past-horizon re-occurrence re-admitted
    assert sorted(ks) == [1, 1, 2, 3, 4]


def test_corpus_ops_compose_with_streams(session, tmp_path):
    """The stateless corpus ops (PII scrub, quality signals, language-ID,
    redaction) are pure column expressions, so they apply unchanged to a
    structured stream — the streaming ingest-scrub pipeline is the same
    code as the batch one."""
    from datachain_spark.ops import text as txt

    spark = session.spark
    d = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [
            (0, "write to a@b.co and the quick brown fox jumps for it"),
            (1, "ssn 123-45-6789 inside and the lazy dog sleeps on it"),
        ],
        "doc_id long, text string",
    ).write.parquet(d)

    stream = read_stream(spark, d)
    scrubbed = stream.select(
        "doc_id",
        txt.redact_pii("text").alias("text"),
        txt.quality_score("text").alias("quality"),
        txt.language_id("text").alias("lang"),
    )
    assert scrubbed.isStreaming
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("scrub_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_scrub"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM scrub_stream").collect()}
    assert "<EMAIL>" in rows[0]["text"] and "<SSN>" in rows[1]["text"]
    assert rows[0]["lang"] == "en" and rows[0]["quality"] is not None


def test_c4_gate_composes_with_streams(session, tmp_path):
    """The C4 cleaning gate (r05) is likewise a pure projection — it runs
    unchanged on a structured stream, so a streaming ingest pipeline gates
    with the same code path (and thresholds) as the batch corpus prep."""
    from datachain_spark.ops import c4

    spark = session.spark
    d = str(tmp_path / "c4_src")
    spark.createDataFrame(
        [
            (0, "A good first sentence here.\nA good second sentence here.\n"
                "A good third sentence here."),
            (1, "code page { x = 1 }\nGood line one here.\nGood line two here.\n"
                "Good line three here."),
        ],
        "doc_id long, text string",
    ).write.parquet(d)

    stream = read_stream(spark, d)
    gated = c4.c4_clean(stream, "doc_id", with_signals=True)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("c4_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_c4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM c4_stream").collect()}
    assert rows[0]["c4_keep"] and rows[0]["n_kept_lines"] == 3
    assert not rows[1]["c4_keep"] and rows[1]["has_brace"]


def test_dedup_against_corpus(session, tmp_path):
    """Stream-static anti-join: stream rows whose normalized text already
    exists in the historical corpus are dropped; within-stream repeats pass
    (that's dedup_stream's job). Composes with a streaming sink."""
    from datachain_spark.ops.text import fingerprint
    from datachain_spark.streaming import dedup_against_corpus

    spark = session.spark
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "ingest_src")
    spark.createDataFrame(
        [
            (10, "The Quick  Brown   Fox"),   # dup of corpus 1 (normalized)
            (11, "genuinely new content"),
            (12, "lorem ipsum dolor"),        # dup of corpus 2
            (13, "more new material"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
    fresh = dedup_against_corpus(stream, corpus)
    assert fresh.isStreaming

    q = (
        fresh.writeStream.format("memory")
        .queryName("fresh_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM fresh_docs").collect())
    assert got == [11, 13]

    # fingerprint_col variant: pre-computed keys on both sides
    batch = spark.read.parquet(src).withColumn("fp", fingerprint(F.col("text")))
    corp_fp = corpus.withColumn("fp", fingerprint(F.col("text")))
    out = dedup_against_corpus(batch, corp_fp, fingerprint_col="fp")
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == [11, 13]


def test_near_dedup_stream_to_dataset(session, tmp_path):
    """Two availableNow runs over a growing file source: run 2 must drop
    docs that near-duplicate anything run 1 ingested — the cross-run state
    is ONLY the versioned signature-index dataset."""
    from datachain_spark.streaming import near_dedup_stream_to_dataset

    spark = session.spark
    src = str(tmp_path / "near_src")
    cp = str(tmp_path / "near_cp")
    kw = dict(num_hashes=32, bands=8, shingle_size=3, jaccard_threshold=0.5)

    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # in-batch dup of 1
            (3, "completely different content about spark engines"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    def run():
        stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
        q = near_dedup_stream_to_dataset(
            stream, "near_corpus", session.metastore, cp, "doc_id", **kw
        )
        q.awaitTermination(120)

    run()
    got1 = sorted(r["doc_id"] for r in dc.read_dataset(
        "near_corpus", session=session).df.collect())
    assert got1 == [1, 3]  # in-batch near-dup 2 dropped
    idx = dc.read_dataset("near_corpus_minhash_index", session=session)
    assert sorted(r["doc_id"] for r in idx.df.collect()) == [1, 3]

    # run 2: a new file with a near-dup of run 1's doc 1 + a novel doc
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (11, "entirely novel material concerning databases"),
        ],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run()

    # corpus head = run 2's append (versioned per batch); novel doc only
    latest = dc.read_dataset("near_corpus", session=session)
    assert [r["doc_id"] for r in latest.df.collect()] == [11]
    # index accumulated across runs
    idx2 = dc.read_dataset("near_corpus_minhash_index", session=session)
    assert sorted(r["doc_id"] for r in idx2.df.collect()) == [1, 3, 11]


def test_near_dedup_batch_order_and_replay(session, tmp_path):
    """(a) a doc whose only near-dup is a fellow batch member that itself
    matched the index must still be judged on its own merits (index match
    runs FIRST); (b) replaying an already-stamped batch (fresh checkpoint,
    same batch id) must not append duplicate corpus versions."""
    from datachain_spark.streaming import near_dedup_stream_to_dataset

    spark = session.spark
    src = str(tmp_path / "ord_src")
    kw = dict(num_hashes=32, bands=8, shingle_size=2, jaccard_threshold=0.5)

    # run 1 indexes the fox doc
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
    near_dedup_stream_to_dataset(
        stream, "ord_corpus", session.metastore, str(tmp_path / "cp1"),
        "doc_id", **kw
    ).awaitTermination(120)

    # crash-recovery shape: corpus write committed (latest version stamped
    # with this batch id) but the index write was lost. Replaying the same
    # batch must SKIP the corpus append (no duplicate version) and rebuild
    # the index.
    session.metastore.delete_dataset("ord_corpus_minhash_index", force=True)
    stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
    near_dedup_stream_to_dataset(
        stream, "ord_corpus", session.metastore, str(tmp_path / "cp1b"),
        "doc_id", **kw
    ).awaitTermination(120)
    assert len(session.metastore.get_record("ord_corpus").versions) == 1
    assert dc.read_dataset("ord_corpus_minhash_index", session=session).count() == 1

    # run 2: A(10) near-dups indexed 1; B(11) near-dups A but NOT doc 1.
    # With match-first semantics A drops against the index and B survives
    # the within-batch pass (its only pair partner is gone).
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy cat"),
            (11, "a quick brown cat naps near the lazy cat"),
        ],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
    near_dedup_stream_to_dataset(
        stream, "ord_corpus", session.metastore, str(tmp_path / "cp1"),
        "doc_id", **kw
    ).awaitTermination(120)
    # sanity: A pairs with the index, B doesn't; B pairs with A in-batch
    from datachain_spark.ops import dedup as D
    idx_sigs = dc.read_dataset("ord_corpus_minhash_index", session=session).df
    a_b = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat"),
         (11, "a quick brown cat naps near the lazy cat")],
        "doc_id long, text string")
    hits = D.minhash_match_index(a_b, idx_sigs.filter("doc_id = 1"), "doc_id", **kw)
    hit_ids = {r["new_id"] for r in hits.collect()}
    assert 10 in hit_ids and 11 not in hit_ids, hit_ids
    latest = dc.read_dataset("ord_corpus", session=session)
    assert [r["doc_id"] for r in latest.df.collect()] == [11]

    corpus_versions = len(session.metastore.get_record("ord_corpus").versions)
    index_versions = len(session.metastore.get_record("ord_corpus_minhash_index").versions)

    # from-scratch reprocess (fresh checkpoint, no metastore changes): all
    # docs now match the index, so nothing new lands and no versions appear
    stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
    near_dedup_stream_to_dataset(
        stream, "ord_corpus", session.metastore, str(tmp_path / "cp2"),
        "doc_id", **kw
    ).awaitTermination(120)
    assert len(session.metastore.get_record("ord_corpus").versions) == corpus_versions
    assert len(session.metastore.get_record("ord_corpus_minhash_index").versions) == index_versions


def test_validated_stream_to_dataset(session, tmp_path):
    """Validating ingest: clean rows land in the corpus, rule-violating
    rows land (tagged) in the quarantine dataset; a second run appends
    only the new file's rows (checkpointed source)."""
    from datachain_spark.ops import expectations as ex
    from datachain_spark.streaming import validated_stream_to_dataset

    spark = session.spark
    src = str(tmp_path / "val_src")
    cp = str(tmp_path / "val_cp")
    rules = [
        ex.not_null("text"),
        ex.in_range("score", 0.0, 1.0),
    ]

    spark.createDataFrame(
        [
            (1, "good doc", 0.9),
            (2, None, 0.5),          # fails not_null
            (3, "too scored", 7.0),  # fails in_range
            (4, "also fine", 0.1),
        ],
        "doc_id long, text string, score double",
    ).write.parquet(src)

    def run():
        stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
        q = validated_stream_to_dataset(
            stream, "val_corpus", session.metastore, cp, rules
        )
        q.awaitTermination(120)

    run()
    good = dc.read_dataset("val_corpus", session=session).df
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 4]
    quar = dc.read_dataset("val_corpus_quarantine", session=session).df
    got = {r["doc_id"]: r["failed_rules"] for r in quar.collect()}
    assert got == {2: ["not_null:text"], 3: ["in_range:score"]}

    # run 2: only the new file lands (checkpoint), all rows clean
    spark.createDataFrame(
        [(10, "late arrival", 0.4)], "doc_id long, text string, score double"
    ).write.mode("append").parquet(src)
    run()
    latest = dc.read_dataset("val_corpus", session=session).df
    assert [r["doc_id"] for r in latest.collect()] == [10]


def test_validated_stream_rejects_unique_rules(session, tmp_path):
    from datachain_spark.ops import expectations as ex
    from datachain_spark.streaming import validated_stream_to_dataset

    with pytest.raises(ValueError, match="unique"):
        validated_stream_to_dataset(
            None, "x", session.metastore, str(tmp_path / "cp"),
            [ex.unique("doc_id")],
        )


def test_exact_dedup_stream_to_dataset(session, tmp_path):
    """r08 (VERDICT r07 task 4a): exact-dedup ingest — two availableNow
    runs over a growing file source; the cross-run state is ONLY the
    versioned 8-byte fingerprint index, so run 2 must drop exact
    duplicates (after whitespace/case normalization) of anything run 1
    ingested, while within-batch dups reduce to the min-id rep."""
    from datachain_spark.streaming import exact_dedup_stream_to_dataset

    spark = session.spark
    src = str(tmp_path / "ex_src")
    cp = str(tmp_path / "ex_cp")

    spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "ALPHA   beta GAMMA"),  # in-batch dup of 1 (normalized)
            (3, "something else entirely"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    def run():
        stream = read_stream(spark, src, schema=spark.read.parquet(src).schema)
        q = exact_dedup_stream_to_dataset(
            stream, "ex_corpus", session.metastore, cp, "doc_id"
        )
        q.awaitTermination(120)

    run()
    got1 = sorted(r["doc_id"] for r in dc.read_dataset(
        "ex_corpus", session=session).df.collect())
    assert got1 == [1, 3]
    idx1 = dc.read_dataset("ex_corpus_fp_index", session=session)
    assert idx1.count() == 2  # two distinct fingerprints

    # run 2: a cross-run dup of doc 3 + one novel doc
    spark.createDataFrame(
        [
            (10, "  SOMETHING ELSE ENTIRELY "),  # dup of 3 across runs
            (11, "novel follow-up content"),
        ],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run()

    latest = dc.read_dataset("ex_corpus", session=session)
    assert [r["doc_id"] for r in latest.df.collect()] == [11]
    idx2 = dc.read_dataset("ex_corpus_fp_index", session=session)
    assert idx2.count() == 3
    # fingerprints are the only state: one BIGINT column
    assert idx2.df.columns == ["fingerprint"]


def test_ann_ingest_stream(session, tmp_path):
    from datachain_spark.ops.similarity import ann_ivf_topk, cosine_topk
    from datachain_spark.streaming import ann_ingest_stream

    spark = session.spark
    vecs = [
        (i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(24)
    ]
    df = spark.createDataFrame(vecs, "vid long, embedding array<double>")
    d = str(tmp_path / "ann_src")
    df.write.parquet(d)
    cents = [[1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [3.0, 4.0, 1.0]]

    from datachain_spark.streaming import read_stream as _rs

    q = ann_ingest_stream(
        _rs(spark, d), "ann_s", session.metastore,
        str(tmp_path / "cp_ann"), cents, "vid",
    )
    q.awaitTermination(120)

    # centroid table persisted once; ivf rows cover the whole input
    ms = session.metastore
    cent, _, _ = ms.load_dataset(spark, "ann_s__ivf_centroids")
    assert cent.count() == 3
    rec = ms.get_record("ann_s__ivf")
    idx = None
    for dv in rec.versions:
        part, _, _ = ms.load_dataset(spark, "ann_s__ivf", dv.version)
        idx = part if idx is None else idx.unionByName(part)
    assert idx.count() == 24

    # full probe == exact brute force on the same frame; the synthetic
    # grid creates EXACT cosine ties (symmetric vectors), so compare
    # (distance, id)-sorted — the raw output order among equal distances
    # is partition-order dependent in both paths by design
    qv = [1.0, 1.0, 1.0]

    def key(rows):
        return sorted((round(r["distance"], 9), r["vid"]) for r in rows)

    exact = key(cosine_topk(df, qv, k=5, id_cols=["vid"]).collect())
    got = key(ann_ivf_topk(
        idx, cents, qv, cell_col="cell", k=5, n_probe=3, id_cols=["vid"]
    ).collect())
    # identical distance multiset == same quality cut; id choice among
    # exact ties at the boundary is legitimately free in both paths
    assert [d for d, _ in got] == [d for d, _ in exact]

    with pytest.raises(ValueError):
        ann_ingest_stream(_rs(spark, d), "x", ms, str(tmp_path / "cp2"),
                          [], "vid")
