"""Structured Streaming layer.

The reference has NO streaming (SURVEY.md §2.10: no watermarks, no event-time
windows, no stateful operators anywhere in datachain — its "incremental" is
diff-based batch, which we implement separately in delta.py). This module is
the Spark-native upgrade path: the same chain-style operations over unbounded
sources with event-time semantics.

At 100 TB/day scale this is the canonical Spark pattern: file/Kafka source ->
watermark -> windowed agg / stateful op -> sink with checkpointing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_stream(
    spark: SparkSession,
    path: str,
    format: str = "parquet",  # noqa: A002
    schema: Optional[T.StructType] = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream over a directory (new files become micro-batches).

    Schema is required by Structured Streaming; when omitted it is inferred
    from the existing files (one batch read of footers — driver-cheap).
    """
    if schema is None:
        schema = spark.read.format(format).load(path).schema
    return (
        spark.readStream.format(format)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "30 minutes",
    group_cols: Optional[list[str]] = None,
    aggs: Optional[dict[str, "F.Column"]] = None,
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermark.

    Default aggregation is count(*); pass ``aggs={'name': F.sum(...)}`` for
    custom measures. Late rows beyond the watermark are dropped by Spark's
    state store (bounded state at scale).
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    keys = [win] + [F.col(c) for c in (group_cols or [])]
    measures = [v.alias(k) for k, v in (aggs or {"n": F.count(F.lit(1))}).items()]
    return df.withWatermark(ts_col, watermark).groupBy(*keys).agg(*measures)


def sessionize_stream(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) — native session_window, state-store
    backed; the streaming analog of the batch sessionize query."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop rows whose key(s) were already seen within
    the watermark horizon (dropDuplicatesWithinWatermark — state-store
    bounded, so it runs forever at 100 TB/day; unbounded dropDuplicates
    would accumulate state without limit). The streaming analog of
    ops.dedup.exact_dedup for ingest pipelines.

    Event-time semantics callers must know (standard Spark watermark rules):
    rows arriving later than ``watermark`` behind the max observed event time
    are dropped as late, so out-of-event-time-order ingestion loses rows by
    design; and state eviction lags one micro-batch behind the watermark
    update (the watermark computed from batch N applies at the start of batch
    N+1), so a key's re-occurrence is only re-admitted after an intervening
    batch. See tests/test_streaming.py::test_dedup_stream."""
    out = df.withWatermark(ts_col, watermark)
    try:
        return out.dropDuplicatesWithinWatermark(keys)
    except AttributeError:  # Spark < 3.5 fallback: state unbounded
        return out.dropDuplicates(keys)


def dedup_against_corpus(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    fingerprint_col: Optional[str] = None,
) -> DataFrame:
    """Drop stream rows whose content already exists in a historical (static)
    corpus: a stream-static LEFT ANTI join on the exact-dedup fingerprint
    (ops.text.fingerprint — normalized-text xxhash64, the same key
    ops.dedup.exact_dedup groups on). The ingest-side half of incremental
    dedup: ``dedup_stream`` removes repeats WITHIN the stream's watermark
    horizon, this removes rows already present in the corpus built by prior
    batch runs.

    Scale design: stream-static joins re-plan the static side each
    micro-batch; pass a corpus of FINGERPRINTS (``fingerprint_col`` on a
    deduplicated narrow table — or just ``exact_dedup``'s saved output),
    not raw documents, so the static side is a compact join input (8 bytes
    a row, broadcast-able to millions; bucketed/sorted parquet beyond
    that). No state store involved — the corpus is the state."""
    from ..ops.text import fingerprint

    def fp_col(df: DataFrame):
        return F.col(fingerprint_col) if fingerprint_col else fingerprint(F.col(text_col))

    corpus_keys = corpus_df.select(fp_col(corpus_df).alias("__fp")).dropDuplicates()
    tagged = stream_df.withColumn("__fp", fp_col(stream_df))
    return tagged.join(corpus_keys, on="__fp", how="left_anti").drop("__fp")


def running_counts_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: Optional[int] = 60,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count + value sum maintained in the state store across
    micro-batches, with processing-time timeout eviction.

    This is the pattern the reference cannot express at all (no stateful
    operators anywhere in datachain — SURVEY.md §2.10) and the canonical
    Spark escape hatch when windowed aggs don't fit: arbitrary per-key state,
    bounded by timeouts.

    ``timeout_minutes=None`` disables eviction (GroupStateTimeout.NoTimeout).
    Use it for FINITE replays under ``trigger(availableNow=True)``: with a
    processing-time timeout registered, Spark keeps the terminated-input
    query alive in "no new data but cleaning up state" trigger loops until
    the timeouts fire — a 60-minute timeout turns a 10-second replay into an
    hour-long (or awaitTermination-bounded) hang. Measured in the r08 sweep:
    181 s of which ~170 s was this cleanup loop (r08 verdict what's-wrong
    #2). Long-running production streams keep the default eviction."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField(key_col, T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def update(key, pdfs, state: "GroupState"):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_minutes is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def near_dedup_stream_to_dataset(
    stream_df: DataFrame,
    name: str,
    metastore,
    checkpoint_dir: str,
    id_col: str,
    text_col: str = "text",
    index_name: Optional[str] = None,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    trigger_once: bool = True,
):
    """Near-dedup ingest: a stream of documents lands in a versioned corpus
    dataset with near-duplicates removed ACROSS the whole ingest history,
    not just within the watermark horizon. Each micro-batch is (1)
    near-deduped within itself (ops.dedup.minhash_dedup), (2) matched
    against the persistent MinHash signature index so anything that
    near-duplicates a doc from ANY earlier batch or run is dropped
    (ops.dedup.minhash_dedup_incremental), (3) appended to ``name``, and
    (4) its survivors' signatures folded into ``index_name``.

    The signature index (num_hashes longs/doc, ~0.5 KB at the default 64)
    is the ONLY cross-batch state — a versioned dataset, not a state store,
    so restarts resume from the checkpoint and the historical corpus text
    is never rescanned. Each batch writes the index as a new full version
    (compact: 1 TB of signatures indexes ~2 PB of text); at the far end of
    that range, store signatures in a bucketed append table instead.

    Per-batch semantics (each batch signed exactly ONCE): (a) docs matching
    the stored index drop first — so a doc that only near-duplicates a
    fellow batch member that itself matched history is still judged on its
    own merits; (b) the remainder dedups within the batch greedily (the
    higher id of each pair drops); (c) survivors append to the corpus and
    their signatures fold into the index. Batch replays after a mid-batch
    crash are idempotent: a dataset version already stamped with this
    stream_batch_id is not written again.
    """
    from ..ops.dedup import (
        minhash_match_signatures,
        minhash_pairs_from_signatures,
        minhash_signatures,
    )

    idx_name = index_name or f"{name}_minhash_index"
    sig_kw = dict(
        num_hashes=num_hashes, shingle_size=shingle_size, hash_fn=hash_fn
    )
    band_kw = dict(
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold, hash_fn=hash_fn,
    )

    def _already_saved(ds_name: str, batch_id: int) -> bool:
        rec = metastore.get_record(ds_name)
        dv = rec.latest_version() if rec is not None else None
        return bool(dv and dv.attrs.get("stream_batch_id") == batch_id)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..catalog.metastore import DatasetNotFoundError

        if batch_df.isEmpty():
            return
        try:
            idx, _, _ = metastore.load_dataset(batch_df.sparkSession, idx_name)
        except DatasetNotFoundError:
            idx = None
        # ONE signing pass feeds the index match, the within-batch pairs
        # and the index fold
        sigs = minhash_signatures(batch_df, id_col, text_col, **sig_kw).persist()
        try:
            batch = batch_df
            live_sigs = sigs
            if idx is not None:
                hits = minhash_match_signatures(sigs, idx, id_col, **band_kw)
                hit_ids = hits.select(
                    F.col("new_id").alias(id_col)
                ).distinct()
                batch = batch.join(hit_ids, id_col, "left_anti")
                live_sigs = sigs.join(hit_ids, id_col, "left_anti")
            losers = (
                minhash_pairs_from_signatures(live_sigs, id_col, **band_kw)
                .select(F.col("id_b").alias(id_col))
                .distinct()
            )
            batch = batch.join(losers, id_col, "left_anti").persist()
            try:
                if batch.isEmpty():
                    return
                if not _already_saved(name, batch_id):
                    metastore.save_dataset(
                        batch, name, attrs={"stream_batch_id": batch_id}
                    )
                if _already_saved(idx_name, batch_id):
                    return
                new_sigs = sigs.join(
                    batch.select(id_col), id_col, "left_semi"
                )
                if idx is not None:
                    new_sigs = idx.unionByName(new_sigs)
                metastore.save_dataset(
                    new_sigs, idx_name, attrs={"stream_batch_id": batch_id}
                )
            finally:
                batch.unpersist()
        finally:
            sigs.unpersist()

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def exact_dedup_stream_to_dataset(
    stream_df: DataFrame,
    name: str,
    metastore,
    checkpoint_dir: str,
    id_col: str,
    text_col: str = "text",
    index_name: Optional[str] = None,
    hash_fn: str = "xxhash64",
    trigger_once: bool = True,
):
    """EXACT-dedup ingest — the reference's delta-ingest story,
    streaming-shaped (r07 verdict task 4a): a stream of documents lands
    in a versioned corpus dataset with exact duplicates removed across
    the WHOLE ingest history. Each micro-batch (1) reduces to one min-id
    representative per normalized-text fingerprint and anti-joins the
    persisted fingerprint index (BOTH steps are
    ops.dedup.exact_dedup_incremental — within-batch + cross-batch in
    one hash-keyed plan), (2) appends survivors to ``name``, and (3)
    folds the survivors' fingerprints into ``index_name`` (default
    ``{name}_fp_index``) via :func:`~datachain_spark.ops.dedup.fingerprint_index`.

    Cross-batch state is ONLY the 8-byte-fingerprint index — a versioned
    dataset, not a state store, so historical text is never rescanned,
    restarts resume from the streaming checkpoint, and (unlike
    :func:`dedup_stream`) identity has no watermark horizon: a duplicate
    of the very first ingested document still drops a year later. The
    anti join shuffles 64-bit keys on both sides — no broadcast
    assumption; the exact-dedup twin of
    :func:`near_dedup_stream_to_dataset`. Batch replays after a
    mid-batch crash are idempotent via the stream_batch_id stamp."""
    from ..ops.dedup import exact_dedup_incremental, fingerprint_index

    idx_name = index_name or f"{name}_fp_index"

    def _already_saved(ds_name: str, batch_id: int) -> bool:
        rec = metastore.get_record(ds_name)
        dv = rec.latest_version() if rec is not None else None
        return bool(dv and dv.attrs.get("stream_batch_id") == batch_id)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..catalog.metastore import DatasetNotFoundError

        if batch_df.isEmpty():
            return
        try:
            idx, _, _ = metastore.load_dataset(
                batch_df.sparkSession, idx_name
            )
        except DatasetNotFoundError:
            idx = None
        probe = (
            idx
            if idx is not None
            else batch_df.sparkSession.createDataFrame(
                [], "fingerprint long"
            )
        )
        survivors = exact_dedup_incremental(
            batch_df, probe, text_col=text_col, id_col=id_col,
            hash_fn=hash_fn,
        ).persist()
        try:
            if survivors.isEmpty():
                return
            if not _already_saved(name, batch_id):
                metastore.save_dataset(
                    survivors, name, attrs={"stream_batch_id": batch_id}
                )
            if _already_saved(idx_name, batch_id):
                return
            new_fp = fingerprint_index(
                survivors, text_col=text_col, hash_fn=hash_fn
            )
            if idx is not None:
                new_fp = idx.unionByName(new_fp).distinct()
            metastore.save_dataset(
                new_fp, idx_name, attrs={"stream_batch_id": batch_id}
            )
        finally:
            survivors.unpersist()

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_dataset(
    stream_df: DataFrame,
    name: str,
    metastore,
    checkpoint_dir: str,
    mode: str = "append",
    trigger_once: bool = True,
):
    """Sink a stream into the versioned metastore: each micro-batch appends a
    new dataset version via foreachBatch (exactly-once per batch through the
    streaming checkpoint)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        metastore.save_dataset(
            batch_df, name, attrs={"stream_batch_id": batch_id}
        )

    writer = (
        stream_df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def validated_stream_to_dataset(
    stream_df: DataFrame,
    name: str,
    metastore,
    checkpoint_dir: str,
    rules,
    quarantine_name: Optional[str] = None,
    mode: str = "append",
    trigger_once: bool = True,
):
    """Validating ingest: every micro-batch runs the declarative
    expectation rules (ops/expectations) BEFORE landing — clean rows
    append to ``name``, rows failing any row-level rule are tagged with
    the failed rule names and appended to ``quarantine_name`` (default
    ``{name}_quarantine``) instead of silently poisoning the corpus.

    Only row-level rules gate rows (they evaluate per record inside the
    batch projection — zero extra shuffles); set-level ``unique`` rules
    cannot be judged within one micro-batch and are rejected here — use
    the dedup ingests for cross-batch identity. Batch replays are
    idempotent via the stream_batch_id stamp (the near-dedup ingest's
    txn-log pattern): a dataset version already stamped with this batch
    id is not written again.
    """
    from ..ops.expectations import violations as _violations

    bad_rules = [r for r in rules if r.kind == "unique"]
    if bad_rules:
        raise ValueError(
            "validated_stream_to_dataset: unique rules are set-level and "
            "cannot gate a micro-batch; use near_dedup_stream_to_dataset "
            f"for cross-batch identity (got {[r.name for r in bad_rules]})"
        )
    q_name = quarantine_name or f"{name}_quarantine"

    def _already_saved(ds_name: str, batch_id: int) -> bool:
        rec = metastore.get_record(ds_name)
        dv = rec.latest_version() if rec is not None else None
        return bool(dv and dv.attrs.get("stream_batch_id") == batch_id)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bad = _violations(batch_df, rules)
        # good = the complement by PREDICATE (all rules pass), not an
        # except-all against the violation frame — one projection each,
        # no set-difference shuffle
        preds = None
        for r in rules:
            p = r.predicate()
            preds = p if preds is None else preds & p
        good = batch_df.filter(preds)
        if not _already_saved(name, batch_id) and not good.isEmpty():
            metastore.save_dataset(
                good, name, attrs={"stream_batch_id": batch_id}
            )
        if not _already_saved(q_name, batch_id) and not bad.isEmpty():
            metastore.save_dataset(
                bad, q_name, attrs={"stream_batch_id": batch_id}
            )

    writer = (
        stream_df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ann_ingest_stream(
    stream_df: DataFrame,
    name: str,
    metastore,
    checkpoint_dir: str,
    centroids,
    id_col: str,
    vec_col: str = "embedding",
    trigger_once: bool = True,
    source_version: Optional[str] = None,
):
    """IVF index maintenance on ingest — the streaming sibling of
    ``Metastore.ann_index_dataset``: continuously-arriving vectors are
    assigned to the FIXED coarse quantizer (``centroids``, trained once
    on a representative snapshot) and appended to ``{name}__ivf`` as
    versioned (id, vector, cell) batches, so the search index tracks the
    stream without ever rebuilding or rescanning history. Also persists
    the centroid table as ``{name}__ivf_centroids`` on the first batch,
    making a searcher self-contained: union the ``__ivf`` versions and
    probe with ``ops.similarity.ann_ivf_topk``.

    Scale shape: assignment is the codegen'd nearest-centroid expression
    (no UDF, no shuffle — a projection over each micro-batch); the
    per-batch state written is the batch's own rows. Re-training the
    quantizer on drifted data is an explicit batch decision
    (``ann_index_dataset`` on a new snapshot), not something a stream
    should do implicitly. Batch replays are idempotent via the
    stream_batch_id stamp (the exact_dedup_stream_to_dataset contract).

    Pass ``source_version`` when the stream extends a KNOWN saved
    snapshot of ``name``: every index version is then stamped with
    ``ivf_of_version`` so ``Metastore.ann_search(name, version=...)``
    resolves the streamed index exactly like a batch-built one. Without
    it the index is stream-only state — search it by unioning the
    ``{name}__ivf`` versions directly (the ann_stream_search oracle
    path).
    """
    from ..ops.similarity import assign_ivf_cells

    cents = [list(c) for c in centroids]
    if not cents:
        raise ValueError("ann_ingest_stream: centroids must be non-empty")
    ivf_name = f"{name}__ivf"
    cent_name = f"{name}__ivf_centroids"
    link = {"ivf_of": name, "ivf_cells": str(len(cents))}
    if source_version is not None:
        link["ivf_of_version"] = source_version

    def _already_saved(ds_name: str, batch_id: int) -> bool:
        rec = metastore.get_record(ds_name)
        dv = rec.latest_version() if rec is not None else None
        return bool(dv and dv.attrs.get("stream_batch_id") == batch_id)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if metastore.get_record(cent_name) is None:
            cent_df = spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
                "cell int, centroid array<double>",
            )
            metastore.save_dataset(
                cent_df, cent_name, attrs={**link, "stream": "true"}
            )
        if _already_saved(ivf_name, batch_id):
            return
        assigned = assign_ivf_cells(batch_df, cents, vec_col, "cell").select(
            id_col, vec_col, "cell"
        )
        metastore.save_dataset(
            assigned, ivf_name,
            attrs={**link, "stream_batch_id": batch_id},
        )

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
