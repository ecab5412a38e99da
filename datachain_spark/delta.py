"""Incremental ("delta") processing and checkpoints.

Parity: /root/reference/src/datachain/delta.py:100-391 and the checkpoint
store (/root/reference/src/datachain/checkpoint.py:6-43,
lib/dc/datachain.py:696-722). The reference's incremental story is diff-based
batch re-runs (NOT streaming): on save, diff the current source version
against the version used by the previous run, re-apply the chain's steps to
just the changed rows, and merge with the previous result.

Our engine keeps the same semantics over metastore versions:

    result_vN = process(changed_rows) UNION (result_vN-1 MINUS rows whose
                delta_on keys changed or disappeared)

``process`` is a user callable DataChain -> DataChain (the "steps" — since
the DataFrame is the plan, re-application is just calling it on the diff).

Checkpoints: a fingerprint of (source version uuid, process function
bytecode) is stored on each saved version; an unchanged fingerprint skips the
whole run (parity with step-hash checkpoint reuse, hash_utils.py:32-120).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import functions as F

from .chain import DataChain
from .session import Session


class SchemaDriftError(RuntimeError):
    """Parity: delta.py schema drift detection — the re-applied steps must
    produce the previous result's schema."""


def fingerprint_fn(fn: Callable, extra: str = "") -> str:
    """Stable fingerprint of a processing function: code object bytes +
    constants (parity: callable hashing, hash_utils.py:79)."""
    h = hashlib.sha256()
    code = getattr(fn, "__code__", None)
    if code is not None:
        h.update(code.co_code)
        h.update(repr(code.co_consts).encode())
        h.update(repr(code.co_names).encode())
    else:
        h.update(repr(fn).encode())
    h.update(extra.encode())
    return h.hexdigest()[:32]


def delta_save(
    source: DataChain,
    process: Callable[[DataChain], DataChain],
    name: str,
    delta_on: Union[str, Sequence[str]],
    delta_compare: Union[str, Sequence[str], None] = None,
    delta_retry: Union[bool, str, None] = None,
    session: Optional[Session] = None,
    save_kwargs: Optional[dict] = None,
    ann_index: Optional[dict] = None,
    bm25_index: Optional[dict] = None,
    gram_index: Optional[dict] = None,
    profile: Optional[dict] = None,
    compact_target_bytes: Optional[int] = None,
    _job_extra: str = "",
) -> DataChain:
    """Incrementally (re)compute ``name`` from ``source``.

    - First run: full process(source).save(name).
    - Later runs: process only rows of ``source`` that are new or modified
      vs the snapshot used last time (keys ``delta_on``, change detection on
      ``delta_compare`` or all common columns), then union with the previous
      result minus rows whose keys were reprocessed or deleted.
    - ``delta_retry='error_col'``: additionally reprocess rows whose previous
      result has a non-null value in that column; ``delta_retry=True``:
      reprocess source rows missing from the result (anti-join), parity
      delta.py:126-186.

    Index refresh through the delta path (r08 verdict task 4):

    - ``save_kwargs`` forwards to every ``.save(name, ...)`` this run
      performs — ``zone_index=[cols]`` (+ ``zorder_by``) keeps the
      file-level zone map current on each incremental save, so
      ``read_dataset(prune=...)`` always answers against the newest
      version (the new version's files are freshly written, so its
      per-file zones are ONE column-pruned metadata-sized scan — there
      is no stale-file state to reuse).
    - ``ann_index={"id_col": ..., "vec_col": ..., "num_cells": ...,
      "kmeans_iters": ...}`` maintains the persisted IVF index: a full
      ``ann_index_dataset`` build on the first run, then
      ``ann_index_refresh`` on every later run — centroids reused,
      stored assignments kept, only this run's reprocessed keys
      re-assigned (passed as ``changed_keys`` when the delta key IS the
      index id; otherwise the refresh detects changes by in-plan vector
      comparison).
    - ``bm25_index={"id_col": ..., "text_col": ...}`` maintains the
      persisted lexical index the same way: full
      ``bm25_index_dataset`` build on the first run, then
      ``bm25_index_refresh`` — unchanged documents (by raw-text
      fingerprint) are never re-tokenized.
    - ``gram_index={"id_col": ..., "text_col": ..., "ngram": ...}``
      maintains the persisted phrase-search gram index
      (``gram_index_dataset`` / ``gram_index_refresh``) with the same
      fingerprint-join churn-only cost, so ``find_substring`` always
      probes an index of the newest version (r09 verdict task 7).
    - ``profile={"group_cols": ..., "value_col": ..., "lo": ...,
      "hi": ..., "bins": ..., "distinct_col": ...}`` keeps the release
      gate's per-version PROFILE current (ops/release.profile_version,
      r09 verdict task 2): a full profile on the first run; on
      incremental runs the APPEND-ONLY fast path — sketch only this
      run's processed rows and merge into the previous version's stored
      profile — is taken exactly when the run reprocessed no existing
      key and deleted none (merge == profile-the-union only then);
      any modify/delete/retry churn forces a full re-profile of the new
      version, honoring the contract at ops/release.py
      (``profile_version`` increment docstring).
    - ``compact_target_bytes=<bytes>`` runs OPTIMIZE-style maintenance
      inside the pipeline: when a save leaves the new version fragmented
      beyond the target layout (more files than ``ceil(total/target)``),
      it is compacted via ``compact_dataset`` — which carries every
      per-version index and the profile over to the rewritten copy — and
      the checkpoint stamp lands on the compacted head, so the next run
      no-ops as usual. At 100 TB incremental appends are how small files
      happen; this keeps maintenance in the same pass instead of a
      separate janitor job.

    What the next run diffs against (cheapest sound form, r11):

    - source is a stored dataset version read verbatim (``read_dataset``
      or a ``.save()`` return): NOTHING is copied — the immutable
      version is pinned in the result head's attrs
      (``delta_source_dataset``/``delta_source_version``), exactly the
      reference's "previous dataset version of the source". A re-run
      from the same pinned version with unchanged code converges with
      zero Spark jobs.
    - raw-storage source with explicit ``delta_compare``: an internal
      ``<name>__delta_source`` snapshot of ONLY the key+compare columns
      (the diff never reads the old side's payload).
    - raw-storage source, ``delta_compare=None``: full-width snapshot
      (the diff compares every common column).

    A vacuumed pin or a narrow snapshot that cannot answer this run's
    compare falls back to one full reprocess — a sound superset, never a
    wrong answer.
    """
    sess = session or source.session
    keys = [delta_on] if isinstance(delta_on, str) else list(delta_on)
    snap_name = f"{name}__delta_source"
    save_kw = dict(save_kwargs or {})

    def _refresh_ann(changed_keys_df=None, diffed_against=None) -> None:
        if ann_index:
            opts = dict(ann_index)
            id_col = opts.pop("id_col")
            if changed_keys_df is not None and keys == [id_col]:
                opts["changed_keys"] = changed_keys_df
                # the key set is only sound against the version this run
                # diffed from — the refresh drops it (vector-compare
                # fallback) when its base generation is a different one
                opts["changed_since"] = diffed_against
            sess.metastore.ann_index_refresh(
                sess.spark, name, id_col, **opts
            )
        if bm25_index:
            if sess.metastore._newest_bm25_generation(
                sess.spark, name
            ) is None:
                sess.metastore.bm25_index_dataset(
                    sess.spark, name, **bm25_index
                )
            else:
                sess.metastore.bm25_index_refresh(sess.spark, name)
        if gram_index:
            if sess.metastore._newest_grams_generation(
                sess.spark, name
            ) is None:
                sess.metastore.gram_index_dataset(
                    sess.spark, name, **gram_index
                )
            else:
                sess.metastore.gram_index_refresh(sess.spark, name)

    def _refresh_profile(increment_df=None, base_version=None) -> None:
        if not profile:
            return
        from .ops.release import profile_version

        profile_version(
            name, session=sess, increment=increment_df,
            base_version=base_version, **profile,
        )

    def _maybe_compact() -> None:
        """Compact the just-saved head when it is fragmented beyond the
        target layout. Runs BEFORE the index/profile maintenance (so
        each runs exactly once, against the final head) and before the
        job-hash stamp (so the stamp lands on the compacted version —
        the next run's checkpoint base). The fragmentation predicate is
        the metastore's own (should_compact), never a local copy."""
        if not compact_target_bytes:
            return
        if sess.metastore.should_compact(name, None, compact_target_bytes):
            sess.metastore.compact_dataset(
                sess.spark, name, target_file_bytes=compact_target_bytes,
            )

    prev_result_rec = sess.metastore.get_record(name)
    prev_snap_rec = sess.metastore.get_record(snap_name)

    job_hash = fingerprint_fn(process, extra=",".join(keys) + _job_extra)

    cmp_list = (
        None if delta_compare is None
        else [delta_compare] if isinstance(delta_compare, str)
        else list(delta_compare)
    )

    # pin-not-copy (guide §2.3/§8 — store keys and metadata, not
    # payloads): when the source IS a stored dataset version read
    # verbatim, that immutable version is the snapshot — nothing needs
    # writing; the next run diffs against the pinned version directly
    # (reference parity: delta reads the previous *dataset version* of
    # the source). Any transformation drops the marker via _evolve.
    info = getattr(source, "_dataset_info", None) or {}
    src_pin = None
    src_pin_uuid = None
    if (
        getattr(source, "_pristine_version_read", False)
        and info.get("name") and info.get("version")
    ):
        src_pin = (info["name"], info["version"])
        # pin the version's UUID too: a delete_dataset(force=True) + re-save
        # can reuse the same version STRING for different contents — the
        # uuid makes such a recreated version force the diff/full path
        # instead of silently converging against stale results
        try:
            src_pin_uuid = (
                sess.metastore.get_record(src_pin[0])
                .get_version(src_pin[1]).uuid
            )
        except Exception:  # noqa: BLE001 — unreadable pin: treat as unpinned
            src_pin = None

    def _snapshot_source() -> dict:
        """Persist what the next run's diff needs, the cheapest sound
        way; returns the pin attrs to stamp on the result head.

        - dataset-version source: write nothing (the pin identifies it);
        - raw source with explicit delta_compare: keys+compare columns
          only — diff(added/modified) takes left-side values and the
          deleted probe is keys-only, so the old side's payload columns
          are never read (a full-width copy of a 100-TB source per run
          otherwise);
        - raw source, compare=None: full snapshot (the diff compares
          every common column).
        """
        if src_pin is not None:
            return {
                "delta_source_dataset": src_pin[0],
                "delta_source_version": src_pin[1],
                "delta_source_uuid": src_pin_uuid,
            }
        narrow = None
        if cmp_list is not None:
            want = list(dict.fromkeys([*keys, *cmp_list]))
            cols = set(source.df.columns)
            if all(("." not in c) and c in cols for c in want):
                narrow = want
        if narrow is not None:
            source.select(*narrow).save(
                snap_name, attrs={"delta_snap_cols": ",".join(narrow)}
            )
        else:
            source.save(snap_name)
        return {}

    prev_version = (
        prev_result_rec.latest_version() if prev_result_rec else None
    )
    pin_name = prev_version.attrs.get("delta_source_dataset") if prev_version else None
    pin_ver = prev_version.attrs.get("delta_source_version") if prev_version else None

    def _full_run() -> DataChain:
        result = process(source).save(name, **save_kw)
        _maybe_compact()
        _refresh_ann()
        _refresh_profile()
        _stamp_meta(sess, name, job_hash, _snapshot_source())
        return result

    if prev_result_rec is None or (prev_snap_rec is None and not pin_name):
        # first run: full compute
        return _full_run()

    # zero-job convergence: the source is the exact dataset version the
    # previous run processed and the code is unchanged — contents are
    # guaranteed identical, so skip the diff entirely (a cascade refresh
    # over a diamond graph re-runs sibling pipelines; the untouched ones
    # converge without a single Spark job). delta_retry still forces the
    # diff path: error rows must reprocess even from an unchanged source.
    if (
        src_pin is not None and not delta_retry
        and (pin_name, pin_ver) == src_pin
        # a recreated version (same string, new uuid) must NOT converge;
        # a legacy pin without a stored uuid keeps its old behavior
        and prev_version.attrs.get("delta_source_uuid")
        in (None, src_pin_uuid)
        and prev_version.job_hash == job_hash
    ):
        prev_df, _, _ = sess.metastore.load_dataset(
            sess.spark, name, prev_version.version
        )
        return _delta_apply(
            sess, source, process, name, keys,
            [k.replace(".", "__") for k in keys],
            prev_version, prev_df, None, None, None, None,
            0, 0, job_hash, snap_name, save_kw, ann_index,
            bm25_index, gram_index, profile, compact_target_bytes,
            _refresh_ann, _refresh_profile, _maybe_compact,
            _snapshot_source, src_pin,
        )

    # resolve the previous source contents: pinned dataset version first,
    # stored snapshot otherwise
    prev_snap = None
    if pin_name:
        try:
            psdf, _, psdv_pin = sess.metastore.load_dataset(
                sess.spark, pin_name, pin_ver
            )
            pin_uuid = prev_version.attrs.get("delta_source_uuid")
            if pin_uuid is not None and psdv_pin.uuid != pin_uuid:
                # same version string, different contents (deleted with
                # force=True and re-saved): the contents the previous run
                # processed are gone — diffing against the recreated
                # version would mislabel its rows as "unchanged"
                prev_snap = None
            else:
                prev_snap = DataChain(psdf, sess)
        except Exception:  # noqa: BLE001 — pinned version vacuumed
            prev_snap = None
    elif prev_snap_rec is not None:
        psdf, _, psdv = sess.metastore.load_dataset(sess.spark, snap_name)
        snap_cols = psdv.attrs.get("delta_snap_cols")
        if snap_cols:
            stored = set(snap_cols.split(","))
            want = set(keys) | set(cmp_list or [])
            # a narrow snapshot only answers the diff it was written
            # for: this run must use explicit compare columns the
            # snapshot carries; anything else can't see modifications
            if cmp_list is not None and want <= stored:
                prev_snap = DataChain(psdf, sess)
        else:
            prev_snap = DataChain(psdf, sess)
    if prev_snap is None:
        # previous source contents unavailable (vacuumed pin / narrow
        # snapshot that can't answer this run's compare): reprocess
        # everything — one full pass, never wrong (vanished keys drop
        # because the fresh save IS the whole result)
        return _full_run()

    # the A/M status rides along so the append fast path can prove "no
    # reprocessed key displaced a previous row" from the SAME diff scan
    # (an extra join against prev keys would re-read the old side)
    changed_st = source.diff(
        prev_snap, on=keys, compare=delta_compare,
        added=True, modified=True, deleted=False, same=False,
        status_col="__delta_st",
    )
    changed = changed_st._evolve(changed_st.df.drop("__delta_st"))
    # rows that disappeared from the source (their results must drop)
    deleted = prev_snap.subtract(source, on=keys)

    prev_df, _, _ = sess.metastore.load_dataset(sess.spark, name, prev_version.version)
    prev_result = DataChain(prev_df, sess)

    # dotted keys (e.g. "file.path"): selecting them yields the LEAF name,
    # so key-only projections alias to a flat stand-in and joins use
    # on=keys / right_on=flat
    flat_keys = [k.replace(".", "__") for k in keys]

    def _key_sel(df):
        return df.select(*[F.col(k).alias(f) for k, f in zip(keys, flat_keys)])

    retry_keys = None
    if delta_retry:
        if isinstance(delta_retry, str) and delta_retry is not True:
            # string columns: non-empty value marks an error (the reference
            # filters C(col) != "" — delta.py:160-161 — matching the
            # examples' ""-on-success convention); other types: non-null
            from pyspark.sql import types as T

            err = F.col(delta_retry)
            field_type = prev_result.df.select(err.alias("__e")).schema["__e"].dataType
            cond = (
                (err.isNotNull() & (err != ""))
                if isinstance(field_type, T.StringType)
                else err.isNotNull()
            )
            retry_keys = DataChain(_key_sel(prev_result.filter(cond).df), sess)
        else:
            retry_keys = DataChain(
                _key_sel(source.subtract(prev_result, on=keys).df), sess
            )

    to_process = changed
    # emptiness probe, not a count: isEmpty stops at the first row
    # instead of scanning the corpus-sized retry frame
    if retry_keys is not None and not retry_keys.df.isEmpty():
        retry_rows = source.merge(
            retry_keys.distinct(*flat_keys), on=keys, right_on=flat_keys, inner=True
        ).select(*source.columns)
        unioned = to_process.df.unionByName(retry_rows.df)
        for k, f in zip(keys, flat_keys):
            if "." in k:
                unioned = unioned.withColumn(f, F.col(k))
        unioned = unioned.dropDuplicates(flat_keys).drop(
            *[f for k, f in zip(keys, flat_keys) if "." in k]
        )
        # keep the source's dataset/storage pins through the retry
        # union — a raw DataChain would save the version with an empty
        # dependency record and sever the lineage edge until the next
        # retry-free run
        to_process = DataChain(unioned, sess,
                               dependencies=changed._dependencies)

    # keys(+status)-only projections, computed ONCE and cached: they feed
    # the row counts, the stale-key union, the ANN changed-key set, the
    # append-mode displacement proof, and the post-save
    # profile-increment semi-join — without the cache each reuse re-runs
    # the corpus-sized diff/subtract plan (one redundant full job per
    # profiled save at 100 TB)
    n_modified = None
    if to_process is changed:
        # no retry union: count adds and modifications in ONE job over
        # the cached key+status projection
        proc_keys_st = changed_st.df.select(
            *[F.col(k).alias(f) for k, f in zip(keys, flat_keys)],
            "__delta_st",
        ).persist()
        proc_keys = proc_keys_st.drop("__delta_st")
        row = proc_keys_st.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("__delta_st") == "M", 1).otherwise(0)
            ).alias("m"),
        ).collect()[0]
        n_changed = int(row["n"])
        n_modified = int(row["m"] or 0)
        cached = proc_keys_st
    else:
        proc_keys = _key_sel(to_process.df).persist()
        n_changed = proc_keys.count()
        cached = proc_keys
    del_keys = _key_sel(deleted.df)
    # n_deleted is needed by the convergence check, the profile
    # fast-path gate AND the append-mode proof — always one keys-only
    # subtract over the (narrow/pinned) old side
    del_keys = del_keys.persist()
    n_deleted = del_keys.count()
    try:
        return _delta_apply(
            sess, source, process, name, keys, flat_keys, prev_version,
            prev_df, prev_result, to_process, proc_keys, del_keys,
            n_changed, n_deleted, job_hash, snap_name, save_kw, ann_index,
            bm25_index, gram_index, profile, compact_target_bytes,
            _refresh_ann, _refresh_profile, _maybe_compact,
            _snapshot_source, src_pin, n_modified,
        )
    finally:
        cached.unpersist()
        del_keys.unpersist()


def _delta_apply(
    sess, source, process, name, keys, flat_keys, prev_version, prev_df,
    prev_result, to_process, proc_keys, del_keys, n_changed, n_deleted,
    job_hash, snap_name, save_kw, ann_index, bm25_index, gram_index,
    profile, compact_target_bytes, _refresh_ann, _refresh_profile,
    _maybe_compact, _snapshot_source, src_pin, n_modified=None,
):
    """The diff-apply-merge tail of :func:`delta_save`, split out so the
    cached key projections (``proc_keys``/``del_keys``) un-persist on
    every exit path. Closures (`_refresh_*`, `_maybe_compact`) carry the
    index/profile/compaction config."""
    if n_changed == 0 and n_deleted == 0 and prev_version.job_hash == job_hash:
        # indexes requested but missing OR linked to an OLDER version
        # (e.g. an intermediate run saved without index maintenance):
        # bring them up to the current latest version now
        if ann_index:
            gen = sess.metastore._newest_ann_generation(sess.spark, name)
            if gen is None or gen[2] != prev_version.version:
                opts = dict(ann_index)
                sess.metastore.ann_index_refresh(
                    sess.spark, name, opts.pop("id_col"), **opts
                )
        if bm25_index:
            bgen = sess.metastore._newest_bm25_generation(sess.spark, name)
            if bgen is None or bgen[2].get(
                "bm25_of_version"
            ) != prev_version.version:
                if bgen is None:
                    sess.metastore.bm25_index_dataset(
                        sess.spark, name, **bm25_index
                    )
                else:
                    sess.metastore.bm25_index_refresh(sess.spark, name)
        if gram_index:
            ggen = sess.metastore._newest_grams_generation(sess.spark, name)
            if ggen is None:
                sess.metastore.gram_index_dataset(
                    sess.spark, name, **gram_index
                )
            elif ggen[2].get("grams_of_version") != prev_version.version:
                sess.metastore.gram_index_refresh(sess.spark, name)
        if save_kw.get("zone_index"):
            # zone maps rebuild inside .save(); a converged pipeline that
            # just TURNED ON zone_index never reaches a save, so
            # read_dataset(prune=...) would raise until the next real
            # change — build the missing map for the current version here
            from .error import DatasetNotFoundError

            try:
                sess.metastore._load_zone_index(
                    sess.spark, name, prev_version.version
                )
            except DatasetNotFoundError:
                sess.metastore.zone_index_dataset(
                    sess.spark, name, list(save_kw["zone_index"]),
                    version=prev_version.version,
                )
        if profile and not _has_matching_profile(
            sess, name, prev_version.version, profile
        ):
            _refresh_profile()
        # the converged head IS the current source version's result (the
        # diff just proved contents identical) — re-pin its recorded
        # dataset dependencies to the source's current versions so
        # lineage staleness converges; otherwise a no-change upstream
        # re-save leaves every downstream flagged stale forever and
        # refresh_downstream re-runs no-op pipelines on every cascade
        src_by_name = {
            d.get("dataset"): d
            for d in source._dependencies
            if d.get("dataset")
        }
        if src_by_name:
            rec2 = sess.metastore.get_record(name)
            v2 = rec2.get_version(prev_version.version)
            changed_pin = False
            seen = set()
            for d in v2.dependencies:
                nd = src_by_name.get(d.get("dataset"))
                if nd is not None:
                    seen.add(d.get("dataset"))
                    if nd.get("version") != d.get("version"):
                        d["version"] = nd.get("version")
                        changed_pin = True
            for nm, nd in src_by_name.items():
                if nm not in seen:
                    v2.dependencies.append(dict(nd))
                    changed_pin = True
            if changed_pin:
                sess.metastore._write_record(rec2)
        if src_pin is not None:
            # advance the stored source pin to the version this run
            # diffed (contents identical): the next unchanged run then
            # converges with ZERO Spark jobs instead of re-proving an
            # empty diff (manifest-only write)
            rec3 = sess.metastore.get_record(name)
            v3 = rec3.get_version(prev_version.version)
            new_uuid = None
            try:
                new_uuid = (
                    sess.metastore.get_record(src_pin[0])
                    .get_version(src_pin[1]).uuid
                )
            except Exception:  # noqa: BLE001
                pass
            if (
                v3.attrs.get("delta_source_dataset"),
                v3.attrs.get("delta_source_version"),
                v3.attrs.get("delta_source_uuid"),
            ) != (*src_pin, new_uuid):
                v3.attrs["delta_source_dataset"] = src_pin[0]
                v3.attrs["delta_source_version"] = src_pin[1]
                v3.attrs["delta_source_uuid"] = new_uuid
                sess.metastore._write_record(rec3)
        if compact_target_bytes and sess.metastore.should_compact(
            name, None, compact_target_bytes
        ):
            # compaction newly enabled on a converged pipeline: the head
            # is fragmented from earlier rounds — compact it now and
            # re-stamp the (unchanged) job hash on the compacted head so
            # the next run still no-ops
            sess.metastore.compact_dataset(
                sess.spark, name, target_file_bytes=compact_target_bytes,
            )
            _stamp_job_hash(sess, name, job_hash)
        return DataChain(prev_df, sess)

    processed = process(to_process)
    if set(processed.columns) != set(prev_result.columns):
        raise SchemaDriftError(
            f"delta re-run schema {sorted(processed.columns)} != previous "
            f"result schema {sorted(prev_result.columns)}"
        )

    # APPEND FAST PATH (r11): when the diff proved this run added rows
    # and displaced/deleted none, the new version is the previous
    # version's files BY REFERENCE plus only the processed rows — an
    # O(churn) write instead of the full kept∪processed corpus rewrite.
    # EXTEND FAST PATH (r12): modified/deleted churn takes the same
    # by-reference layout plus a churn-sized TOMBSTONE key set — readers
    # hide base rows whose key a later chain link tombstones, so an
    # update-heavy increment also stops rewriting the corpus.
    # Everything downstream (reads, indexes, profile, compaction,
    # fragmentation accounting) resolves the chain through the manifest;
    # compact_target_bytes heals long chains into self-contained copies,
    # and both paths refuse chains deeper than
    # $DATACHAIN_SPARK_MAX_CHAIN_DEPTH (default 16) — the next run then
    # does one full save, bounding per-read file listing and the
    # tombstone anti-join state.
    prev_types = {f.name: f.dataType for f in prev_result.df.schema.fields}
    proc_types = {f.name: f.dataType for f in processed.df.schema.fields}
    max_depth = int(os.environ.get("DATACHAIN_SPARK_MAX_CHAIN_DEPTH", "16"))
    rec_now = sess.metastore.get_record(name)
    chain_depth = len(sess.metastore._extends_closure(
        rec_now, rec_now.get_version(prev_version.version)
    ))
    extend_ok = (
        not prev_version.bucket
        and prev_types == proc_types
        and chain_depth < max_depth
        and not (
            set(save_kw)
            - {"zone_index", "zorder_by", "zorder_bits", "zorder_files",
               "zorder_strategy", "schema_policy"}
        )
    )
    append_mode = (
        extend_ok and n_modified == 0 and n_deleted == 0 and n_changed > 0
    )
    # the extend path only pays off while churn is the minority: past
    # half the corpus, the rewrite reads less than chain+tombstone reads
    # would cost every downstream scan
    extend_mode = (
        extend_ok and not append_mode
        and (n_changed + n_deleted) > 0
        and prev_version.num_rows > 0
        and 2 * (n_changed + n_deleted) <= prev_version.num_rows
    )
    if append_mode or extend_mode:
        new_rows = processed.df.select(*prev_result.df.columns)
        if save_kw.get("zorder_by"):
            from .ops.zorder import zorder_layout

            new_rows = zorder_layout(
                new_rows, save_kw["zorder_by"],
                bits=save_kw.get("zorder_bits", 8),
                num_partitions=save_kw.get("zorder_files"),
                strategy=save_kw.get("zorder_strategy", "minmax"),
            )
        if append_mode:
            new_dv = sess.metastore.append_dataset_version(
                new_rows, name, prev_version,
                dependencies=processed._dependencies,
            )
        else:
            # the tombstones are exactly the keys the rewrite path's
            # subtract would remove: every reprocessed key plus every
            # deleted key (an added key hits nothing in the base)
            stale = proc_keys.unionByName(del_keys).dropDuplicates()
            new_dv = sess.metastore.extend_dataset_version(
                sess.spark, new_rows, name, prev_version,
                stale, keys,
                dependencies=processed._dependencies,
            )
        if save_kw.get("zone_index"):
            sess.metastore.zone_index_dataset(
                sess.spark, name, list(save_kw["zone_index"]),
                version=new_dv.version,
            )
        from .catalog.metastore import split_name

        rdf, _, _ = sess.metastore.load_dataset(
            sess.spark, name, new_dv.version
        )
        result = DataChain(
            rdf, sess, source._settings,
            [{"dataset": name, "version": new_dv.version}],
        )
        ns, proj, base = split_name(name)
        result._dataset_info = {
            "name": name, "version": new_dv.version,
            "namespace": ns, "project": proj,
        }
        result._pristine_version_read = True
    else:
        # previous results still valid: key not reprocessed, not deleted
        stale_keys = DataChain(
            proc_keys.unionByName(del_keys).dropDuplicates(), sess,
        )
        kept = prev_result.subtract(stale_keys, on=keys, right_on=flat_keys)
        # the incremental save must keep recording the chain's lineage:
        # the processed branch carries the source's dataset/storage pins
        # (plus anything process() merged in) — without them the saved
        # version's dependency record goes empty after run 1 and the
        # cascade-refresh staleness walk (lineage.refresh_downstream)
        # loses the edge
        merged = DataChain(
            kept.df.unionByName(processed.df, allowMissingColumns=False),
            sess, dependencies=processed._dependencies,
        )
        result = merged.save(name, **save_kw)
    _maybe_compact()
    _refresh_ann(
        changed_keys_df=proc_keys if len(keys) == 1 else None,
        diffed_against=prev_version.version,
    )
    if profile:
        # the increment-merge fast path is sound only when this run was
        # PURE APPEND: nothing deleted and no reprocessed key displaced a
        # previous-result row — any churn double-counts in a merged
        # sketch, so churn re-profiles the new version from scratch.
        # Both the displacement check and the increment itself read the
        # SAVED head, never the lazy `processed` plan: re-evaluating a
        # nondeterministic process() after the save could profile rows
        # that differ from the ones actually persisted, and the old
        # `kept.count()` re-ran the corpus-sized subtract a second time —
        # the head's recorded num_rows minus the increment's count gives
        # the same number from one churn-key semi-join instead. (The
        # delta contract keeps delta_on key VALUES unchanged through
        # process(), so every persisted increment row carries a proc_key;
        # a pipeline that mutated keys would already misalign the next
        # run's diff.)
        if append_mode and _has_matching_profile(
            sess, name, prev_version.version, profile
        ):
            # the churn files ARE the persisted increment: read them
            # back directly — no head scan, no displacement arithmetic
            # (the diff already proved pure append), O(churn) total
            # (even if _maybe_compact just rewrote the head into a
            # self-contained copy, the pre-compact churn dir still holds
            # exactly the appended rows)
            import json as _json

            from pyspark.sql import types as T

            st = T.StructType.fromJson(_json.loads(new_dv.schema_json))
            inc_df = sess.spark.read.schema(st).parquet(
                sess.metastore.version_data_path(name, new_dv.version)
            )
            _refresh_profile(
                increment_df=inc_df,
                base_version=prev_version.version,
            )
        elif n_deleted == 0 and _has_matching_profile(
            sess, name, prev_version.version, profile
        ):
            head_df, _, head_v = sess.metastore.load_dataset(
                sess.spark, name
            )
            h = head_df.alias("h")
            p = proc_keys.alias("p")
            cond = None
            for k, f in zip(keys, flat_keys):
                c = F.col(f"h.{k}").eqNullSafe(F.col(f"p.{f}"))
                cond = c if cond is None else cond & c
            inc_df = h.join(p, cond, "left_semi").persist()
            try:
                kept_rows = head_v.num_rows - inc_df.count()
                if kept_rows == prev_version.num_rows:
                    _refresh_profile(
                        increment_df=inc_df,
                        base_version=prev_version.version,
                    )
                else:
                    _refresh_profile()
            finally:
                inc_df.unpersist()
        else:
            _refresh_profile()
    _stamp_meta(sess, name, job_hash, _snapshot_source())
    return result


def _has_matching_profile(
    sess: Session, name: str, data_version: str, cfg: dict
) -> bool:
    """True when a stored profile of ``data_version`` exists AND was built
    with exactly this config — the increment-merge precondition. A
    mere-existence check would let a config change (new bins/edges) reach
    profile_version's cfg-mismatch ValueError mid-save, after the data
    version was written but before the snapshot advanced."""
    from .catalog.metastore import split_name
    from .ops.release import _CFG_KEYS, _cfg_attrs

    gc = cfg.get("group_cols")
    keys = (
        ["__scope"] if gc is None
        else [gc] if isinstance(gc, str)
        else list(gc)
    )
    want = _cfg_attrs(
        keys, cfg.get("value_col"), cfg.get("lo"), cfg.get("hi"),
        cfg.get("bins", 64), cfg.get("distinct_col"),
    )
    pns, pproj, pbase = split_name(f"{name}__profile")
    prec = sess.metastore._read_record(pns, pproj, pbase)
    return any(
        v.attrs.get("profile_of_version") == data_version
        and all(v.attrs.get(k, "") == want.get(k, "") for k in _CFG_KEYS)
        for v in (prec.versions if prec else [])
    )


def _stamp_job_hash(sess: Session, name: str, job_hash: str) -> None:
    rec = sess.metastore.get_record(name)
    v = rec.latest_version()
    v.job_hash = job_hash
    sess.metastore._write_record(rec)


def _stamp_meta(
    sess: Session, name: str, job_hash: str, pin_attrs: dict
) -> None:
    """Stamp the checkpoint job hash plus the source-pin attrs on the
    head version. ``pin_attrs`` is authoritative for the run's snapshot
    mode: empty means a ``__delta_source`` snapshot was written, so any
    stale pin from an earlier dataset-sourced run must come OFF (the
    next run reads the pin first)."""
    rec = sess.metastore.get_record(name)
    v = rec.latest_version()
    v.job_hash = job_hash
    if pin_attrs:
        v.attrs.update(pin_attrs)
    else:
        v.attrs.pop("delta_source_dataset", None)
        v.attrs.pop("delta_source_version", None)
        v.attrs.pop("delta_source_uuid", None)
    sess.metastore._write_record(rec)


def plan_fingerprint(df, extra_key: str = "") -> str:
    """sha256 of the analyzed logical plan with session-assigned expression
    ids (`#123`) normalized away — identical chains built in different
    sessions fingerprint identically; any step/literal/column change still
    changes the hash."""
    import re as _re

    plan = df._jdf.queryExecution().analyzed().toString()
    plan = _re.sub(r"#\d+", "#", plan)
    return hashlib.sha256((plan + extra_key).encode()).hexdigest()[:32]


def checkpoint_save(
    chain: DataChain,
    name: str,
    session: Optional[Session] = None,
    extra_key: str = "",
) -> DataChain:
    """Checkpoint-aware save: if a version of ``name`` exists whose job_hash
    matches the fingerprint of this chain's logical plan, reuse it instead of
    recomputing (parity: lib/dc/datachain.py:696-722 checkpoint skip).

    The fingerprint hashes our own plan description (the DataFrame's
    *analyzed logical plan* string), not the physical plan — stable across
    AQE/statistics changes within a Spark version (SURVEY.md §7 recommends
    hashing step descriptors; the analyzed plan is the closest stable IR).
    """
    sess = session or chain.session
    h = plan_fingerprint(chain.df, extra_key)
    rec = sess.metastore.get_record(name)
    if rec is not None:
        for v in rec.versions:
            if v.job_hash == h:
                df, _, _ = sess.metastore.load_dataset(sess.spark, name, v.version)
                return DataChain(df, sess)
    dv = sess.metastore.save_dataset(chain.df, name, job_hash=h)
    df, _, _ = sess.metastore.load_dataset(sess.spark, name, dv.version)
    return DataChain(df, sess)


# --------------------------------------------------------------------------
# flag-style delta chains (reference lib/dc/storage.py:33-41 /
# lib/dc/datasets.py:36-43: read_*(delta=True, delta_on=..., delta_retry=...)
# ... .save(name=...)) — used verbatim by the public
# examples/incremental_processing scripts.
# --------------------------------------------------------------------------

#: methods the reference disables under delta (delta.py:28-46 delta_disabled
#: on agg/distinct/group_by/merge/union) unless delta_unsafe is set
DELTA_RESTRICTED = {"agg", "distinct", "group_by", "merge", "union"}


def _stable_repr(obj) -> str:
    """Deterministic repr for checkpoint fingerprints: callables hash by
    bytecode (their default repr embeds a memory address)."""
    if callable(obj):
        return fingerprint_fn(obj)
    try:
        return repr(obj)
    except Exception:  # noqa: BLE001
        return type(obj).__name__


class DeltaChain:
    """A pending incremental chain: transformation calls are RECORDED, not
    executed; ``save(name)`` replays them through :func:`delta_save` over a
    freshly-read source, so only new/changed/retried rows are processed.
    This is how the DataFrame-is-the-plan design supports the reference's
    step re-application (delta.py:189-391): the recorded calls ARE the
    steps, and every chain method that takes unbound Column expressions /
    callables replays cleanly onto the diff rows.

    Terminal reads (count/show/to_*) are not available before ``save`` —
    call them on its return value, exactly as the reference examples do.
    """

    def __init__(
        self,
        source_fn: Callable[[], DataChain],
        delta_on: Union[str, Sequence[str]],
        delta_compare: Union[str, Sequence[str], None] = None,
        delta_retry: Union[bool, str, None] = None,
        delta_unsafe: bool = False,
        session: Optional[Session] = None,
        _calls: Optional[list] = None,
    ) -> None:
        self._source_fn = source_fn
        self._delta_on = delta_on
        self._delta_compare = delta_compare
        self._delta_retry = delta_retry
        self._delta_unsafe = delta_unsafe
        self._session = session
        self._calls: list = list(_calls or [])

    @property
    def delta(self) -> bool:
        return True

    @property
    def delta_unsafe(self) -> bool:
        return self._delta_unsafe

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in DELTA_RESTRICTED and not self._delta_unsafe:
            raise NotImplementedError(
                f"Cannot use {name} with delta datasets - may cause"
                " inconsistency. Use delta_unsafe flag to allow this operation."
            )

        def record(*args, **kwargs):
            return DeltaChain(
                self._source_fn,
                self._delta_on,
                self._delta_compare,
                self._delta_retry,
                self._delta_unsafe,
                self._session,
                [*self._calls, (name, args, kwargs)],
            )

        return record

    def save(self, name: Optional[str] = None, **kwargs) -> DataChain:
        if not name:
            raise ValueError("delta processing requires save(name=...)")
        orig_kwargs = dict(kwargs)
        calls = self._calls

        def process(ch: DataChain) -> DataChain:
            for method, args, kw in calls:
                ch = getattr(ch, method)(*args, **kw)
            return ch

        extra = ";".join(
            f"{m}({','.join(map(_stable_repr, a))},"
            f"{','.join(f'{k}={_stable_repr(v)}' for k, v in sorted(kw.items()))})"
            for m, a, kw in calls
        )
        result = delta_save(
            self._source_fn(),
            process,
            name,
            delta_on=self._delta_on,
            delta_compare=self._delta_compare,
            delta_retry=self._delta_retry,
            session=self._session,
            ann_index=kwargs.pop("ann_index", None),
            bm25_index=kwargs.pop("bm25_index", None),
            gram_index=kwargs.pop("gram_index", None),
            profile=kwargs.pop("profile", None),
            compact_target_bytes=kwargs.pop("compact_target_bytes", None),
            save_kwargs=kwargs or None,
            _job_extra=extra,
        )
        # a flag-style chain IS a re-runnable pipeline (source_fn reads
        # fresh each call, the recorded calls are the steps) — register
        # it so lineage.refresh_downstream can heal this dataset after
        # an upstream bump without a manual register_pipeline
        from .lineage import register_pipeline

        register_pipeline(
            name, lambda: self.save(name, **orig_kwargs),
            session=result.session,
        )
        return result
