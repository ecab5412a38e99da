"""CLI: dataset management + filesystem views + quick queries.

Parity: /root/reference/src/datachain/cli/parser/__init__.py:59-530 —
datasets/show/rm/ls/du plus find, cp, index, edit, gc, clear-cache and
query (script runner). Invoked as ``python -m datachain_spark.cli <cmd> ...``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datachain-spark")
    p.add_argument("--metastore", default=None, help="metastore root dir")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("datasets", help="list saved datasets and versions")

    p_show = sub.add_parser("show", help="preview a dataset version")
    p_show.add_argument("name")
    p_show.add_argument("--version", default=None)
    p_show.add_argument("--limit", type=int, default=20)

    p_rm = sub.add_parser("rm", help="delete a dataset (or one version)")
    p_rm.add_argument("name")
    p_rm.add_argument("--version", default=None)

    p_ls = sub.add_parser("ls", help="list files under a storage URI")
    p_ls.add_argument("uri")

    p_du = sub.add_parser("du", help="total size per top-level dir of a URI")
    p_du.add_argument("uri")

    p_find = sub.add_parser("find", help="find files by glob/suffix/size")
    p_find.add_argument("uri")
    p_find.add_argument("--glob", default=None, dest="name_glob")
    p_find.add_argument("--suffix", default=None)
    p_find.add_argument("--min-size", type=int, default=None)
    p_find.add_argument("--max-size", type=int, default=None)

    p_cp = sub.add_parser("cp", help="copy files under a URI to a target dir")
    p_cp.add_argument("uri")
    p_cp.add_argument("output")
    p_cp.add_argument("--placement", default="fullpath",
                      choices=["fullpath", "filename", "etag"])

    # parity: the reference's `clone` (cli/parser:99) is cp + recursive
    # defaults — same distributed export path here
    p_clone = sub.add_parser("clone", help="alias of cp (reference parity)")
    p_clone.add_argument("uri")
    p_clone.add_argument("output")
    p_clone.add_argument("--placement", default="fullpath",
                         choices=["fullpath", "filename", "etag"])

    p_index = sub.add_parser("index", help="(re)list a URI into the listing cache")
    p_index.add_argument("uri")

    p_edit = sub.add_parser("edit", help="edit dataset description/attrs")
    p_edit.add_argument("name")
    p_edit.add_argument("--description", default=None)
    p_edit.add_argument("--attr", action="append", default=[],
                        help="key=value (repeatable)")

    p_compact = sub.add_parser(
        "compact", help="rewrite a dataset version with target-sized files"
    )
    p_compact.add_argument("name")
    p_compact.add_argument("--version", default=None)
    p_compact.add_argument("--target-mb", type=int, default=128)

    p_card = sub.add_parser(
        "card", help="print a markdown dataset card (metadata only, no scan)"
    )
    p_card.add_argument("name")

    p_zones = sub.add_parser(
        "zones", help="build a file-level zone-map index for a dataset version"
    )
    p_zones.add_argument("name")
    p_zones.add_argument("--cols", required=True,
                         help="comma-separated columns to index")
    p_zones.add_argument("--version", default=None)

    p_prune = sub.add_parser(
        "prune", help="range-predicate skip report from a stored zone index"
    )
    p_prune.add_argument("name")
    p_prune.add_argument("--col", required=True)
    p_prune.add_argument("--lo", required=True,
                         help="lower bound (typed against the indexed column)")
    p_prune.add_argument("--hi", required=True,
                         help="upper bound (typed against the indexed column)")
    p_prune.add_argument("--version", default=None)

    p_promote = sub.add_parser(
        "promote",
        help="publish gate: drift/schema/row checks vs the previous "
             "version from sketch state (exit 1 on block)",
    )
    p_promote.add_argument("name")
    p_promote.add_argument("--max-psi", type=float, default=None)
    p_promote.add_argument("--max-row-delta", type=float, default=None,
                           help="max |n_new - n_old| / n_old per group")
    p_promote.add_argument("--min-rows", type=int, default=None)
    p_promote.add_argument("--allow-removed-columns", action="store_true")
    p_promote.add_argument("--allow-type-changes", action="store_true")
    p_promote.add_argument("--v-old", default=None)
    p_promote.add_argument("--v-new", default=None)
    p_promote.add_argument("--no-audit", action="store_true",
                           help="skip persisting the outcome to "
                                "<name>__promotions")

    p_promotions = sub.add_parser(
        "promotions",
        help="list recorded promote outcomes of a dataset (the "
             "persisted gate evidence)",
    )
    p_promotions.add_argument("name")
    p_promotions.add_argument("--failed-only", action="store_true")

    p_vacuum = sub.add_parser(
        "vacuum", help="delete all but the newest N versions of a dataset"
    )
    p_vacuum.add_argument("name")
    p_vacuum.add_argument("--keep-last", type=int, default=3)
    p_vacuum.add_argument("--older-than", type=float, default=None,
                          help="grace period in seconds")
    p_vacuum.add_argument("--dry-run", action="store_true")

    sub.add_parser("gc", help="delete leftover session-temp datasets")
    sub.add_parser("clear-cache", help="drop all cached storage listings")

    p_query = sub.add_parser("query", help="run a python script that builds a chain")
    p_query.add_argument("script")

    args = p.parse_args(argv)

    from .session import DEFAULT_METASTORE, Session

    if args.cmd == "datasets":
        # metastore-only: no Spark needed to list
        from .catalog.metastore import Metastore

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        for rec in ms.list_datasets():
            for v in rec.versions:
                print(f"{rec.full_name}\t{v.version}\t{v.num_rows} rows")
        return 0

    if args.cmd == "rm":
        from .catalog.metastore import Metastore

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        ms.delete_dataset(args.name, version=args.version)
        print(f"deleted {args.name}" + (f" v{args.version}" if args.version else ""))
        return 0

    if args.cmd == "edit":
        # metastore-only (parity: `datachain dataset edit`)
        from .catalog.metastore import Metastore

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        rec = ms.get_record(args.name)
        if rec is None:
            print(f"dataset not found: {args.name}", file=sys.stderr)
            return 1
        if args.description is not None:
            rec.description = args.description
        if args.attr:
            ver = rec.get_version(None)  # attrs live on the latest version
            for kv in args.attr:
                k, _, v = kv.partition("=")
                ver.attrs[k] = v
        ms._write_record(rec)
        print(f"updated {rec.full_name}")
        return 0

    if args.cmd == "compact":
        # needs Spark (rewrites data files)
        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        dv = sess.metastore.compact_dataset(
            sess.spark, args.name, version=args.version,
            target_file_bytes=args.target_mb << 20,
        )
        print(f"compacted {args.name} -> v{dv.version}")
        return 0

    if args.cmd == "zones":
        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        dv = sess.metastore.zone_index_dataset(
            sess.spark, args.name,
            [c.strip() for c in args.cols.split(",") if c.strip()],
            version=args.version,
        )
        print(f"indexed {args.name} -> {args.name}__zones v{dv.version}")
        return 0

    if args.cmd == "prune":
        from pyspark.sql import types as T

        from .ops.pruning import prune_report

        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        idx = sess.metastore._load_zone_index(
            sess.spark, args.name, args.version
        )
        mcol = f"{args.col}_min"
        if mcol not in idx.columns:
            print(f"zone index has no zones for column {args.col!r}",
                  file=sys.stderr)
            return 1
        # Bounds arrive as strings; numeric zone columns get numeric
        # bounds, string/date/timestamp zones keep the string (Spark
        # casts the literal against the column side, not vice versa).
        if isinstance(idx.schema[mcol].dataType, T.NumericType):
            try:
                lo, hi = float(args.lo), float(args.hi)
            except ValueError:
                print(
                    f"--lo/--hi must be numeric for zone column "
                    f"{args.col!r} (got {args.lo!r}, {args.hi!r})",
                    file=sys.stderr,
                )
                return 1
        else:
            lo, hi = args.lo, args.hi
        rep = prune_report(idx, {args.col: (lo, hi)}).first()
        if not rep["total_files"]:
            print("0 files indexed — nothing to prune")
            return 0
        print(
            f"files {rep['kept_files']}/{rep['total_files']} kept, "
            f"rows {rep['kept_rows']}/{rep['total_rows']} "
            f"(skip {rep['file_skip_frac']:.1%} files / "
            f"{rep['row_skip_frac']:.1%} rows)"
        )
        return 0

    if args.cmd == "card":
        from .card import dataset_card
        from .session import Session

        # Session.spark is lazy — a metadata-only card never boots the JVM.
        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        print(dataset_card(args.name, session=sess), end="")
        return 0

    if args.cmd == "promote":
        from .ops.release import promote

        policy = {
            "allow_removed_columns": bool(args.allow_removed_columns),
            "allow_type_changes": bool(args.allow_type_changes),
        }
        if args.max_psi is not None:
            policy["max_psi"] = args.max_psi
        if args.max_row_delta is not None:
            policy["max_abs_row_delta_frac"] = args.max_row_delta
        if args.min_rows is not None:
            policy["min_rows"] = args.min_rows
        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        try:
            ok, rows = promote(
                args.name, policy=policy, v_old=args.v_old,
                v_new=args.v_new, raise_on_block=False,
                audit=not args.no_audit, session=sess,
            )
        except ValueError as exc:
            # empty policy / missing profiles: a CLI error, not a traceback
            print(f"promote: {exc}", file=sys.stderr)
            return 2
        for r in rows:
            val = "-" if r["value"] is None else f"{r['value']:g}"
            print(
                f"{'PASS' if r['passed'] else 'FAIL'} "
                f"{r['check']}[{r['target']}] value={val} "
                f"threshold={r['threshold']:g}"
            )
        print(f"promotion: {'PASS' if ok else 'BLOCKED'}")
        return 0 if ok else 1

    if args.cmd == "promotions":
        from .ops.release import promotions

        sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
        try:
            rows = promotions(args.name, session=sess).collect()
        except ValueError as exc:
            print(f"promotions: {exc}", file=sys.stderr)
            return 2
        for r in rows:
            if args.failed_only and r["passed"]:
                continue
            val = "-" if r["value"] is None else f"{r['value']:g}"
            print(
                f"{r['audit_id']} [{'PASS' if r['gate_passed'] else 'BLOCKED'}"
                f" {r['v_old'] or '-'}->{r['v_new']}] "
                f"{'pass' if r['passed'] else 'FAIL'} "
                f"{r['check']}[{r['target']}] value={val} "
                f"threshold={r['threshold']:g}"
            )
        return 0

    if args.cmd == "vacuum":
        from .catalog.metastore import Metastore

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        removed = ms.vacuum_dataset(
            args.name, keep_last=args.keep_last,
            older_than=args.older_than, dry_run=args.dry_run,
        )
        verb = "would remove" if args.dry_run else "removed"
        print(f"{verb} {len(removed)} version(s): {', '.join(removed) or '-'}")
        return 0

    if args.cmd == "gc":
        # drop datasets in the session-temp project (parity: `datachain gc`
        # cleaning abandoned temp tables, query/session.py:222-231)
        from .catalog.metastore import Metastore

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        n = 0
        for rec in ms.list_datasets():
            if rec.namespace == "session" and rec.project == "tmp":
                ms.delete_dataset(rec.full_name)
                n += 1
        print(f"removed {n} temp dataset(s)")
        return 0

    if args.cmd == "clear-cache":
        # parity: `datachain clear-cache` — both cached listings (lst__*)
        # and the etag-keyed file blob cache
        from .catalog.metastore import Metastore
        from .sources.files import clear_file_cache
        from .sources.storage import LISTING_PREFIX

        ms = Metastore(args.metastore or DEFAULT_METASTORE)
        n = 0
        for rec in ms.list_datasets():
            if rec.name.startswith(LISTING_PREFIX):
                ms.delete_dataset(rec.full_name)
                n += 1
        blobs = clear_file_cache()
        print(f"removed {n} cached listing(s), {blobs} cached blob(s)")
        return 0

    sess = Session(metastore_dir=args.metastore or DEFAULT_METASTORE)
    Session._global = sess

    if args.cmd == "show":
        from .sources import read_dataset

        read_dataset(args.name, args.version, session=sess).show(args.limit)
        return 0

    if args.cmd == "ls":
        from .sources import read_storage

        ch = read_storage(args.uri, session=sess, update=True)
        for path, size in sorted(ch.to_list("file.path", "file.size")):
            print(f"{size:>12}  {path}")
        return 0

    if args.cmd == "find":
        from .sources import read_storage
        from .sources.storage import find

        ch = read_storage(args.uri, session=sess, update=True)
        hits = find(ch, glob=args.name_glob, suffix=args.suffix,
                    min_size=args.min_size, max_size=args.max_size)
        for path, size in sorted(hits.to_list("file.path", "file.size")):
            print(f"{size:>12}  {path}")
        return 0

    if args.cmd in ("cp", "clone"):
        from .sources import read_storage
        from .sources.files import export_files

        ch = read_storage(args.uri, session=sess, update=True)
        export_files(ch.df, args.output, placement=args.placement)
        print(f"copied {ch.count()} file(s) to {args.output}")
        return 0

    if args.cmd == "index":
        from .sources import read_storage

        ch = read_storage(args.uri, session=sess, update=True)
        print(f"indexed {ch.count()} file(s) under {args.uri}")
        return 0

    if args.cmd == "query":
        # parity: `datachain query <script>` — exec a python file; if it
        # leaves a DataChain bound to `chain` (or prints its own output),
        # show the first rows
        import runpy

        ns = runpy.run_path(args.script, run_name="__main__")
        ch = ns.get("chain")
        if ch is not None and hasattr(ch, "show"):
            ch.show(20)
        return 0

    if args.cmd == "du":
        from pyspark.sql import functions as F

        from .functions import path as fp
        from .sources import read_storage

        ch = read_storage(args.uri, session=sess, update=True)
        agg = (
            ch.df.select(
                F.substring_index(F.col("file.path"), "/", 1).alias("top"),
                F.col("file.size").alias("size"),
            )
            .groupBy("top")
            .agg(F.sum("size").alias("bytes"), F.count(F.lit(1)).alias("files"))
            .orderBy("top")
        )
        for r in agg.collect():
            print(f"{r['bytes']:>12}  {r['files']:>6}  {r['top']}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
