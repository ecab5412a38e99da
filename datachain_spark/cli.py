"""CLI subset: dataset management + quick queries.

Parity: /root/reference/src/datachain/cli/parser/__init__.py:59-530 (the
dataset subcommands: ls, rm, show, plus du-style storage listing). Invoked as
``python -m datachain_spark.cli <cmd> ...``.
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
