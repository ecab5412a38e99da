"""Local oracle sweep — the answer to the r03 advisor concern that
registry rotation curates which queries the external driver sees, now
TIERED (r08 verdict task 8: the full sweep costs ~15-25 min at 220+
entries, too slow as the per-commit loop).

Tiers:
- ``--tier full`` (default): run EVERY entry in __spark_entry__.queries()
  (window + overflow) against its DuckDB oracle at the driver's scale
  factor, same dtype-strict comparison the driver uses.
- ``--tier window``: the first-50 driver window only.
- ``--only name1,name2``: an explicit subset (changed-ops loop).

Tiered runs MERGE into the existing LOCAL_ORACLE.json: entries not run
keep their previous verdict, and every entry records the tier and
timestamp of the run that produced it, so the file never silently
presents a partial sweep as a full one. Top-level metadata carries
``tier``, ``ran``/``carried_over`` counts, and ``complete`` (True only
when every current registry entry was verified in THIS run) — judges
read ``complete`` + per-entry ``swept`` provenance to trust the count.

Usage: python scripts/local_oracle.py [sf_dir] [--tier full|window]
       [--only name1,name2]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402

OUT_PATH = os.path.join(ROOT, "LOCAL_ORACLE.json")


def _parse_args(argv):
    sf_dir, tier, only = "/root/testdata/sf0.01", "full", None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--tier":
            tier = argv[i + 1]
            i += 2
        elif a == "--only":
            only = [s.strip() for s in argv[i + 1].split(",") if s.strip()]
            tier = "subset"
            i += 2
        else:
            sf_dir = a
            i += 1
    if tier not in ("full", "window", "subset"):
        raise SystemExit(f"unknown tier {tier!r}")
    return sf_dir, tier, only


def main() -> int:
    sf_dir, tier, only = _parse_args(sys.argv[1:])
    from datachain_spark.session import default_spark_builder

    spark = (
        default_spark_builder("local-oracle")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # absorb JVM/codegen/first-job warmup BEFORE timing anything — the
    # slot-1 entry was being billed 3-4x its warm wall for it (r10)
    spark.range(2_000_000).selectExpr("avg(xxhash64(id))").collect()

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries)
    if tier == "window":
        targets = set(names[:50])
    elif tier == "subset":
        unknown = [n for n in (only or []) if n not in queries]
        if unknown:
            raise SystemExit(f"--only names not in registry: {unknown}")
        targets = set(only or [])
    else:
        targets = set(names)

    # previous results carry over for entries this tier does not run —
    # but only when they were produced at the same sf_dir
    prev = {}
    if tier != "full" and os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                old = json.load(f)
            if old.get("sf_dir") == sf_dir:
                prev = old.get("results", {})
        except (OSError, ValueError):
            prev = {}

    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    out, n_fail, ran = {}, 0, 0
    for i, (name, fn) in enumerate(queries.items()):
        if name not in targets:
            if name in prev:
                out[name] = dict(prev[name])
                # window membership is a property of the CURRENT registry
                # order, not of the sweep that produced the carried result
                out[name]["window"] = i < 50
                if not out[name].get("ok", False):
                    n_fail += 1
            continue
        ran += 1
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, detail = compare(df, oracles[name], sf_dir)
                kind = "oracle"
            else:
                ok, detail = df.count() >= 0 and df.schema is not None, ""
                kind = "rows_only"
        except Exception as exc:  # noqa: BLE001
            ok, detail, kind = False, f"{type(exc).__name__}: {exc}", "error"
        if not ok:
            n_fail += 1
        out[name] = {
            "ok": bool(ok),
            "kind": kind,
            "window": i < 50,
            "sec": round(time.monotonic() - t0, 3),
            "swept": {"tier": tier, "at": stamp},
            **({"detail": str(detail)[:300]} if not ok else {}),
        }
        print(f"{'PASS' if ok else 'FAIL'} {name} ({kind}) {out[name]['sec']}s")

    missing = [n for n in names if n not in out]
    summary = {
        "sf_dir": sf_dir,
        "tier": tier,
        "ran": ran,
        "carried_over": len(out) - ran,
        "not_covered": missing,
        "complete": ran == len(names),
        "total": len(out),
        "pass": len(out) - n_fail,
        "fail": n_fail,
        "overflow_checked": sum(
            1 for r in out.values() if not r.get("window", True)
        ),
        "results": out,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"\n[{tier}] ran {ran}, carried {summary['carried_over']}, "
        f"{summary['pass']}/{summary['total']} pass"
        + (f", NOT COVERED: {len(missing)}" if missing else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
