"""Full local oracle sweep — the answer to the r03 advisor concern that
registry rotation curates which queries the external driver sees.

Runs EVERY entry in __spark_entry__.queries() (window + overflow) against
its DuckDB oracle at the driver's scale factor (sf0.01) with the same
dtype-strict comparison the driver uses, and writes the complete result
table to LOCAL_ORACLE.json at the repo root. The externally-unchecked
overflow subset is therefore visible (and diffable) every round.

Usage: python scripts/local_oracle.py [sf_dir]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from datachain_spark.session import default_spark_builder

    spark = (
        default_spark_builder("local-oracle")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out, n_fail = {}, 0
    for i, (name, fn) in enumerate(queries.items()):
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
            **({"detail": str(detail)[:300]} if not ok else {}),
        }
        print(f"{'PASS' if ok else 'FAIL'} {name} ({kind}) {out[name]['sec']}s")

    summary = {
        "sf_dir": sf_dir,
        "total": len(out),
        "pass": len(out) - n_fail,
        "fail": n_fail,
        "overflow_checked": sum(1 for r in out.values() if not r["window"]),
        "results": out,
    }
    with open(os.path.join(ROOT, "LOCAL_ORACLE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{summary['pass']}/{summary['total']} pass "
          f"({summary['overflow_checked']} overflow entries checked)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
