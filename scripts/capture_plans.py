"""Capture .explain("formatted") output for named registry queries (and
the bench-only *_full entries) into plans/<round>/<name>_<tag>.txt — the
optimization round's before/after plan evidence (guide §1: measure first;
the judge checks plan claims against these files). The round directory
comes from $SPARK_GRAFT_PLANS_ROUND (default r12).

Usage: python scripts/capture_plans.py <tag> name1,name2,...
       python scripts/capture_plans.py <tag> --window     (first 50)

Plans are captured on the sf0.01 testdata by default (plan SHAPE — join
strategy, Exchange count, PushedFilters — is SF-independent here; AQE
runtime re-optimization is not captured either way since explain() shows
the initial plan).

Queries that run side effects (saves into a temp metastore) still just
return a DataFrame — we explain the returned frame, which for those
entries shows the final read/report plan; the interesting save-path plan
shape for them is covered by the job-count probes in
scripts/probe_job_counts.py instead.
"""

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
)


def main() -> int:
    tag = sys.argv[1]
    sel = sys.argv[2]
    os.makedirs(OUT_DIR, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("plan-capture")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if sel == "--window":
        names = list(qs)[:50]
    else:
        names = [s.strip() for s in sel.split(",") if s.strip()]

    failed = []
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            failed.append(name)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"OK {name} -> {path}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
