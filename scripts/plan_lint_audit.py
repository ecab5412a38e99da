"""Full-registry static plan-lint audit (r09 verdict task 5: the
per-commit guard lints only the 50-entry driver window; the full audit
must re-run as the registry grows, and its recency must be visible).

Builds EVERY query in __spark_entry__.queries() at the given sf_dir and
runs plans.lint_plan over the returned DataFrame. Severity=error
findings (cartesian products, single-partition windows) fail the audit;
warnings are recorded. The result — registry count, per-rule counts,
violations, timestamp — is written to LINT.json at the repo root so
judges can see WHEN the last clean full audit ran and at what count.

Usage: python scripts/plan_lint_audit.py [sf_dir]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402

OUT_PATH = os.path.join(ROOT, "LINT.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from datachain_spark.plans import lint_plan
    from datachain_spark.session import default_spark_builder

    spark = (
        default_spark_builder("plan-lint-audit")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    errors: dict = {}
    warn_counts: dict = {}
    build_failures: dict = {}
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            findings = lint_plan(df)
        except Exception as exc:  # noqa: BLE001
            build_failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"BUILD-FAIL {name}: {build_failures[name]}")
            continue
        errs = [f for f in findings if f["severity"] == "error"]
        if errs:
            errors[name] = errs
            print(f"ERROR {name}: {[f['rule'] for f in errs]}")
        for f in findings:
            if f["severity"] == "warning":
                warn_counts[f["rule"]] = warn_counts.get(f["rule"], 0) + 1

    summary = {
        "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf_dir": sf_dir,
        "registry_entries": len(queries),
        "linted": len(queries) - len(build_failures),
        "errors": errors,
        "error_count": len(errors),
        "warning_counts_by_rule": warn_counts,
        "build_failures": build_failures,
        "clean": not errors and not build_failures,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"\nlinted {summary['linted']}/{summary['registry_entries']} — "
        f"{'CLEAN' if summary['clean'] else 'VIOLATIONS'} "
        f"({len(errors)} error entries, {len(build_failures)} build failures)"
    )
    return 0 if summary["clean"] else 1


if __name__ == "__main__":
    sys.exit(main())
