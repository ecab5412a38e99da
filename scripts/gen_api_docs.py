"""Generate API.md — a one-line-per-symbol inventory of the public surface,
pulled from live docstrings so it can't drift from the code.

Usage: python scripts/gen_api_docs.py   (writes /root/repo/API.md)
"""

import importlib
import inspect
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SECTIONS = [
    ("Top-level (`import datachain_spark as dc`)", "datachain_spark", None),
    ("DataChain methods", "datachain_spark.chain", "DataChain"),
    ("Scalar/aggregate functions (`dc.func`)", "datachain_spark.func", None),
    ("ops.dedup", "datachain_spark.ops.dedup", None),
    ("ops.text", "datachain_spark.ops.text", None),
    ("ops.similarity", "datachain_spark.ops.similarity", None),
    ("ops.pq", "datachain_spark.ops.pq", None),
    ("ops.semdedup", "datachain_spark.ops.semdedup", None),
    ("ops.zorder", "datachain_spark.ops.zorder", None),
    ("ops.sketches", "datachain_spark.ops.sketches", None),
    ("ops.classify", "datachain_spark.ops.classify", None),
    ("ops.graph", "datachain_spark.ops.graph", None),
    ("ops.tokenize", "datachain_spark.ops.tokenize", None),
    ("ops.retrieval", "datachain_spark.ops.retrieval", None),
    ("ops.selection", "datachain_spark.ops.selection", None),
    ("ops.c4", "datachain_spark.ops.c4", None),
    ("ops.packing", "datachain_spark.ops.packing", None),
    ("ops.asof / ops.interval", "datachain_spark.ops.asof", None),
    ("ops.diff", "datachain_spark.ops.diff", None),
    ("ops.multimodal", "datachain_spark.ops.multimodal", None),
    ("ops.pruning", "datachain_spark.ops.pruning", None),
    ("ops.release", "datachain_spark.ops.release", None),
    ("streaming", "datachain_spark.streaming.stream", None),
    ("delta / incremental", "datachain_spark.delta", None),
]


def first_line(doc):
    if not doc:
        return ""
    for line in doc.strip().splitlines():
        line = line.strip()
        if line:
            return line.rstrip(".") + "."
    return ""


def public_members(mod, cls_name):
    if cls_name:
        obj = getattr(mod, cls_name)
        for name, m in sorted(vars(obj).items()):
            if name.startswith("_") or not callable(m):
                continue
            yield name, inspect.getdoc(m)
    else:
        names = getattr(mod, "__all__", None) or [
            n for n in sorted(vars(mod))
            if not n.startswith("_")
        ]
        for name in sorted(set(names)):
            m = getattr(mod, name, None)
            if m is None or inspect.ismodule(m):
                continue
            if not (inspect.isfunction(m) or inspect.isclass(m)):
                continue
            if getattr(m, "__module__", "").startswith("pyspark"):
                continue
            yield name, inspect.getdoc(m)


def main():
    out = [
        "# API inventory",
        "",
        "One line per public symbol, generated from live docstrings by",
        "`scripts/gen_api_docs.py` — regenerate after adding operators.",
        "",
    ]
    total = 0
    for title, modname, cls in SECTIONS:
        mod = importlib.import_module(modname)
        rows = [(n, first_line(d)) for n, d in public_members(mod, cls)]
        rows = [r for r in rows if r[1]]
        if not rows:
            continue
        out.append(f"## {title}")
        out.append("")
        for name, summary in rows:
            if len(summary) > 160:
                summary = summary[:157] + "..."
            out.append(f"- `{name}` — {summary}")
            total += 1
        out.append("")
    out.append(f"_{total} documented public symbols._")
    with open(os.path.join(ROOT, "API.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"API.md: {total} symbols")


if __name__ == "__main__":
    main()
