"""Dataset cards: a human-readable markdown summary of a versioned
dataset, generated from metastore metadata ONLY — no data scan, so a card
for a 100-TB dataset costs a manifest read.

Covers the documentation surface a dataset release needs (the HuggingFace
dataset-card / Datasheets-for-Datasets shape, driven by what the
metastore already records on save): description, version history with row
counts and timestamps, the latest schema, attrs, lineage dependencies and
a preview sample. No reference counterpart (its Studio UI renders this
server-side; here it is a plain function + CLI-friendly string).
"""

from __future__ import annotations

import datetime
import json
from typing import Optional

from .session import Session


def _fmt_ts(ts: float) -> str:
    return datetime.datetime.fromtimestamp(ts, datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC"
    )


def dataset_card(name: str, session: Optional[Session] = None) -> str:
    """Render a markdown card for a dataset (all versions, latest schema,
    lineage, preview). Raises if the dataset does not exist."""
    from .catalog.metastore import DatasetNotFoundError

    sess = Session.get(session)
    rec = sess.metastore.get_record(name)
    if rec is None:
        raise DatasetNotFoundError(f"dataset not found: {name}")
    latest = rec.latest_version()
    if latest is None:
        raise DatasetNotFoundError(f"dataset has no versions: {name}")
    lines = [f"# {rec.full_name}", ""]
    if rec.description:
        lines += [rec.description, ""]
    lines += [
        f"**Latest version:** {latest.version} — "
        f"{latest.num_rows:,} rows ({_fmt_ts(latest.created_at)})",
        "",
        "## Versions",
        "",
        "| version | rows | created | attrs |",
        "|---|---|---|---|",
    ]
    for v in sorted(rec.versions, key=lambda v: v.created_at, reverse=True):
        attrs = ", ".join(f"{k}={v2}" for k, v2 in sorted(v.attrs.items())) or "-"
        lines.append(
            f"| {v.version} | {v.num_rows:,} | {_fmt_ts(v.created_at)} | {attrs} |"
        )
    lines += ["", "## Schema (latest)", ""]
    try:
        fields = json.loads(latest.schema_json).get("fields", [])
    except (ValueError, AttributeError):
        fields = []
    lines += ["| column | type |", "|---|---|"]
    for f in fields:
        t = f.get("type")
        lines.append(f"| {f.get('name')} | {t if isinstance(t, str) else 'complex'} |")
    if latest.dependencies:
        lines += ["", "## Lineage", ""]
        for d in latest.dependencies:
            lines.append("- " + ", ".join(f"{k}: {v}" for k, v in sorted(d.items())))
    if latest.preview:
        lines += ["", "## Preview", "", "```json"]
        for row in latest.preview[:5]:
            lines.append(json.dumps(row, default=str, sort_keys=True))
        lines += ["```"]
    return "\n".join(lines) + "\n"
