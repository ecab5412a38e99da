"""The examples/ scripts must stay runnable — each executes end-to-end
as a subprocess against the smallest fixture (they assert their own
invariants internally)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str) -> None:
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_corpus_curation_example():
    _run("corpus_curation.py")


def test_journey_analytics_example():
    _run("journey_analytics.py")


def test_release_review_example():
    _run("release_review.py")


def test_warehouse_layout_example():
    _run("warehouse_layout.py")


def test_hybrid_search_example():
    _run("hybrid_search.py")


def test_incremental_indexes_example():
    _run("incremental_indexes.py")


def test_publish_gate_example():
    _run("publish_gate.py")
