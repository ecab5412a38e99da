"""The examples/ scripts must stay runnable — each executes end-to-end
as a subprocess against the smallest fixture (they assert their own
invariants internally).

Wall-clock: each script boots its own JVM (~15 s) and then runs minutes
of latency-bound Spark jobs. Running the eight sequentially, after the
rest of the suite, serialized all of that. Instead the subprocesses are
launched CONCURRENTLY as soon as pytest finishes collection (see
conftest.pytest_collection_finish), so they overlap the main session's
equally latency-bound tests; each test here just asserts its own
script's outcome. Same scripts, same assertions, near-zero marginal
wall (r11 verdict task 1: the driver's pytest run must finish)."""

import atexit
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    "corpus_curation.py",
    "journey_analytics.py",
    "release_review.py",
    "warehouse_layout.py",
    "hybrid_search.py",
    "incremental_indexes.py",
    "publish_gate.py",
    "cascade_refresh.py",
]

_PROCS: dict = {}


def _reap() -> None:
    # belt: if pytest bails early (-x), don't leave orphan JVMs running
    for proc in _PROCS.values():
        if proc.poll() is None:
            proc.kill()


atexit.register(_reap)


def start_example_procs() -> None:
    """Launch every example script concurrently (idempotent). 8 task
    slots per JVM: the smallest fixture is pure scheduling latency, and
    eight local[32] JVMs would oversubscribe the box 2x anyway."""
    if _PROCS:
        return
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    for script in SCRIPTS:
        _PROCS[script] = subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "examples", script),
             "/root/testdata/sf0.001"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )


@pytest.fixture(scope="module")
def example_results():
    start_example_procs()  # no-op when conftest already launched them
    results = {}
    for script, proc in _PROCS.items():
        try:
            out, err = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, err = proc.communicate()
            results[script] = (124, out, err + "\n[timeout after 600s]")
            continue
        results[script] = (proc.returncode, out, err)
    return results


def _check(results, script: str) -> None:
    rc, _out, err = results[script]
    assert rc == 0, err[-2000:]


def test_corpus_curation_example(example_results):
    _check(example_results, "corpus_curation.py")


def test_journey_analytics_example(example_results):
    _check(example_results, "journey_analytics.py")


def test_release_review_example(example_results):
    _check(example_results, "release_review.py")


def test_warehouse_layout_example(example_results):
    _check(example_results, "warehouse_layout.py")


def test_hybrid_search_example(example_results):
    _check(example_results, "hybrid_search.py")


def test_incremental_indexes_example(example_results):
    _check(example_results, "incremental_indexes.py")


def test_publish_gate_example(example_results):
    _check(example_results, "publish_gate.py")


def test_cascade_refresh_example(example_results):
    _check(example_results, "cascade_refresh.py")
