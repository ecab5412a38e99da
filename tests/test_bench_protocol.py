"""Bench-protocol regression tests (no Spark session needed).

r07 ADVICE (medium): _load_prev_bench never found previous-round data —
the driver's recorded BENCH_r{N}.json nests the bench line under a
top-level "parsed" key, and the compact stdout line stores
ALREADY-normalized values under "queries" (queries_kind ==
"normalized_sec"), which the old fallback would have re-scaled by
nominal/min(anchor), corrupting the 1.25x ghost-regression comparison.
These tests feed the REAL recorded r07 file (and synthetic variants of
every historical format) through the loader.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import (  # noqa: E402
    CALIB_NOMINAL_SEC,
    _load_prev_bench,
    _normalized_from_bench_dict,
)


def test_real_recorded_r07_file_parses():
    path = os.path.join(ROOT, "BENCH_r07.json")
    with open(path) as f:
        data = json.load(f)
    got = _normalized_from_bench_dict(data)
    assert got, "recorded driver file must yield per-query values"
    # values must be the recorded normalized walls VERBATIM — no rescale
    parsed = data["parsed"]
    assert parsed["queries_kind"] == "normalized_sec"
    for k, v in parsed["queries"].items():
        assert got[k] == float(v)


def test_load_prev_bench_finds_newest_round():
    got = _load_prev_bench()
    assert got, "_load_prev_bench must see the recorded BENCH_r*.json"
    assert all(isinstance(v, float) and v >= 0 for v in got.values())


def test_normalized_kind_is_not_rescaled():
    payload = {
        "queries": {"q": 2.0},
        "queries_kind": "normalized_sec",
        "calibration": {"before_sec": 0.06, "after_sec": 0.06},
    }
    # a naive anchor rescale would double this (nominal 0.12 / 0.06)
    assert _normalized_from_bench_dict(payload) == {"q": 2.0}
    # nested under "parsed" (driver recording shape)
    assert _normalized_from_bench_dict({"parsed": payload}) == {"q": 2.0}


def test_detail_format_prefers_queries_normalized():
    payload = {
        "queries": {"q": 9.9},
        "queries_normalized": {"q": 1.5},
    }
    assert _normalized_from_bench_dict(payload) == {"q": 1.5}


def test_pre_r07_raw_format_is_anchor_scaled():
    payload = {
        "queries": {"q": 2.0},
        "calibration": {"before_sec": 0.24, "after_sec": 0.30},
    }
    scale = CALIB_NOMINAL_SEC / 0.24
    assert _normalized_from_bench_dict(payload) == {"q": 2.0 * scale}


def test_garbage_is_empty():
    assert _normalized_from_bench_dict({}) == {}
    assert _normalized_from_bench_dict({"parsed": None}) == {}
    assert _normalized_from_bench_dict({"queries": "oops"}) == {}
