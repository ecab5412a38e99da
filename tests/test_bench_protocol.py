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
    _load_prev_raw,
    _normalized_from_bench_dict,
    _prev_anchor_from_bench_dict,
    _raw_from_bench_dict,
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
    assert _raw_from_bench_dict({}) == {}
    assert _raw_from_bench_dict({"queries": "oops"}) == {}
    assert _prev_anchor_from_bench_dict({}) is None


# --- r09 raw-primary format (r08 verdict what's-wrong #1) ---


def test_raw_sec_compact_line_roundtrips():
    payload = {
        "queries": {"q": 2.0},
        "queries_kind": "raw_sec",
        "cal": {"nom": 0.12, "b": 0.24, "a": 0.30},
    }
    assert _raw_from_bench_dict(payload) == {"q": 2.0}
    assert _raw_from_bench_dict({"parsed": payload}) == {"q": 2.0}
    # normalized derivation anchor-scales like the pre-r07 raw format
    assert _normalized_from_bench_dict(payload) == {
        "q": 2.0 * CALIB_NOMINAL_SEC / 0.24
    }
    # anchor context = median of the recorded calibration runs
    assert _prev_anchor_from_bench_dict(payload) == 0.27


def test_raw_loader_rejects_normalized_only_lines():
    # the r07/r08 compact lines must NOT be mistaken for raw walls
    payload = {"queries": {"q": 2.0}, "queries_kind": "normalized_sec"}
    assert _raw_from_bench_dict(payload) == {}


def test_raw_loader_accepts_detail_shape():
    payload = {
        "queries": {"q": 9.9},
        "queries_normalized": {"q": 1.5},
        "calibration": {"before_sec": 0.2, "after_sec": 0.3},
    }
    assert _raw_from_bench_dict(payload) == {"q": 9.9}
    assert _prev_anchor_from_bench_dict(payload) == 0.25


def test_load_prev_raw_recovers_from_committed_detail():
    # the newest recorded round file (r08) is normalized-only: raw must
    # come back via the BENCH_DETAIL.json committed at that round's
    # commit, not the (possibly locally overwritten) working-tree file
    raw, anchor = _load_prev_raw()
    assert raw, "previous-round raw walls must be recoverable"
    assert all(isinstance(v, float) and v >= 0 for v in raw.values())
    assert anchor is None or anchor > 0
    # raw walls differ from the normalized series of the same round
    norm = _load_prev_bench()
    common = set(raw) & set(norm)
    assert common
    assert any(abs(raw[k] - norm[k]) > 1e-9 for k in common)
