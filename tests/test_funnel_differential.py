"""Hypothesis differentials: funnel vs a from-scratch Python reference of
the k-pass min-with->= formulation (tie-heavy event streams), and
calibrate_scores vs a Python percent-rank reference."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datachain_spark.ops.selection import calibrate_scores
from datachain_spark.ops.timeseries import funnel

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny timestamp domain forces ties; 3 entities; events from a 4-letter
# alphabet where d is a distractor
events = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2", "u3"]),
        st.integers(min_value=0, max_value=5),
        st.sampled_from(["a", "b", "c", "d"]),
    ),
    min_size=1,
    max_size=25,
)

STEPS = ["a", "b", "c"]


def _py_funnel(rows):
    # the independent k-pass construction: t_i = min{ep : ev = step_i,
    # ep >= t_{i-1}}
    out = {}
    by_u = {}
    for u, ep, ev in rows:
        if ev in STEPS:
            by_u.setdefault(u, []).append((ep, ev))
    for u, evs in by_u.items():
        ts = []
        prev = None
        for step in STEPS:
            cand = [ep for ep, ev in evs
                    if ev == step and (prev is None or ep >= prev)]
            cur = min(cand) if cand else None
            ts.append(cur)
            if cur is None:
                break
            prev = cur
        ts += [None] * (len(STEPS) - len(ts))
        reached = sum(1 for t in ts if t is not None)
        out[u] = (*ts, reached)
    return out


@SETTINGS
@given(events)
def test_funnel_matches_python_reference(spark, rows):
    import datetime

    data = [
        (u, datetime.datetime.fromtimestamp(ep, tz=datetime.timezone.utc), ev)
        for u, ep, ev in rows
    ]
    df = spark.createDataFrame(data, "u string, ts timestamp, ev string")
    got = {
        r["u"]: (r["step1_ts"], r["step2_ts"], r["step3_ts"], r["steps_reached"])
        for r in funnel(df, "u", "ts", "ev", STEPS).collect()
    }
    assert got == _py_funnel(rows)


scores = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", None]),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=1,
    max_size=20,
)


def _py_pct(rows):
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, s in rows:
        by_g[g].append(s)
    out = defaultdict(list)
    for g, vals in by_g.items():
        nn = sorted(v for v in vals if v is not None)
        for s in vals:
            if s is None:
                out[(g, s)].append(None)
            elif len(nn) <= 1:
                out[(g, s)].append(0.0)
            else:
                rank = nn.index(s)  # min rank among ties, 0-based
                out[(g, s)].append(rank / (len(nn) - 1))
    return out


@SETTINGS
@given(scores)
def test_calibrate_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(g, float(s) if s is not None else None) for g, s in rows],
        "g string, s double",
    )
    got = {}
    for r in calibrate_scores(df, "s", "g").collect():
        got.setdefault((r["g"], None if r["s"] is None else int(r["s"])),
                       []).append(r["score_pct"])
    expect = _py_pct(rows)
    assert set(got) == set(expect)
    for k in expect:
        g_sorted = sorted(x if x is not None else -9 for x in got[k])
        e_sorted = sorted(x if x is not None else -9 for x in expect[k])
        assert len(g_sorted) == len(e_sorted)
        for a, b in zip(g_sorted, e_sorted):
            assert (a == -9 and b == -9) or math.isclose(a, b, abs_tol=1e-12)
