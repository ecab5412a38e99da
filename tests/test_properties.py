"""Property-based tests (hypothesis) for the pure-Python edges — mirrors the
reference's use of hypothesis at the edges (SURVEY.md §5: async utils, path
handling), applied to our glob translation, brace expansion, and semver."""

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datachain_spark.catalog.metastore import (
    bump_version,
    matches_spec,
    parse_version,
)
from datachain_spark.columns import brace_expand, glob_to_regex, path_glob_to_regex

# -- glob translation --------------------------------------------------------

plain_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=0, max_size=12,
)


@given(plain_text)
def test_glob_literal_matches_itself(s):
    assert re.fullmatch(glob_to_regex(s), s)


@given(plain_text, plain_text)
def test_glob_star_prefix_suffix(prefix, suffix):
    pat = glob_to_regex(prefix + "*" + suffix)
    assert re.fullmatch(pat, prefix + "anything here" + suffix)
    assert re.fullmatch(pat, prefix + suffix)


@given(plain_text)
def test_glob_agrees_with_fnmatch_on_star_q(s):
    # for patterns without classes/braces, our translation must agree with
    # fnmatch (case-sensitive)
    for pat in [s + "*", "*" + s, s + "?x", "*"]:
        ours = bool(re.fullmatch(glob_to_regex(pat), s + "zx"))
        theirs = fnmatch.fnmatchcase(s + "zx", pat)
        assert ours == theirs, (pat, s)


@given(plain_text)
def test_path_glob_star_stops_at_separator(s):
    pat = path_glob_to_regex("*")
    assert not re.fullmatch(pat, s + "/x")
    assert re.fullmatch(path_glob_to_regex("**"), s + "/x/y")


@given(st.integers(0, 20), st.integers(0, 20))
def test_brace_numeric_range(lo, hi):
    if lo > hi:
        return
    out = brace_expand(f"f{{{lo}..{hi}}}.txt")
    assert len(out) == hi - lo + 1
    assert out[0] == f"f{lo}.txt" and out[-1] == f"f{hi}.txt"


@given(st.lists(plain_text.filter(bool), min_size=1, max_size=4))
def test_brace_alternation_count(alts):
    out = brace_expand("x{" + ",".join(alts) + "}y")
    assert out == [f"x{a}y" for a in alts]


# -- semver ------------------------------------------------------------------

versions = st.tuples(st.integers(0, 99), st.integers(0, 99), st.integers(0, 99))


@given(versions)
def test_parse_roundtrip(v):
    s = f"{v[0]}.{v[1]}.{v[2]}"
    assert parse_version(s) == v


@given(versions)
def test_bump_monotonic(v):
    s = f"{v[0]}.{v[1]}.{v[2]}"
    for part in ("patch", "minor", "major"):
        assert parse_version(bump_version(s, part)) > v


@given(versions)
def test_spec_self_match(v):
    s = f"{v[0]}.{v[1]}.{v[2]}"
    assert matches_spec(s, f"=={s}")
    assert matches_spec(s, f">={s}")
    assert matches_spec(s, f"<={s}")
    assert not matches_spec(s, f">{s}")
    assert not matches_spec(s, f"<{s}")


@given(versions, versions)
def test_spec_ordering_consistent(a, b):
    sa = f"{a[0]}.{a[1]}.{a[2]}"
    sb = f"{b[0]}.{b[1]}.{b[2]}"
    assert matches_spec(sa, f">={sb}") == (a >= b)
    assert matches_spec(sa, f"<{sb}") == (a < b)


def test_segment_dedup_idempotent(session):
    """Applying segment_dedup to its own output changes nothing — every
    surviving segment is already globally unique."""
    import datachain_spark as dc
    from datachain_spark.ops.text import segment_dedup

    texts = ["x y\n\nshared", "shared\n\nz", "x y\n\nw", "only here"]
    ch = dc.read_values(session=session, doc_id=list(range(len(texts))), text=texts)
    once = segment_dedup(ch.df, "doc_id")
    twice = segment_dedup(once, "doc_id")
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b


def test_decontaminate_is_partition_of_corpus(session):
    """keep + flagged partitions the corpus exactly."""
    import datachain_spark as dc
    from datachain_spark.ops.dedup import decontaminate

    docs = dc.read_parquet("/root/testdata/sf0.001/documents.parquet", session=session)
    corpus = docs.df.filter("doc_id >= 3 and doc_id < 60")
    probes = docs.df.filter("doc_id < 3")
    kept = decontaminate(corpus, probes, "doc_id", ngram=5)
    flagged = decontaminate(corpus, probes, "doc_id", ngram=5, keep_contaminated=True)
    nk, nf, n = kept.count(), flagged.count(), corpus.count()
    assert nk + nf == n
    overlap = kept.select("doc_id").intersect(flagged.select("doc_id")).count()
    assert overlap == 0


# -- bbox conversion properties (model/utils.py) ---------------------------

_img = st.tuples(st.integers(16, 4096), st.integers(16, 4096))


@given(
    st.tuples(st.floats(0.0, 0.49), st.floats(0.0, 0.49),
              st.floats(0.51, 1.0), st.floats(0.51, 1.0)),
    _img,
)
def test_bbox_roundtrips_through_every_format(alb, img):
    from datachain_spark.model.utils import convert_bbox

    alb = [round(v, 4) for v in alb]
    for via in ("coco", "voc", "yolo"):
        there = convert_bbox(alb, list(img), "albumentations", via)
        back = convert_bbox(there, list(img), via, "albumentations")
        # 4-decimal rounding at each hop bounds drift to 1e-3 of normalized space
        assert all(abs(a - b) <= 2e-3 for a, b in zip(alb, back)), (via, alb, back)


@given(_img)
def test_bbox_identity_conversion(img):
    from datachain_spark.model.utils import convert_bbox

    voc = [1, 2, img[0] - 1, img[1] - 1]
    assert convert_bbox(voc, list(img), "voc", "voc") == [float(v) for v in voc]


# -- rebase_path properties (sources/files.py) -----------------------------

_seg = st.text(alphabet="abcdefgh123", min_size=1, max_size=8)


@given(st.lists(_seg, min_size=2, max_size=4), _seg, _seg)
def test_rebase_path_swaps_base_and_keeps_tail(parts, base, ext):
    from datachain_spark.sources.files import rebase_path

    src = "/".join([base, *parts]) + ".txt"
    out = rebase_path(src, base, "/new", extension=ext)
    assert out.startswith("/new/")
    assert out.endswith(f".{ext}")
    assert "/".join(parts[:-1]) in out or len(parts) == 1


# -- z-order interleave (pure bit math) --------------------------------------
def _py_interleave(qs, bits):
    n = len(qs)
    key = 0
    for i in range(bits):
        for j, q in enumerate(qs):
            key |= ((q >> i) & 1) << (i * n + j)
    return key


def _py_deinterleave(key, n, bits):
    qs = [0] * n
    for i in range(bits):
        for j in range(n):
            qs[j] |= ((key >> (i * n + j)) & 1) << i
    return qs


@given(
    st.lists(st.integers(0, 255), min_size=1, max_size=7),
    st.integers(1, 8),
)
def test_zorder_interleave_bijective(qs, bits):
    """Interleave must be invertible (no information loss below the bit
    budget) and bounded by n*bits key bits."""
    qs = [q & ((1 << bits) - 1) for q in qs]
    key = _py_interleave(qs, bits)
    assert 0 <= key < 1 << (len(qs) * bits)
    assert _py_deinterleave(key, len(qs), bits) == qs


@given(
    st.lists(st.integers(0, 254), min_size=2, max_size=4),
    st.integers(0, 3),
)
def test_zorder_key_monotone_per_dimension(qs, dim_idx):
    """Incrementing ONE quantized coordinate (others fixed) must strictly
    increase the Morton key — the property that makes per-file key ranges
    translate into per-dimension min/max bounds."""
    dim_idx %= len(qs)
    bumped = list(qs)
    bumped[dim_idx] += 1
    assert _py_interleave(bumped, 8) > _py_interleave(qs, 8)


# -- temperature mixture weights ---------------------------------------------
from datachain_spark.ops.packing import temperature_weights  # noqa: E402

sizes_strategy = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=3),
    st.integers(1, 10**7),
    min_size=1,
    max_size=6,
)


@given(sizes_strategy, st.floats(0.1, 50.0))
def test_temperature_expected_total_invariant(sizes, t):
    """sum(n_i * w_i) == pooled total for every temperature — the mixture
    never silently grows or shrinks the corpus in expectation."""
    w = temperature_weights(sizes, t)
    total = sum(sizes.values())
    assert abs(sum(sizes[k] * w[k] for k in sizes) - total) <= 1e-6 * total


@given(sizes_strategy)
def test_temperature_flattens_monotonically(sizes):
    """Raising T must not increase the LARGEST source's share and must not
    decrease the SMALLEST source's share (flattening toward uniform)."""
    if len(sizes) < 2:
        return
    total = sum(sizes.values())
    big = max(sizes, key=lambda k: sizes[k])
    small = min(sizes, key=lambda k: sizes[k])
    shares = []
    for t in (1.0, 2.0, 8.0, 64.0):
        w = temperature_weights(sizes, t)
        shares.append(
            (sizes[big] * w[big] / total, sizes[small] * w[small] / total)
        )
    for (b1, s1), (b2, s2) in zip(shares, shares[1:]):
        assert b2 <= b1 + 1e-12
        assert s2 >= s1 - 1e-12


@given(sizes_strategy, st.floats(0.5, 20.0))
def test_temperature_t1_neutral_and_scaling(sizes, t):
    w1 = temperature_weights(sizes, 1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in w1.values())
    half = temperature_weights(sizes, t, total_rows=sum(sizes.values()) // 2 or 1)
    full = temperature_weights(sizes, t)
    ratio = (sum(sizes.values()) // 2 or 1) / sum(sizes.values())
    for k in sizes:
        assert abs(half[k] - full[k] * ratio) < 1e-9 * max(1.0, full[k])
