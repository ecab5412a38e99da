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
