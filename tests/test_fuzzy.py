"""Edit-distance similarity join (ops/fuzzy) — known distances, the
completeness differential vs the quadratic cross-join truth (the blocking
must not lose a single qualifying pair), path-split edges (short/long
strings), self-join dedup pairs, and the no-cross-join plan guard."""

import itertools

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import fuzzy
from datachain_spark.plans import join_strategies


def _df(session, rows, side="a"):
    return session.spark.createDataFrame(rows, f"{side}_id long, text string")


def _lev(a, b):
    # textbook DP reference
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j - 1] + 1, dp[j] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_known_pairs_and_distances(session):
    left = _df(session, [(1, "kitten"), (2, "flaw"), (3, "spark")], "a")
    right = _df(session, [(10, "sitting"), (11, "lawn"), (12, "sparks"),
                          (13, "zzzzz")], "b")
    out = {(r["a_id"], r["b_id"]): r["distance"] for r in
           fuzzy.edit_distance_join(left, right, "a_id", "b_id",
                                    max_distance=3).collect()}
    assert out[(1, 10)] == 3          # kitten -> sitting
    assert out[(2, 11)] == 2          # flaw -> lawn
    assert out[(3, 12)] == 1          # spark -> sparks
    assert (3, 13) not in out


def test_completeness_vs_quadratic_truth(session):
    """Every pair the cross join finds, the blocked join must find —
    across the short/long path boundary and both k values."""
    words = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "banana", "bananas",
        "bandana", "spark", "sparks", "shark", "sharp", "share", "sharé",
        "the quick fox", "the quick box", "a quick fox", "thequickfox",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = _df(session, rows, "a")
    right = _df(session, [(i + 100, w) for i, w in enumerate(words)], "b")
    for k in (1, 2, 3):
        pairs = fuzzy.edit_distance_join(df, right, "a_id", "b_id",
                                         max_distance=k, skip_blank=False)
        got = {(r["a_id"], r["b_id"]): r["distance"] for r in pairs.collect()}
        want = {}
        for (i, wa), (j, wb) in itertools.product(
            enumerate(words), enumerate(words)
        ):
            d = _lev(wa.lower(), wb.lower())
            if d <= k:
                want[(i, j + 100)] = d
        assert got == want, f"k={k}: missing {set(want) - set(got)}, extra {set(got) - set(want)}"


def test_fuzzy_dedup_pairs_self_join(session):
    df = _df(session, [(1, "Banana"), (2, "banana"), (3, "bananna"),
                       (4, "orange")], "a")
    out = {(r["id_a"], r["id_b"]): r["distance"] for r in
           fuzzy.fuzzy_dedup_pairs(df, "a_id", max_distance=1).collect()}
    # lowercase fold: Banana==banana (d=0); bananna is 1 edit from both
    assert out == {(1, 2): 0, (1, 3): 1, (2, 3): 1}
    # case-sensitive: Banana->banana is 1 edit
    out_cs = {(r["id_a"], r["id_b"]): r["distance"] for r in
              fuzzy.fuzzy_dedup_pairs(df, "a_id", max_distance=1,
                                      lowercase=False).collect()}
    assert out_cs[(1, 2)] == 1


def test_nulls_empty_and_validation(session):
    left = session.spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "a_id long, text string"
    )
    right = session.spark.createDataFrame(
        [(10, ""), (11, "b")], "b_id long, text string"
    )
    # default: blank/NULL rows excluded (they are all mutual near-dups —
    # a quadratic trap on real corpora)
    out = {(r["a_id"], r["b_id"]): r["distance"] for r in
           fuzzy.edit_distance_join(left, right, "a_id", "b_id",
                                    max_distance=1).collect()}
    assert out == {(3, 11): 1}
    # opt back in: NULL folds to "" (matches empty, 1 edit from "b")
    out_all = {(r["a_id"], r["b_id"]): r["distance"] for r in
               fuzzy.edit_distance_join(left, right, "a_id", "b_id",
                                        max_distance=1,
                                        skip_blank=False).collect()}
    assert out_all == {(1, 10): 0, (1, 11): 1, (2, 10): 0, (2, 11): 1,
                       (3, 11): 1}
    with pytest.raises(ValueError):
        fuzzy.edit_distance_join(left, right, "a_id", "b_id", max_distance=-1)
    with pytest.raises(ValueError):
        fuzzy.edit_distance_join(left, right, "a_id", "b_id", q=0)


def test_no_cross_join_in_plan(session):
    df = _df(session, [(i, f"word{i}") for i in range(20)], "a")
    out = fuzzy.edit_distance_join(
        df, _df(session, [(i, f"word{i}") for i in range(20)], "b"),
        "a_id", "b_id", max_distance=2,
    )
    strategies = join_strategies(out)
    assert strategies, "expected joins"
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_fuzzy_fluent_chain_surface(session):
    import datachain_spark as dc

    ch = dc.read_values(
        doc_id=[1, 2, 3], text=["banana", "bananna", "orange"], session=session
    )
    pairs = ch.fuzzy_dedup_pairs("doc_id", max_distance=1)
    assert [(r["id_a"], r["id_b"], r["distance"])
            for r in pairs.df.collect()] == [(1, 2, 1)]


# ---------------------------------------------------------------- entities


def _ent_df(spark):
    rows = [
        (1, "acme corporation", 10.0),
        (2, "acme corporatino", 5.0),   # typo of 1
        (3, "acme corp", 1.0),          # too far from 1/2 (d>2)
        (4, "globex inc", 3.0),
        (5, "globex inc.", 9.0),        # near 4
        (6, "globex  inc", 2.0),        # near 4 and 5
        (7, "initech", 7.0),            # singleton
        (8, None, 0.0),                 # blank -> singleton
    ]
    return spark.createDataFrame(rows, "id long, name string, score double")


def test_resolve_entities_min_id_default(spark):
    df = _ent_df(spark)
    out = {
        r["id"]: r["canonical_id"]
        for r in fuzzy.resolve_entities(df, "id", "name", max_distance=2).collect()
    }
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 3  # not within 2 edits of the acme cluster
    assert out[4] == 4 and out[5] == 4 and out[6] == 4
    assert out[7] == 7 and out[8] == 8  # singletons + blank map to self


def test_resolve_entities_keep_by_best_score(spark):
    df = _ent_df(spark)
    out = {
        r["id"]: r["canonical_id"]
        for r in fuzzy.resolve_entities(
            df, "id", "name", max_distance=2, keep_by="score"
        ).collect()
    }
    assert out[1] == 1 and out[2] == 1       # 10.0 wins the acme cluster
    assert out[4] == 5 and out[5] == 5 and out[6] == 5  # 9.0 wins globex
    assert out[7] == 7


def test_resolve_entities_preserves_all_rows_and_columns(spark):
    df = _ent_df(spark)
    out = fuzzy.resolve_entities(df, "id", "name")
    assert out.count() == df.count()
    assert out.columns == df.columns + ["canonical_id"]


def test_resolve_entities_convergence_audit_raises(spark):
    # a 6-member chain needs 2+ two_hop rounds; max_iters=0 -> partial
    rows = [(i, "x" * 10 + chr(97 + i), 0.0) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    with pytest.raises(RuntimeError, match="did not converge"):
        fuzzy.resolve_entities(df, "id", "name", max_distance=2, cc_max_iters=0)


def test_resolve_entities_fluent(spark):
    import datachain_spark as dc

    ch = dc.DataChain(_ent_df(spark))
    out = ch.resolve_entities("id", "name", keep_by="score")
    n_entities = out.df.select("canonical_id").distinct().count()
    assert n_entities == 5  # {acme12}, {3}, {globex456}, {7}, {8}


def test_preflight_warns_on_gram_skew(session):
    # VERDICT r05 #3: a gram-skewed corpus (every string shares the same
    # grams) must trip the pre-flight candidate estimate BEFORE the join
    # explodes — warn by default, raise under preflight="error".
    rows = [(i, "aaaaaaaaaaaa") for i in range(60)]  # 60*60 gram pairs
    df = _df(session, rows)
    with pytest.warns(UserWarning, match="candidate pairs"):
        fuzzy.fuzzy_dedup_pairs(
            df, "a_id", "text", warn_candidates=1000
        ).count()
    with pytest.raises(ValueError, match="candidate pairs"):
        fuzzy.fuzzy_dedup_pairs(
            df, "a_id", "text", preflight="error", warn_candidates=1000
        ).count()
    with pytest.raises(ValueError, match="off|warn|error"):
        fuzzy.edit_distance_join(df, df, "a_id", "a_id", preflight="bogus")


def test_preflight_quiet_on_normal_corpus(session):
    import warnings

    rows = [(i, f"title number {i}") for i in range(50)]
    df = _df(session, rows)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any UserWarning fails the test
        n = fuzzy.fuzzy_dedup_pairs(df, "a_id", "text").count()
    assert n >= 0


def test_max_postings_documented_recall_tradeoff(session):
    # capping posting lists drops pairs that ONLY meet via heavy grams —
    # the documented trade; pairs sharing any rare gram must survive.
    rows = [(i, "zzzzzzzzzzzz") for i in range(30)] + [
        (100, "unique title abc"),
        (101, "unique title abd"),
    ]
    df = _df(session, rows)
    full = fuzzy.fuzzy_dedup_pairs(df, "a_id", "text", preflight="off")
    capped = fuzzy.fuzzy_dedup_pairs(
        df, "a_id", "text", preflight="off", max_postings=5
    )
    full_pairs = {(r["id_a"], r["id_b"]) for r in full.collect()}
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in capped_pairs          # rare-gram pair survives
    assert capped_pairs <= full_pairs          # cap only DROPS pairs
    assert len(capped_pairs) < len(full_pairs)  # heavy-gram pairs gone


def test_cluster_size_report(spark):
    from datachain_spark.ops.dedup import cluster_size_report

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (9, 9)],
        "id long, component long",
    )
    got = {r["cluster_size"]: (r["n_clusters"], r["n_members"])
           for r in cluster_size_report(comps).collect()}
    assert got == {3: (1, 3), 2: (1, 2), 1: (1, 1)}
