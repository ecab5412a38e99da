"""Plan-regression tests: the 100-TB "is this the plan I'd want" check,
automated via datachain_spark.plans introspection. Guards against silent
plan regressions (a lost pushdown, a broadcast turning into a shuffle)."""

import os

import pytest

import __spark_entry__ as entrymod
from datachain_spark.plans import explain_summary, join_strategies, pushed_filters, scan_read_schemas, shuffle_count

Q = entrymod.queries()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = Q["q1_pricing_summary"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), f"shipdate filter not pushed: {pf}"
    schemas = scan_read_schemas(df)
    assert schemas and all("l_orderkey" not in s for s in schemas), (
        "scan reads unneeded columns"
    )
    # partial + final aggregate = 2 shuffle max (agg + output ordering)
    assert shuffle_count(df) <= 2


def test_q3_broadcasts_small_sides(spark, sf_dir):
    df = Q["q3_shipping_priority"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    pf = pushed_filters(df)
    assert any("c_mktsegment" in f for f in pf)
    assert any("l_shipdate" in f for f in pf)


def test_similarity_topk_is_take_ordered(spark, sf_dir):
    df = Q["similarity_topk"](spark, sf_dir)
    assert shuffle_count(df) == 0  # per-partition heap + driver merge


def test_filter_query_zero_shuffle(spark, sf_dir):
    df = Q["filter_glob_in"](spark, sf_dir)
    summary = explain_summary(df)
    assert summary["shuffles"] <= 1  # only the output sort
    assert any("p_retailprice" in f for f in summary["pushed_filters"])


def test_cube_rollup_extras(session):
    import datachain_spark as dc
    from datachain_spark import func

    ch = dc.read_values(session=session, a=["x", "x", "y"], b=["p", "q", "p"], v=[1, 2, 3])
    cube = ch.group_by(partition_by=["a", "b"], kind="cube", n=func.count())
    assert cube.count() == 8  # 3 observed (a,b) pairs + 2 a-subtotals + 2 b-subtotals + 1 grand
    roll = ch.group_by(partition_by=["a", "b"], kind="rollup", total=func.sum(dc.C.v))
    recs = {(r["a"], r["b"]): r["total"] for r in roll.to_records()}
    assert recs[(None, None)] == 6  # grand total
    assert recs[("x", None)] == 3


def test_pivot(session):
    import datachain_spark as dc
    from datachain_spark import func

    ch = dc.read_values(session=session, k=["x", "x", "y"], s=["p", "q", "p"], v=[1, 2, 3])
    wide = ch.pivot("s", ["p", "q"], partition_by="k", t=func.sum(dc.C.v))
    recs = {r["k"]: (r["p"], r["q"]) for r in wide.to_records()}
    assert recs == {"x": (1, 2), "y": (3, None)}
    # multiple aggregates -> {value}_{alias} columns
    wide2 = ch.pivot("s", ["p"], partition_by="k",
                     t=func.sum(dc.C.v), n=func.count())
    assert {"p_t", "p_n"} <= set(wide2.columns)
    with pytest.raises(ValueError):
        ch.pivot("s", ["p"], partition_by="k")


def test_approx_aggregates(session):
    import datachain_spark as dc
    from datachain_spark import func

    ch = dc.read_values(session=session, x=list(range(1000)), g=["a"] * 1000)
    out = ch.group_by(
        partition_by="g",
        nd=func.approx_count_distinct(dc.C.x),
        p50=func.approx_percentile(dc.C.x, 0.5),
        sd=func.stddev(dc.C.x),
        cd=func.count_distinct(dc.C.x),
    ).to_records()[0]
    assert 900 <= out["nd"] <= 1100
    assert 450 <= out["p50"] <= 550
    assert out["cd"] == 1000
    assert out["sd"] > 0


def test_sharding_family_zero_shuffle(session):
    """SCALE.md claim: chunk/sample_by/train_test_split are pure filters over
    a per-row hash — no Exchange in the plan, for both hash families."""
    import datachain_spark as dc

    ch = dc.read_values(
        session=session, k=list(range(50)), s=["ab"] * 50, v=[1.0] * 50
    )
    for fam in ("xxhash64", "md5"):
        assert shuffle_count(ch.chunk(0, 4, key=["k"], hash_fn=fam).df) == 0, fam
        assert shuffle_count(
            ch.sample_by("s", {"ab": 0.5}, key=["k"], hash_fn=fam).df
        ) == 0, fam
        train, test = ch.train_test_split([0.8, 0.2], key=["k"], hash_fn=fam)
        assert shuffle_count(train.df) == 0 and shuffle_count(test.df) == 0, fam


def test_parse_tabular_directory_path_keeps_pushdown(session, tmp_path):
    """The r04 parse_tabular fast path (directory + pathGlobFilter) must
    yield a scan that still accepts predicate pushdown and column pruning —
    it's a real FileScan, not an opaque path list."""
    import pyspark.sql.functions as F

    import datachain_spark as dc

    src = dc.read_values(
        session=session, k=list(range(100)), v=[float(i) for i in range(100)],
        s=["x"] * 100,
    )
    d = str(tmp_path / "pq")
    src.to_parquet(d)
    listing = dc.read_storage(f"{d}/*.parquet", session=session, update=True)
    parsed = listing.parse_tabular(format="parquet", source=False)
    out = parsed.filter(dc.C.k > 90).select("k", "v").df
    pf = pushed_filters(out)
    assert any("k" in f for f in pf), f"filter not pushed through dir scan: {pf}"
    schemas = scan_read_schemas(out)
    assert schemas and all("s:string" not in s for s in schemas), (
        f"column pruning lost: {schemas}"
    )


def test_pack_sequences_single_shuffle(spark, sf_dir):
    from datachain_spark.ops import packing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = packing.pack_sequences(docs, max_tokens=256, num_shards=4)
    # the hash-shard exchange for the window is the ONLY shuffle
    assert shuffle_count(out) == 1


def test_interleave_zero_shuffle(spark, sf_dir):
    from datachain_spark.ops import packing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = packing.interleave_datasets(
        {"a": docs, "b": docs}, {"a": 1.5, "b": 0.25}, key=["doc_id"]
    )
    # filters + union ALL: no exchange anywhere
    assert shuffle_count(out) == 0


def test_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    # Catalyst must derive per-side predicates from the OR-of-ANDs and push
    # them into BOTH parquet scans (lineitem quantity bands, part brand/size)
    df = Q["q19_disjunctive"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf
    assert any("p_brand" in f and "p_size" in f for f in pf), pf
    assert all(j == "BroadcastHashJoin" for j in join_strategies(df))


def test_q2_restricts_before_aggregation(spark, sf_dir):
    # the (part,supplier) cost agg must run AFTER the part-type and
    # EUROPE-supplier semi-restrictions (Catalyst can't push a join below a
    # groupBy, so the query composes them explicitly), and the per-part min
    # is a window — not an agg + self-join recomputing the cost subtree
    df = Q["q2_min_cost_supplier"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("p_type" in f for f in pf), pf
    assert any("r_name" in f for f in pf), pf
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_q17_q21_window_decorrelation_no_recompute(spark, sf_dir):
    # correlated AVG (q17) / EXISTS+NOT-EXISTS (q21) decorrelate into window
    # functions: one shuffle on the correlation key, zero sort-merge joins
    # (an agg + re-join decorrelation recomputes the shared subtree)
    for name in ("q17_small_quantity", "q21_waiting_suppliers"):
        df = Q[name](spark, sf_dir)
        assert "SortMergeJoin" not in join_strategies(df), name
        assert shuffle_count(df) <= 4, name


def test_q11_scalar_stays_in_plan(spark, sf_dir):
    # the global-total threshold is a broadcast 1-row cross join, not a
    # driver collect: the plan must contain a BroadcastNestedLoopJoin and
    # push the region filter to the scan
    df = Q["q11_important_stock"](spark, sf_dir)
    assert "BroadcastNestedLoopJoin" in join_strategies(df)
    assert any("r_name" in f for f in pushed_filters(df))


def test_q18_having_in_single_shuffle(spark, sf_dir):
    # big-order HAVING feeds broadcast joins: only the groupBy shuffles
    df = Q["q18_large_volume"](spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert "SortMergeJoin" not in join_strategies(df)


def test_q8_two_role_star_broadcasts(spark, sf_dir):
    # two nation roles (customer region restriction / supplier share) ride
    # the same star: every dim join is a broadcast onto the lineitem spine,
    # and the selective predicates reach the scans
    df = Q["q8_market_share"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    pf = pushed_filters(df)
    assert any("p_type" in f for f in pf), pf
    assert any("o_orderdate" in f for f in pf), pf
    assert any("r_name" in f for f in pf), pf


def test_q9_profit_pushdown_and_pruning(spark, sf_dir):
    # the %gear% restriction must reach the part scan (StringContains), the
    # lineitem scan must be pruned to the 5 join/measure columns, and the
    # only non-broadcast exchange is the (nation, year) aggregation
    df = Q["q9_product_profit"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("p_name" in f for f in pf), pf
    schemas = scan_read_schemas(df)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li and all("l_shipdate" not in s and "l_returnflag" not in s for s in li), li
    assert shuffle_count(df) <= 2  # agg + output ordering


def test_q13_outer_join_keeps_zero_count_customers(spark, sf_dir):
    # the priority predicate is a JOIN condition, not a WHERE: the plan must
    # keep the outer join (customers with only urgent orders survive as 0s);
    # both aggregation levels stay partial-aggregated hash aggs
    from datachain_spark.plans.inspect import _formatted

    df = Q["q13_customer_distribution"](spark, sf_dir)
    plan = _formatted(df)
    assert "LeftOuter" in plan or "RightOuter" in plan, plan[:2000]
    assert shuffle_count(df) <= 4
    assert "SortMergeJoin" not in join_strategies(df)


def test_q15_scalar_max_stays_in_plan(spark, sf_dir):
    # the revenue view's MAX stays in-plan as a broadcast (Catalyst rewrites
    # the 1-row cross join + equality filter into a broadcast equi-join on
    # the normalized double — no driver collect, no shuffle for the match),
    # and the 3-month ship window reaches the lineitem scan
    df = Q["q15_top_supplier"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j.startswith("Broadcast") for j in joins), joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cross" in plan or "BroadcastNestedLoopJoin" in plan, joins
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf


def test_q20_semi_join_chain_no_duplication(spark, sf_dir):
    # the nested-IN chain must stay semi-joins (LeftSemi) so lineitem rows
    # are never duplicated, with part-name/ship-window/region predicates
    # pushed to their scans
    from datachain_spark.plans.inspect import _formatted

    df = Q["q20_excess_suppliers"](spark, sf_dir)
    assert "LeftSemi" in _formatted(df)
    pf = pushed_filters(df)
    assert any("p_name" in f for f in pf), pf
    assert any("l_shipdate" in f for f in pf), pf
    assert any("r_name" in f for f in pf), pf
    assert "SortMergeJoin" not in join_strategies(df)


def test_bm25_one_shuffle_broadcast_stats(spark, sf_dir):
    # the corpus-wide (N, avgdl, df) statistics enter the plan as a 1-row
    # broadcast; the corpus side itself never shuffles or explodes
    from datachain_spark.ops import retrieval
    from datachain_spark.plans.inspect import _formatted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = retrieval.bm25_score(docs, "spark window merge", "doc_id")
    assert shuffle_count(df) == 1  # only the stats aggregate
    plan = _formatted(df)
    assert "BroadcastExchange" in plan
    assert "Generate" not in plan  # no explode anywhere


def test_dsir_histograms_broadcast_back(spark, sf_dir):
    # the bucket histograms and the per-bucket log-ratio table are
    # broadcast-joined back onto the exploded raw grams — the only
    # sort-merge-free shuffles are the two tiny bucket aggs + the per-id agg
    from datachain_spark.ops import selection

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter("doc_id >= 100")
    target = docs.filter("doc_id < 100")
    df = selection.dsir_importance(raw, target, "doc_id", num_buckets=1024)
    assert "SortMergeJoin" not in join_strategies(df)
    assert shuffle_count(df) <= 4  # union-hist agg, totals, per-id agg (+AQE)


def test_spans_dedup_shuffle_shape(spark, sf_dir):
    # every exchange hashes either the doc id (gram window, island window,
    # reassembly) or the 64-bit gram key (first-occurrence rank) — never
    # raw text; no all-pairs joins
    import re

    from datachain_spark.ops import dedup
    from datachain_spark.plans.inspect import _formatted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dedup.remove_duplicate_spans(docs, "doc_id", span_tokens=8)
    plan = _formatted(df)
    keys = re.findall(r"hashpartitioning\(__(\w+)#", plan)
    assert keys and set(keys) <= {"id", "k"}, keys
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_c4_zero_shuffle_projection(spark, sf_dir):
    from datachain_spark.ops import c4

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert shuffle_count(c4.c4_clean(docs, "doc_id", with_signals=True)) == 0


def test_repetition_stats_shuffle_shape(spark, sf_dir):
    # r04 single-pass rewrite: every exchange hashes the doc id (the gram
    # window and final aggs) or (id, word) partial counts — never raw
    # tokens — and the per-id merge is a broadcast join, not a sort-merge
    import re

    from datachain_spark.ops import text
    from datachain_spark.plans.inspect import _formatted

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = text.repetition_stats(docs, "doc_id")
    plan = _formatted(df)
    keys = re.findall(r"Arguments: hashpartitioning\(__(\w+)#", plan)
    assert keys and all(k == "id" for k in keys), keys
    # the (id, word) count shuffle is partial-aggregated upstream: the
    # exchange inputs carry a count/sum column, not bare exploded tokens
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        cols = m.group(1)
        assert ("count" in cols) or ("sum" in cols) or ("__pos" in cols), cols
    assert "SortMergeJoin" not in plan


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    # 5-table star: every dimension chain (region->nation->customer->orders)
    # rides broadcasts onto the lineitem scan — no sort-merge join anywhere,
    # and lineitem's scan is pruned to the 3 needed columns
    df = Q["q5_region_revenue"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    schemas = scan_read_schemas(df)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li and all("l_shipdate" not in s and "l_quantity" not in s for s in li), li


def test_q10_pushdown_and_topk(spark, sf_dir):
    # date-window 4-table join + group-top20: filters reach the scans and
    # the final top-20 is a TakeOrderedAndProject, not a global sort
    from datachain_spark.plans.inspect import _formatted

    df = Q["q10_returned_revenue"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("o_orderdate" in f for f in pf), pf
    assert any("l_returnflag" in f for f in pf), pf
    assert "TakeOrderedAndProject" in _formatted(df)


def test_q5_authentic_pushdown_and_broadcasts(spark, sf_dir):
    # authentic TPC-H Q5: region + date-window predicates reach the scans,
    # every join (incl. the same-nation supplier constraint) is a broadcast
    df = Q["q5_asia_revenue"](spark, sf_dir)
    assert set(join_strategies(df)) == {"BroadcastHashJoin"}
    pf = pushed_filters(df)
    assert any("r_name" in f for f in pf), pf
    assert any("o_orderdate" in f for f in pf), pf


def test_semdedup_shuffle_budget(spark, sf_dir):
    # SemDeDup's SCALE claim: arrow assignment is a pure map stage; the
    # whole survivors plan pays only the cell window + cell self-join +
    # id anti-join (+ the optional cell_col join-back)
    from pyspark.sql import functions as F

    from datachain_spark.ops import semdedup as sd

    emb = entrymod._chain(spark, sf_dir, "embeddings").df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    corpus = emb.filter(F.col("vec_id") >= 8)
    ncents = sd._normalize_centroids(cents)
    # an earlier test (the oracle sweep) may have persisted an identical
    # ranked frame: CacheManager substitution changes the plan shape, so
    # count exchanges on a cache-free plan
    spark.catalog.clearCache()
    ranked = sd._ranked(corpus, "vec_id", "embedding", ncents, "far", "arrow", 32768)
    assert shuffle_count(ranked) == 1  # the cell window only
    out = sd.semdedup(corpus, "vec_id", "embedding", centroids=cents, eps=0.75)
    assert shuffle_count(out) <= 4


def test_zorder_layout_single_range_exchange(spark, sf_dir):
    # Z-order's SCALE claim: the key is pure projection (no extra shuffle);
    # the layout pays exactly the one range exchange any clustered write
    # costs, and it IS a range partitioning (file min/max contiguity)
    from datachain_spark.ops import zorder as z
    from datachain_spark.plans.inspect import _formatted

    orders = entrymod._chain(spark, sf_dir, "orders").df
    bounds = z.zorder_bounds(orders, ["o_custkey", "o_totalprice"])
    keyed = orders.withColumn(
        "k", z.zorder_key(["o_custkey", "o_totalprice"], bounds, 8)
    )
    assert shuffle_count(keyed) == 0
    laid = z.zorder_layout(orders, ["o_custkey", "o_totalprice"], num_partitions=8)
    assert shuffle_count(laid) == 1
    assert "rangepartitioning" in _formatted(laid).lower()


def test_q6_single_scan_zero_joins(spark, sf_dir):
    # Q6 is ONE filtered scan + a global aggregate: every predicate must
    # reach the parquet scan, no join anywhere, one shuffle (the agg)
    df = Q["q6_forecast_revenue"](spark, sf_dir)
    assert join_strategies(df) == []
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf
    assert any("l_discount" in f for f in pf), pf
    assert any("l_quantity" in f for f in pf), pf
    assert shuffle_count(df) <= 1


def test_q4_theta_exists_pushdown(spark, sf_dir):
    # the EXISTS decorrelation joins on the order key with the lateness
    # predicate as a residual condition; the half-year window must reach
    # the orders scan and no nested-loop join may appear
    df = Q["q4_order_priority"](spark, sf_dir)
    assert any("o_orderdate" in f for f in pushed_filters(df))
    assert "BroadcastNestedLoopJoin" not in join_strategies(df)


def test_q7_two_role_nation_broadcasts(spark, sf_dir):
    # both nation roles (supplier / customer side) broadcast onto the
    # lineitem spine along with the other dims; the two-year shipping
    # window reaches the scan
    df = Q["q7_nation_volume"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_q12_shipdate_pushdown(spark, sf_dir):
    # the one-year shipping window must reach the lineitem scan BEFORE the
    # orders join (not filter post-join); the case-sum runs in the single
    # groupBy shuffle
    df = Q["q12_priority_mix"](spark, sf_dir)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    assert "BroadcastNestedLoopJoin" not in join_strategies(df)


def test_q14_promo_broadcast_part(spark, sf_dir):
    # part is the small side: broadcast join, month window pushed to the
    # lineitem scan, single global aggregate
    df = Q["q14_promo_revenue"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_q16_part_restriction_pushdown(spark, sf_dir):
    # the size band and brand exclusion must reach the part scan; the
    # count(DISTINCT suppkey) expands inside the aggregation, not via a
    # self-join
    df = Q["q16_supplier_variety"](spark, sf_dir)
    pf = pushed_filters(df)
    assert any("p_size" in f for f in pf), pf
    assert any("p_brand" in f for f in pf), pf
    assert "SortMergeJoin" not in join_strategies(df)


def test_q22_scalar_and_anti_join_in_plan(spark, sf_dir):
    # the global average balance stays IN-PLAN as a broadcast 1-row cross
    # join (no driver collect) and the no-orders restriction is an anti
    # join, not an exceptAll
    df = Q["q22_idle_balances"](spark, sf_dir)
    joins = join_strategies(df)
    assert "BroadcastNestedLoopJoin" in joins, joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, "expected an anti join for the no-orders restriction"


def test_token_budget_no_single_partition_window(spark, sf_dir):
    # the global cumulative sum must run as the two-pass distributed prefix
    # (range exchange + per-range window + broadcast offset join), never a
    # single-partition global window
    df = Q["token_budget_docs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "global window collapsed to one partition"
    assert "rangepartitioning" in plan, "expected a range exchange for the global order"
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins


def test_apply_changes_broadcasts_keys_base_not_shuffled(spark, sf_dir):
    # the CDC fold must anti-join the base against a BROADCAST of the
    # reduced change keys — a 100-TB snapshot never shuffles to fold in a
    # day's changes
    df = Q["apply_changes_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:800]
    assert "SortMergeJoin" not in plan, "base side shuffled for the anti join"


def test_rolling_stats_single_entity_shuffle(spark, sf_dir):
    # all rolling features + the gap column ride ONE hash exchange on the
    # entity key (the window frames share the partitioning)
    df = Q["rolling_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") <= 1, (
        "rolling features re-shuffled the entity key"
    )


def test_weighted_sample_is_top_k_not_global_sort(spark, sf_dir):
    df = Q["weighted_sample_docs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "A-ES cut fell back to a global sort"


def test_mix_to_target_zero_corpus_shuffle(spark, sf_dir):
    # after the #groups-row mass collect, membership is a pure filter —
    # the corpus itself must not exchange
    df = Q["mix_to_target_docs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:600]
    assert "Join" not in plan, "mix gate should be a filter, not a join"


def test_impute_broadcasts_group_stats(spark, sf_dir):
    # the fill join must broadcast the #groups-row stats — the corpus
    # never sort-merge shuffles to be repaired
    df = Q["impute_docs"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all("Broadcast" in j for j in joins), joins


def test_flag_outliers_broadcasts_fences(spark, sf_dir):
    df = Q["flag_outliers_docs"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all("Broadcast" in j for j in joins), joins


def test_pr_thresholds_no_sort_single_agg(spark, sf_dir):
    # the PR table must come from conditional sums over ONE global
    # aggregation: no per-row sort, no explode, no hash exchange of the
    # data (the only Sort in the plan is the #thresholds-row output order)
    # (the plan's one Generate is the stack() unpivot of the single
    # aggregate ROW into #thresholds rows — not a data explode)
    df = Q["pr_thresholds_docs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0, plan[:400]


def test_funnel_one_entity_exchange(spark, sf_dir):
    df = Q["funnel_events"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") <= 1, (
        "funnel re-shuffled the entity key"
    )
    assert "Join" not in plan, "funnel should fold, not self-join per step"


def test_cosine_topk_arrow_stays_take_ordered(spark):
    # the d>=32 Arrow kernel must not break the top-k physical plan: the
    # ArrowEvalPython filter feeds TakeOrderedAndProject, never a global
    # Sort + single-partition Exchange
    from pyspark.sql import functions as F
    from datachain_spark.ops.similarity import cosine_topk

    df = spark.range(1000).select(
        F.col("id"),
        F.transform(F.sequence(F.lit(0), F.lit(63)),
                    lambda i: F.pmod(F.xxhash64("id", i), F.lit(100))
                    .cast("double")).alias("embedding"),
    )
    out = cosine_topk(df, [1.0] * 64, "embedding", k=5, id_cols=["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(out) == 0


def test_strip_boilerplate_plan_broadcasts(spark, sf_dir):
    # the boiler set and the corpus-size scalar are broadcast (threshold-
    # pruned, tiny); no cross join beyond the 1-row scalar, no sort-merge
    df = Q["strip_boilerplate_docs"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins and "SortMergeJoin" not in joins, joins
