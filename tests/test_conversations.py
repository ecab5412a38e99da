"""ops/conversations: turn flattening, pair extraction, structure audit,
chat rendering."""

import pytest

from datachain_spark.ops.conversations import (
    conversation_stats,
    extract_pairs,
    flatten_turns,
    render_chat,
)

SCHEMA = "id int, messages array<struct<role string, content string>>"


def _convs(spark):
    return spark.createDataFrame(
        [
            (1, [("system", "be nice"), ("user", "hi"), ("assistant", "hello"),
                 ("user", "bye"), ("assistant", "cya")]),
            (2, [("user", "only user")]),
            (3, [("user", "a"), ("user", "b"), ("assistant", "c")]),
            (4, None),
            (5, []),
        ],
        SCHEMA,
    )


def test_flatten_turns(spark):
    rows = flatten_turns(_convs(spark), "id").collect()
    got = [(r["id"], r["turn"], r["role"]) for r in rows if r["id"] == 1]
    assert got == [(1, 0, "system"), (1, 1, "user"), (1, 2, "assistant"),
                   (1, 3, "user"), (1, 4, "assistant")]
    ids = {r["id"] for r in rows}
    assert 4 not in ids and 5 not in ids  # NULL/empty yield no rows


def test_extract_pairs(spark):
    rows = extract_pairs(_convs(spark), "id").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["pair"], r["prompt"], r["response"]))
    assert by_id[1] == [(0, "hi", "hello"), (1, "bye", "cya")]
    assert by_id[3] == [(0, "b", "c")]  # double-user: only the adjacent pair
    assert 2 not in by_id and 4 not in by_id and 5 not in by_id


def test_conversation_stats(spark):
    out = {r["id"]: r for r in conversation_stats(_convs(spark), "id").collect()}
    r1 = out[1]
    assert (r1["n_turns"], r1["n_user"], r1["n_assistant"]) == (5, 2, 2)
    assert r1["n_role_repeats"] == 0 and r1["starts_with_user"] is False
    assert out[3]["n_role_repeats"] == 1  # user,user
    assert out[3]["starts_with_user"] is True
    assert out[4]["n_turns"] == 0 and out[5]["n_turns"] == 0
    assert out[1]["n_chars"] == len("be nice") + len("hi") + len("hello") + 3 + 3


def test_render_chat(spark):
    df = spark.createDataFrame(
        [(1, [("user", "q"), ("assistant", None)])], SCHEMA
    )
    r = render_chat(df, "id").collect()[0]
    assert r["text"] == "<|user|>q\n<|assistant|>"
    r2 = render_chat(df, "id", turn_template="{role}: {content}",
                     separator=" || ").collect()[0]
    assert r2["text"] == "user: q || assistant: "
    with pytest.raises(ValueError, match="turn_template"):
        render_chat(df, "id", turn_template="{role} only")


def test_render_chat_reversed_template(spark):
    # placeholders may appear in ANY order (and repeat)
    df = spark.createDataFrame([(1, [("user", "q")])], SCHEMA)
    r = render_chat(df, "id", turn_template="{content} said by {role}").collect()[0]
    assert r["text"] == "q said by user"
    r2 = render_chat(df, "id", turn_template="[{role}|{role}] {content}").collect()[0]
    assert r2["text"] == "[user|user] q"


def test_conversation_stats_keep_cols(spark):
    # audit-gate -> pairs as ONE join-free plan via the passthrough
    df = _convs(spark)
    gated = conversation_stats(df, "id", keep_cols=["messages"]).filter(
        "n_role_repeats = 0"
    )
    pairs = extract_pairs(gated, "id")
    assert pairs.filter("id = 3").count() == 0  # broken conv gated out
    assert pairs.filter("id = 1").count() == 2
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_conversation_pipeline_zero_shuffle(spark):
    df = _convs(spark)
    plan = (
        conversation_stats(df, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
    plan2 = extract_pairs(df, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2


def test_registry_conversation_oracle(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["conversation_pairs_docs", "conversation_stats_docs"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)
