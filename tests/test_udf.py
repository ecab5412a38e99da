"""UDF surface semantics — mirrors the reference's mapper/generator/
aggregator tests (tests/unit/lib/test_udf*.py, test_partition_by.py)."""

import pytest

import datachain_spark as dc
from datachain_spark import Aggregator, C, Generator, Mapper, func


@pytest.fixture()
def nums(session):
    return dc.read_values(session=session, x=[1, 2, 3, 4], name=["a", "b", "c", "d"])


def test_map_lambda_explicit(nums):
    out = nums.map(lambda x: x * 10, params="x", output={"y": int})
    assert sorted(out.to_values("y")) == [10, 20, 30, 40]
    assert out.columns == ["x", "name", "y"]


def test_map_signature_inference(nums):
    def double(x: int) -> int:
        return x * 2

    out = nums.map(double, output={"d": int})
    assert sorted(out.to_values("d")) == [2, 4, 6, 8]


def test_map_signal_map_kwarg(nums):
    out = nums.map(twice=lambda x: x + x, params="x", output=int)
    assert "twice" in out.columns
    assert sorted(out.to_values("twice")) == [2, 4, 6, 8]


def test_map_multi_output_tuple(nums):
    out = nums.map(
        lambda x, name: (x * 2, name.upper()),
        params=["x", "name"],
        output={"x2": int, "upper": str},
    )
    recs = {r["x"]: r for r in out.to_records()}
    assert recs[1]["x2"] == 2 and recs[1]["upper"] == "A"


def test_map_overrides_existing_column(nums):
    out = nums.map(lambda x: x + 100, params="x", output={"x": int})
    assert sorted(out.to_values("x")) == [101, 102, 103, 104]
    assert out.columns == ["x", "name"]


def test_map_return_annotation_inference(nums):
    def label(name: str) -> str:
        return f"<{name}>"

    out = nums.map(label, output={"label": str})
    assert sorted(out.to_values("label"))[0] == "<a>"


def test_gen_replaces_schema(nums):
    out = nums.gen(
        lambda x: [(x, i) for i in range(x)],
        params="x",
        output={"orig": int, "i": int},
    )
    assert out.columns == ["orig", "i"]
    assert out.count() == 1 + 2 + 3 + 4


def test_gen_empty_yield(nums):
    out = nums.gen(
        lambda x: [(x,)] if x % 2 == 0 else [],
        params="x",
        output={"even": int},
    )
    assert sorted(out.to_values("even")) == [2, 4]


def test_agg_partition_by(session):
    ch = dc.read_values(
        session=session, grp=["a", "a", "b", "b", "b"], v=[1, 2, 3, 4, 5]
    )

    def stats(grp: list, v: list):
        yield grp[0], sum(v), len(v)

    out = ch.agg(
        stats, partition_by="grp", params=["grp", "v"],
        output={"grp": str, "s": int, "n": int},
    )
    recs = {r["grp"]: r for r in out.to_records()}
    assert recs["a"]["s"] == 3 and recs["b"]["n"] == 3


def test_agg_global(session):
    ch = dc.read_values(session=session, v=[1, 2, 3])
    out = ch.agg(lambda v: [(sum(v),)], params="v", output={"total": int})
    assert out.to_values("total") == [6]


def test_batch_map(nums):
    out = nums.batch_map(
        lambda xs: [x * 3 for x in xs], params="x", output={"x3": int}
    )
    assert sorted(out.to_values("x3")) == [3, 6, 9, 12]


class AddTag(Mapper):
    def setup(self):
        self.tag = "T"

    def process(self, name):
        return f"{self.tag}:{name}"


def test_class_mapper_setup(nums):
    out = nums.map(AddTag(), params="name", output={"tagged": str})
    assert sorted(out.to_values("tagged"))[0] == "T:a"


class Expand(Generator):
    def process(self, x):
        yield {"v": x}
        yield {"v": -x}


def test_class_generator_dict_rows(nums):
    out = nums.gen(Expand(), params="x", output={"v": int})
    assert out.count() == 8
    assert min(out.to_values("v")) == -4


class GroupSum(Aggregator):
    def process(self, grp, v):
        yield {"grp": grp[0], "total": sum(v)}


def test_class_aggregator(session):
    ch = dc.read_values(session=session, grp=["x", "x", "y"], v=[1, 2, 10])
    out = ch.agg(
        GroupSum(), partition_by="grp", params=["grp", "v"],
        output={"grp": str, "total": int},
    )
    recs = {r["grp"]: r["total"] for r in out.to_records()}
    assert recs == {"x": 3, "y": 10}


from pydantic import BaseModel


class Score(BaseModel):
    value: float
    label: str


def test_pydantic_output(session):
    ch = dc.read_values(session=session, x=[1, 2])
    out = ch.map(
        lambda x: Score(value=x * 0.5, label=f"s{x}"),
        params="x",
        output={"value": float, "label": str},
    )
    recs = sorted(out.to_records(), key=lambda r: r["x"])
    assert recs[0]["value"] == 0.5 and recs[1]["label"] == "s2"


def test_settings_sys_signals(nums):
    """settings(sys=True) attaches the Sys struct (id unique per row, rand a
    deterministic 63-bit non-negative); sys=False drops it. Parity:
    lib/dc/utils.py:126."""
    out = nums.settings(sys=True)
    assert "sys" in out.df.columns
    rows = out.df.select("sys.id", "sys.rand").collect()
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == len(ids)  # unique per row
    assert all(r["rand"] >= 0 for r in rows)
    # same plan re-executed -> same sys values (deterministic derivation)
    again = out.df.select("sys.id", "sys.rand").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    dropped = out.settings(sys=False)
    assert "sys" not in dropped.df.columns


def test_settings_parallel_noop(nums):
    out = nums.settings(parallel=2).map(lambda x: x, params="x", output={"y": int})
    assert out.count() == 4


def test_map_on_error_null_and_collect(session):
    ch = dc.read_values(session=session, x=[1, 0, 2])

    def inv(x: int) -> float:
        return 10.0 / x

    out = ch.map(inv, output={"r": float}, on_error="null")
    recs = {r["x"]: r["r"] for r in out.to_records()}
    assert recs[0] is None and recs[1] == 10.0

    out2 = ch.map(inv, output={"r": float, "err": str}, on_error="collect")
    recs2 = {r["x"]: r for r in out2.to_records()}
    assert recs2[0]["err"].startswith("ZeroDivisionError")
    assert recs2[1]["err"] is None and recs2[1]["r"] == 10.0
