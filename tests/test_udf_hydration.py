"""Automatic hydration of pydantic-annotated UDF params: a struct column
(dict under Arrow) arrives as the annotated model — parity with the
reference's signal-schema row conversion (lib/udf_signature.py)."""

from typing import Optional

import pytest
from pydantic import BaseModel

import datachain_spark as dc
from datachain_spark.sources.files import File


class Point(BaseModel):
    x: int = 0
    y: int = 0


@pytest.fixture()
def points(session):
    rows = [(i, {"x": i, "y": 2 * i}) for i in range(6)]
    df = session.spark.createDataFrame(rows, "id int, p struct<x:int, y:int>")
    return dc.DataChain(df, session)


def test_map_hydrates_annotated_model(points):
    def norm(p: Point) -> float:
        assert isinstance(p, Point)
        return float(p.x + p.y)

    ch = points.map(norm, params=["p"], output={"n": float})
    got = {r["id"]: r["n"] for r in ch.select("id", "n").to_records()}
    assert got == {i: float(3 * i) for i in range(6)}


def test_map_without_annotation_keeps_dict(points):
    def raw(p) -> int:
        assert isinstance(p, dict)
        return p["x"]

    ch = points.map(raw, params=["p"], output={"x2": int})
    assert ch.select("x2").to_values("x2") == [r["p"]["x"] for r in points.select("p").to_records()]


def test_map_optional_annotation_hydrates(points):
    def norm(p: Optional[Point]) -> int:
        assert p is None or isinstance(p, Point)
        return 0 if p is None else p.y

    ch = points.map(norm, params=["p"], output={"y": int})
    assert sorted(ch.select("y").to_values("y")) == [2 * i for i in range(6)]


def test_gen_hydrates(points):
    def expand(p: Point):
        yield (p.x,)
        yield (p.y,)

    ch = points.gen(expand, params=["p"], output={"v": int})
    assert ch.count() == 12


def test_agg_hydrates_list_elements(points):
    def span(ps: list[Point]):
        assert all(isinstance(p, Point) for p in ps)
        ys = [p.y for p in ps]
        yield (min(ys), max(ys))

    ch = points.agg(span, params=["p"], output={"lo": int, "hi": int})
    rows = ch.to_records()
    assert rows[0]["lo"] == 0 and rows[0]["hi"] == 10


def test_file_annotation_in_map(session, tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("hydrated")

    ch = dc.read_storage(str(p), session=session)

    def read(file: File) -> str:
        assert isinstance(file, File)
        return file.read_text()

    out = ch.map(read, params=["file"], output={"txt": str})
    assert out.to_values("txt") == ["hydrated"]
