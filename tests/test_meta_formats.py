"""gen_datamodel_code / read_meta parity (reference lib/meta_formats.py,
exercised publicly by examples/get_started/json-csv-reader.py)."""

import json

import pytest

from datachain_spark.meta_formats import (
    gen_datamodel_code,
    load_json_from_string,
    process_json,
    read_meta,
)

SAMPLE = [
    {
        "url": "http://x",
        "id": 3,
        "license": {"name": "mit", "year": 2020},
        "tags": ["a", "b"],
        "scores": [1.5, 2],
        "opt": None,
    }
]


@pytest.fixture()
def sample_json(tmp_path):
    p = tmp_path / "sample.json"
    p.write_text(json.dumps(SAMPLE))
    return str(p)


def _exec(code):
    gl = {}
    exec(compile(code, "<test>", "exec", dont_inherit=True), gl)  # noqa: S102
    return gl["spec"]


def test_gen_datamodel_code_json_array(sample_json):
    code = gen_datamodel_code(sample_json, model_name="Coco")
    assert "class Coco(UserModel):" in code
    assert "class License(UserModel):" in code
    assert "spec = Coco" in code
    model = _exec(code)
    inst = model.model_validate(SAMPLE[0])
    assert (inst.id, inst.license.name, inst.scores) == (3, "mit", [1.5, 2.0])


def test_gen_datamodel_code_jmespath(tmp_path):
    p = tmp_path / "nested.json"
    p.write_text(json.dumps({"payload": {"licenses": [{"id": 1, "nm": "x"}]}}))
    code = gen_datamodel_code(str(p), jmespath="payload.licenses", model_name="Lic")
    model = _exec(code)
    assert sorted(model.model_fields) == ["id", "nm"]


def test_gen_datamodel_code_csv(tmp_path):
    p = tmp_path / "s.csv"
    p.write_text("id,name,score\n1,ann,2.5\n")
    model = _exec(gen_datamodel_code(str(p), format="csv", model_name="Chat"))
    anns = {k: v.annotation for k, v in model.model_fields.items()}
    assert anns == {"id": int, "name": str, "score": float}


def test_gen_datamodel_code_from_file_signal(tmp_path):
    from datachain_spark.sources.files import File

    p = tmp_path / "f.json"
    p.write_text(json.dumps({"a": 1, "b": "x"}))
    code = gen_datamodel_code(File.at(str(p)), model_name="M")
    model = _exec(code)
    assert model.model_validate({"a": 7, "b": "y"}).a == 7


def test_read_meta_schema_from(sample_json):
    parse = read_meta(schema_from=sample_json, model_name="Coco2")
    rows = list(parse(sample_json))
    assert rows[0].id == 3 and rows[0].license.year == 2020


def test_read_meta_static_spec_and_nrows(tmp_path):
    from pydantic import BaseModel

    class Lic(BaseModel):
        id: int
        name: str

    p = tmp_path / "lics.json"
    p.write_text(json.dumps([{"id": i, "name": f"n{i}"} for i in range(5)]))
    parse = read_meta(spec=Lic, nrows=3)
    rows = list(parse(str(p)))
    assert [r.id for r in rows] == [0, 1, 2]
    with pytest.raises(ValueError):
        read_meta()


def test_json_helpers():
    assert process_json('{"a": {"b": 2}}', "a.b") == 2
    assert load_json_from_string("[1,2]") == [1, 2]
    with pytest.raises(ValueError):
        load_json_from_string("{nope")


def test_keyword_and_alias_fields(tmp_path):
    p = tmp_path / "kw.json"
    p.write_text(json.dumps({"class": 1, "my-field": "x", "2col": 3.5}))
    model = _exec(gen_datamodel_code(str(p), model_name="Kw"))
    inst = model.model_validate({"class": 1, "my-field": "x", "2col": 3.5})
    assert inst.class_ == 1 and inst.my_field == "x" and inst.f_2col == 3.5
