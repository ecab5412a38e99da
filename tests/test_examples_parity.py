"""Drop-in replicas of the reference's public examples (examples/get_started)
run against local storage — proof that a reference user's scripts work on
this engine with only the import changed."""

import pytest


@pytest.fixture()
def dogs_and_cats(tmp_path):
    root = tmp_path / "pets"
    root.mkdir()
    for i in range(3):
        (root / f"dog.{i}.jpg").write_bytes(b"\xff\xd8dog" + bytes([i]))
        (root / f"cat.{i}.jpg").write_bytes(b"\xff\xd8cat" + bytes([i]))
    (root / "meta.json").write_text("{}")
    return str(root)


def test_simple_udf_example(session, dogs_and_cats):
    # examples/get_started/udfs/simple.py verbatim flow (local storage)
    import datachain_spark as dc

    def path_len(path: str) -> int:
        if path.endswith(".json"):
            return -1
        return len(path)

    out = (
        dc.read_storage(dogs_and_cats, session=session)
        .map(path_len=path_len, params=["file.path"])
        .to_records()
    )
    assert len(out) == 7
    by_path = {r["file"]["path"]: r["path_len"] for r in out}
    json_rows = [v for k, v in by_path.items() if k.endswith("meta.json")]
    assert json_rows == [-1]
    assert all(v > 0 for k, v in by_path.items() if not k.endswith(".json"))


def test_common_sql_functions_example(session, dogs_and_cats):
    # examples/get_started/common_sql_functions.py flow: every mutate stays
    # a native Column expression (no Python UDFs)
    import datachain_spark as dc
    from datachain_spark import C
    from datachain_spark.func import array, greatest, least, path, string

    chain = dc.read_storage(dogs_and_cats, session=session)

    r1 = (
        chain.mutate(
            length=string.length(path.name(C("file.path"))),
            parts=string.split(path.name(C("file.path")), "."),
        )
        .select("file.path", "length", "parts")
        .to_records()
    )
    jpg = next(r for r in r1 if r["path"].endswith("dog.0.jpg"))
    assert jpg["length"] == len("dog.0.jpg")
    assert jpg["parts"] == ["dog", "0", "jpg"]

    r2 = (
        chain.mutate(
            stem=path.file_stem(C("file.path")),
            ext=path.file_ext(C("file.path")),
        )
        .select("file.path", "stem", "ext")
        .to_records()
    )
    assert {r["ext"] for r in r2} == {"jpg", "json"}

    parts = string.split(path.name(C("file.path")), ".")
    tagged = chain.mutate(
        isdog=array.contains(parts, "dog"),
        iscat=array.contains(parts, "cat"),
    )
    recs = tagged.select("file.path", "isdog", "iscat").to_records()
    assert sum(r["isdog"] for r in recs) == 3
    assert sum(r["iscat"] for r in recs) == 3

    ab = tagged.mutate(
        a=array.length(string.split(C("file.path"), "/")),
        b=array.length(string.split(path.name(C("file.path")), "0")),
    )
    gl = (
        ab.mutate(
            greatest=greatest(ab.column("a"), C("b")),
            least=least(ab.column("a"), C("b")),
        )
        .select("a", "b", "greatest", "least")
        .to_records()
    )
    assert all(r["greatest"] >= r["least"] for r in gl)
    assert all(r["greatest"] == max(r["a"], r["b"]) for r in gl)


def test_nested_datamodel_example(session):
    # examples/get_started/nested_datamodel.py shape: read_values of a
    # nested pydantic model, filter on a nested field
    import datachain_spark as dc
    from pydantic import BaseModel

    class Address(BaseModel):
        city: str
        zip: int

    class Person(BaseModel):
        name: str
        address: Address

    people = [
        Person(name="ann", address=Address(city="kyiv", zip=1)),
        Person(name="bob", address=Address(city="lviv", zip=2)),
    ]
    ch = dc.read_values(person=people, session=session)
    rows = ch.filter(dc.C("person.address.city") == "lviv").to_records()
    assert len(rows) == 1 and rows[0]["person"]["name"] == "bob"
