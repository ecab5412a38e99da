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


def test_retry_example_flag_style(session):
    # examples/incremental_processing/retry.py verbatim flow: flag-style
    # delta with delta_retry on a nested error column; odd ids fail on
    # attempt 1 and succeed on attempt 2
    import datachain_spark as dc
    from datachain_spark import C
    from pydantic import BaseModel

    class ProcessingResult(BaseModel):
        processed_content: str
        processed_at: str
        error: str
        attempt: int

    def process_data(item_id: int, content: str, attempt: int) -> ProcessingResult:
        error = item_id % 2 == 1 and attempt == 1
        return ProcessingResult(
            processed_content="" if error else content.upper(),
            processed_at="2026-08-14T00:00:00",
            error=f"Processing error for item {item_id}" if error else "",
            attempt=attempt,
        )

    dc.read_values(
        item_id=[1, 2, 3, 4, 5],
        content=["first", "second", "third", "fourth", "fifth"],
        in_memory=True,
        session=session,
    ).save("sample_data")

    first = (
        dc.read_dataset(
            "sample_data", delta=True, delta_on="item_id",
            delta_retry="result.error", session=session,
        )
        .setup(attempt=lambda: 1)
        .map(result=process_data)
        .save(name="processed_data")
    )
    assert first.count() == 5
    assert first.filter(C("result.error") != "").count() == 3  # odd ids

    retry = (
        dc.read_dataset(
            "sample_data", delta=True, delta_on="item_id",
            delta_retry="result.error", session=session,
        )
        .setup(attempt=lambda: 2)
        .map(result=process_data)
        .save(name="processed_data")
    )
    assert retry.count() == 5
    assert retry.filter(C("result.error") != "").count() == 0
    by_id = {r["item_id"]: r["result"] for r in retry.to_records()}
    assert by_id[1]["attempt"] == 2 and by_id[1]["processed_content"] == "FIRST"
    assert by_id[2]["attempt"] == 1  # untouched on retry


def test_delta_example_flag_style(session, tmp_path):
    # examples/incremental_processing/delta.py flow: incremental file
    # processing over storage — second save only processes the new file
    import re

    import datachain_spark as dc
    from datachain_spark import C

    root = tmp_path / "test"
    root.mkdir()
    (root / "file-1.txt").write_text("one")
    (root / "file-2.txt").write_text("two")
    (root / "notes.md").write_text("skip me")

    def extract_file_number(path: str) -> int:
        m = re.search(r"file-(\d+)\.txt", path)
        return int(m.group(1)) if m else -1

    def build():
        return (
            dc.read_storage(
                str(root), update=True, delta=True, delta_on="file.path",
                session=session,
            )
            .filter(C("file.path").glob("*.txt"))
            .map(file_number=extract_file_number, params=["file.path"])
            .save(name="test_files")
        )

    chain = build()
    assert chain.count() == 2

    (root / "file-3.txt").write_text("three")
    chain2 = build()
    assert chain2.count() == 3
    assert sorted(
        r["file_number"] for r in chain2.to_records()
    ) == [1, 2, 3]

    # restricted ops raise under delta unless delta_unsafe (reference
    # delta_disabled, delta.py:28-46)
    pending = dc.read_storage(
        str(root), delta=True, delta_on="file.path", session=session
    )
    with pytest.raises(NotImplementedError):
        pending.group_by(n=None)
    unsafe = dc.read_storage(
        str(root), delta=True, delta_on="file.path", delta_unsafe=True,
        session=session,
    )
    assert unsafe.distinct("file.path") is not None  # recorded, no error


def test_parallel_udf_example(session, dogs_and_cats):
    # examples/get_started/udfs/parallel.py flow: settings(parallel=...) is
    # the only change vs the simple UDF — results identical, work spread
    # across tasks (Spark executors replace the reference's multiprocessing
    # pool; parallel=N maps to a repartition hint)
    import datachain_spark as dc

    def path_len_benchmark(path: str) -> int:
        if path.endswith(".json"):
            return -1
        return len(path)

    out = (
        dc.read_storage(dogs_and_cats, session=session)
        .settings(parallel=4)
        .map(path_len=path_len_benchmark, params=["file.path"])
        .to_records()
    )
    assert len(out) == 7
    assert sorted(r["path_len"] for r in out)[0] == -1
    assert all(r["path_len"] == len(r["file"]["path"]) for r in out
               if not r["file"]["path"].endswith(".json"))


def test_stateful_udf_example(session, dogs_and_cats):
    # examples/get_started/udfs/stateful.py shape: setup() builds an
    # expensive resource once per worker, the mapped fn consumes it via a
    # keyword (the open_clip encoder is env-stubbed with a deterministic
    # fake — the wiring, not the model, is what this engine provides)
    import datachain_spark as dc
    from datachain_spark import C
    from datachain_spark.sources.files import File

    class FakeEncoder:
        def __init__(self, name: str):
            self.name = name

        def encode(self, data: bytes) -> list:
            return [float(len(data)), float(data[-1])]

    def embeddings(file: File, encoder) -> "list[float]":
        return encoder.encode(file.read_bytes())

    out = (
        dc.read_storage(dogs_and_cats, session=session)
        .filter(C("file.path").glob("*cat*.jpg"))
        .limit(5)
        .settings(parallel=2)
        .setup(encoder=lambda: FakeEncoder("fake-vit"))
        .map(emb=embeddings, output={"emb": list[float]})
        .to_records()
    )
    assert len(out) == 3
    assert all(r["emb"][0] == 6.0 for r in out)  # b"\xff\xd8cat" + 1 byte
    assert sorted(r["emb"][1] for r in out) == [0.0, 1.0, 2.0]
