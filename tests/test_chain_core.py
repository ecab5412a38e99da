"""Core operator semantics vs golden outputs — mirrors the reference's
tests/unit/lib/test_datachain.py corpus (SURVEY.md §5 layer 2)."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark import C, func


@pytest.fixture()
def people(session):
    return dc.read_values(
        session=session,
        first_name=["Alice", "Bob", "Charlie", "David", "Alice", None],
        age=[25, 30, None, 40, 25, 35],
        city=["NYC", "LA", "NYC", None, "SF", "LA"],
    )


def test_select(people):
    out = people.select("first_name", "age")
    assert out.columns == ["first_name", "age"]
    assert out.count() == 6


def test_select_except(people):
    out = people.select_except("city")
    assert out.columns == ["first_name", "age"]


def test_filter_and_of_exprs(people):
    out = people.filter(C.age > 24, C.city == "NYC")
    assert sorted(out.to_values("first_name")) == ["Alice"]


def test_filter_in_glob(people):
    assert sorted(
        people.filter(C("first_name").in_("Alice", "Bob")).to_values("age")
    ) == [25, 25, 30]
    assert sorted(
        people.filter(C("first_name").glob("*li*")).to_values("first_name")
    ) == ["Alice", "Alice", "Charlie"]


def test_mutate_literal_and_expr(people):
    out = people.mutate(age2=C.age * 2, tag="x").filter(C.first_name == "Bob")
    rec = out.to_records()[0]
    assert rec["age2"] == 60 and rec["tag"] == "x"


def test_rename(people):
    out = people.rename(name="first_name")
    assert "name" in out.columns and "first_name" not in out.columns


def test_order_by_limit_offset(people):
    vals = people.order_by("age").limit(3).to_values("age")
    assert vals == [None, 25, 25]  # Spark sorts NULL first ascending
    vals = people.order_by("age", descending=True).offset(1).limit(2).to_values("age")
    assert vals == [35, 30]


def test_distinct_on_key(people):
    out = people.distinct("first_name")
    assert out.count() == 5  # Alice dedup'd; None is its own key


def test_whole_row_distinct(session):
    ch = dc.read_values(session=session, x=[1, 1, 2], y=["a", "a", "b"])
    assert ch.distinct().count() == 2


def test_group_by_multi_aggs(people):
    out = people.group_by(
        partition_by="city",
        n=func.count(),
        total_age=func.sum(C.age),
        mean_age=func.avg(C.age),
        min_age=func.min(C.age),
        max_age=func.max(C.age),
    )
    rows = {r["city"]: r for r in out.to_records()}
    assert rows["LA"]["n"] == 2 and rows["LA"]["total_age"] == 65
    assert rows["NYC"]["total_age"] == 25  # NULL age ignored
    assert rows[None]["n"] == 1


def test_group_by_global(people):
    out = people.group_by(n=func.count(), s=func.sum(C.age))
    assert out.to_records() == [{"n": 6, "s": 155}]


def test_chain_scalars(people):
    assert people.count() == 6
    assert people.sum("age") == 155
    assert people.min("age") == 25
    assert people.max("age") == 40


def test_union_and_mismatch(session, people):
    other = dc.read_values(
        session=session, first_name=["Zed"], age=[50], city=["Rome"]
    )
    assert people.union(other).count() == 7
    bad = dc.read_values(session=session, nope=[1])
    with pytest.raises(dc.DatasetMergeError):
        people.union(bad)


def test_subtract_null_safe(session):
    left = dc.read_values(session=session, k=[1, 2, None, 4], v=list("abcd"))
    right = dc.read_values(session=session, k=[2, None], w=["x", "y"])
    out = left.subtract(right, on="k")
    assert sorted(out.to_values("v")) == ["a", "d"]  # NULL key matched null-safely


def test_semi_join(session):
    left = dc.read_values(session=session, k=[1, 2, None, 4], v=list("abcd"))
    right = dc.read_values(session=session, k=[2, None, 2], w=["x", "y", "z"])
    out = left.semi_join(right, on="k")
    # complement of subtract: NULL key matches null-safely; no duplication
    # from the doubled k=2 on the right
    assert sorted(out.to_values("v")) == ["b", "c"]
    assert set(out.columns) == {"k", "v"}  # right columns never leak
    with pytest.raises(dc.DatasetMergeError):
        left.semi_join(dc.read_values(session=session, z=[1]))


def test_sample_by_stratified(session):
    ch = dc.read_values(
        session=session,
        cls=["a"] * 400 + ["b"] * 400 + ["c"] * 200,
        x=list(range(1000)),
    )
    out = ch.sample_by("cls", {"a": 0.25, "b": 1.0}, seed=3)
    counts = {r["cls"]: r["n"] for r in
              out.group_by(partition_by="cls", n=dc.func.count()).to_records()}
    assert counts["b"] == 400          # fraction 1.0 keeps everything
    assert 40 < counts.get("a", 0) < 200  # ~100 of 400
    assert "c" not in counts           # unlisted stratum dropped
    # deterministic across invocations
    assert sorted(out.to_values("x")) == sorted(
        ch.sample_by("cls", {"a": 0.25, "b": 1.0}, seed=3).to_values("x"))
    with pytest.raises(ValueError):
        ch.sample_by("cls", {"a": 1.5})


def test_intersect(session):
    a = dc.read_values(session=session, k=[1, 2, 2, 3], v=["x", "y", "y", "z"])
    b = dc.read_values(session=session, k=[2, 3, 4], v=["y", "z", "w"])
    out = a.intersect(b)
    assert sorted((r["k"], r["v"]) for r in out.to_records()) == [(2, "y"), (3, "z")]
    with pytest.raises(dc.DatasetMergeError):
        a.intersect(dc.read_values(session=session, z=[1]))


def test_cross_merge(session):
    a = dc.read_values(session=session, k=[1, 2], v=["x", "y"])
    b = dc.read_values(session=session, k=[10, 20], w=["p", "q"])
    out = a.cross_merge(b)
    assert out.count() == 4
    assert set(out.columns) == {"k", "v", "right_k", "w"}  # collision prefixed
    # self cross keeps both sides distinct
    assert a.cross_merge(a).count() == 4


def test_merge_left_default_and_rname(session):
    left = dc.read_values(session=session, id=[1, 2, 3], val=["a", "b", "c"])
    right = dc.read_values(session=session, id=[1, 2, 9], val=["x", "y", "z"])
    out = left.merge(right, on="id").order_by("id")
    assert out.columns == ["id", "val", "right_id", "right_val"]
    recs = out.to_records()
    assert recs[0]["val"] == "a" and recs[0]["right_val"] == "x"
    assert recs[2]["right_val"] is None  # left outer


def test_merge_inner_full(session):
    left = dc.read_values(session=session, id=[1, 2], v=["a", "b"])
    right = dc.read_values(session=session, rid=[2, 3], w=["y", "z"])
    assert left.merge(right, on="id", right_on="rid", inner=True).count() == 1
    assert left.merge(right, on="id", right_on="rid", full=True).count() == 3


def test_merge_expression_predicate(session):
    left = dc.read_values(session=session, a=[1, 2, 3])
    right = dc.read_values(session=session, b=[1, 2, 3])
    out = left.merge(right, on=C.a > C.b, inner=True)
    assert out.count() == 3  # (2,1),(3,1),(3,2)


def test_self_merge(session):
    ch = dc.read_values(session=session, id=[1, 2], v=["a", "b"])
    out = ch.merge(ch, on="id", inner=True)
    assert out.count() == 2
    assert "right_v" in out.columns


def test_diff_statuses(session):
    cur = dc.read_values(session=session, id=[1, 2, 3], v=["a", "B", "c"])
    old = dc.read_values(session=session, id=[2, 3, 4], v=["b", "c", "d"])
    out = cur.diff(old, on="id", same=True, status_col="st").order_by("id")
    assert [(r["id"], r["st"]) for r in out.to_records()] == [
        (1, "A"), (2, "M"), (3, "S"), (4, "D"),
    ]
    # deleted rows take right-side values
    d = cur.diff(old, on="id", added=False, modified=False, same=False)
    assert d.to_records()[0]["v"] == "d"


def test_compare_and_split(session):
    cur = dc.read_values(session=session, id=[1, 2], v=["a", "B"])
    old = dc.read_values(session=session, id=[2, 3], v=["b", "c"])
    parts = cur.compare_and_split(old, on="id")
    assert {k: ch.count() for k, ch in parts.items()} == {
        "added": 1, "deleted": 1, "modified": 1, "same": 0,
    }


def test_sample_shuffle_chunk_invariants(session):
    ch = dc.read_values(session=session, x=list(range(100)))
    assert ch.sample(10, seed=1).count() == 10
    sh1 = ch.shuffle(seed=7).to_values("x")
    sh2 = ch.shuffle(seed=7).to_values("x")
    assert sh1 == sh2 and sorted(sh1) == list(range(100))
    chunks = [ch.chunk(i, 3).to_values("x") for i in range(3)]
    allv = sorted(v for c in chunks for v in c)
    assert allv == list(range(100))
    assert ch.chunk(0, 3).to_values("x") == chunks[0]  # deterministic


def test_train_test_split(session):
    ch = dc.read_values(session=session, x=list(range(1000)))
    tr, te = ch.train_test_split([3, 1], seed=5)
    a, b = set(tr.to_values("x")), set(te.to_values("x"))
    assert a | b == set(range(1000)) and not (a & b)
    assert 600 < len(a) < 900


def test_explode_json(session):
    ch = dc.read_values(
        session=session,
        id=[1, 2],
        meta=['{"a": 5, "b": {"c": "x"}}', '{"a": 7, "b": {"c": "y"}}'],
    )
    out = ch.explode("meta", object_name="m").mutate(a=C("m.a"), c=C("m.b.c"))
    recs = out.order_by("id").to_records()
    assert recs[0]["a"] == 5 and recs[1]["c"] == "y"


def test_to_iter_and_values(people):
    rows = list(people.order_by("age").to_iter("first_name", "age"))
    assert len(rows) == 6 and rows[-1] == ("David", 40)


def test_sink_roundtrips(session, tmp_path):
    """to_parquet (clustered + bounded files) / to_csv / to_jsonl roundtrip."""
    import pyarrow.parquet as pq

    ch = dc.read_values(
        session=session,
        k=[3, 1, 2, 5, 4, 0] * 10,
        grp=["a", "b"] * 30,
        v=[float(i) for i in range(60)],
    )

    pdir = str(tmp_path / "p")
    ch.to_parquet(pdir, sort_by=["k"], max_records_per_file=25)
    back = dc.read_parquet(f"{pdir}/*.parquet", session=session)
    assert back.count() == 60
    # every file is clustered on k (row-group min/max prunable) and bounded
    import glob as globmod
    files = globmod.glob(f"{pdir}/*.parquet")
    assert len(files) >= 2  # 60 rows / 25 cap
    for f in files:
        t = pq.read_table(f)
        ks = t.column("k").to_pylist()
        assert ks == sorted(ks), f
        assert len(ks) <= 25, f

    # to_csv = ONE file with a header (reference layout, datachain.py:2315)
    cfile = str(tmp_path / "c.csv")
    ch.to_csv(cfile, delimiter=";")
    with open(cfile) as f:
        header = f.readline().strip()
    assert header == "k;grp;v"
    csv_back = dc.read_csv(cfile, delimiter=";", session=session)
    assert csv_back.count() == 60

    # distributed variant writes a directory of part files
    cdir = str(tmp_path / "cdir")
    ch.to_csv_dir(cdir, delimiter=";")
    csv_dir_back = dc.read_csv(f"{cdir}/*.csv", delimiter=";", session=session)
    assert csv_dir_back.count() == 60

    jdir = str(tmp_path / "j")
    ch.to_json_dir(jdir)
    jl = dc.read_json(f"{jdir}/*.json", format="jsonl", session=session)
    assert jl.count() == 60
    assert sorted(jl.columns) == ["grp", "k", "v"]

    # single-file exports, reference layout: to_json = one valid JSON array,
    # to_jsonl = one JSON-lines file
    import json as jsonmod

    jfile = str(tmp_path / "out.json")
    ch.to_json(jfile)
    with open(jfile) as f:
        arr = jsonmod.load(f)
    assert isinstance(arr, list) and len(arr) == 60
    assert sorted(arr[0]) == ["grp", "k", "v"]

    lfile = str(tmp_path / "out.jsonl")
    ch.to_jsonl(lfile)
    with open(lfile) as f:
        lines = [jsonmod.loads(line) for line in f if line.strip()]
    assert len(lines) == 60 and sorted(lines[0]) == ["grp", "k", "v"]

    # fsspec-style paths: file:// works without fsspec installed; a remote
    # scheme gives a clear ImportError when fsspec is absent (reference
    # supports fsspec paths + fs_kwargs, datachain.py:2362-2438)
    f2 = str(tmp_path / "out2.json")
    ch.to_json(f"file://{f2}", mode="w")  # text mode accepted, coerced to bytes
    with open(f2) as f:
        assert len(jsonmod.load(f)) == 60
    try:
        import fsspec  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="fsspec"):
            ch.to_json("s3://bucket/out.json")


def test_parity_accessors(session):
    """Reference-surface parity: empty/hash/clone/column/c/results/collect/
    to_columnar_data_with_names/__or__/name/version/dataset/from_* aliases."""
    ch = dc.read_values(session=session, k=[1, 2, 3], s=["a", "b", "c"])

    assert not ch.empty
    assert ch.filter(C.k > 99).empty
    h1, h2 = ch.hash(), ch.clone().hash()
    assert h1 == h2 and len(h1) == 32
    assert ch.hash() != ch.filter(C.k > 1).hash()

    assert ch.column("k") is not None
    with pytest.raises(ValueError):
        ch.column("nope")
    assert ch.c("s") is not None

    assert ch.results() == [(1, "a"), (2, "b"), (3, "c")]
    assert ch.results(row_factory=lambda cols, row: dict(zip(cols, row)))[0] == {
        "k": 1, "s": "a",
    }
    with pytest.warns(DeprecationWarning):
        assert list(ch.collect("k")) == [1, 2, 3]

    names, chunks = ch.to_columnar_data_with_names(chunk_size=2)
    assert names == ["k", "s"]
    got = list(chunks)
    assert got[0] == [[1, 2], ["a", "b"]] and got[1] == [[3], ["c"]]

    both = ch | ch
    assert both.count() == 6

    assert ch.name is None and ch.dataset is None
    saved = ch.save("parity_ds")
    assert saved.name == "parity_ds" and saved.version == "1.0.0"
    assert saved.namespace_name == "local" and saved.dataset is not None
    again = dc.read_dataset("parity_ds", session=session)
    assert again.version == "1.0.0" and again.filter(C.k > 0).name is None
    assert not again.delta and not again.delta_unsafe

    assert dc.from_values is dc.read_values  # deprecated alias surface
    assert ch.settings(batch_size=9).reset_settings()._settings == {}
    session.metastore.delete_dataset("parity_ds")


def test_hash_stable_across_rebuilds(session):
    """Independently-built identical chains hash identically (expression-id
    normalization); any step change still changes the hash."""
    def build():
        return (
            dc.read_parquet("/root/testdata/sf0.001/orders.parquet", session=session)
            .filter(C.o_totalprice > 100.0)
            .select("o_orderkey", "o_totalprice")
        )

    assert build().hash() == build().hash()
    assert build().hash() != build().limit(5).hash()


def test_deprecated_classmethod_constructors(session):
    """Reference keeps from_* classmethods with a DeprecationWarning
    (datachain.py:1934-2000) — drop-in ports must keep working."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ch = dc.DataChain.from_values(session=session, k=[1, 2, 3])
        assert ch.count() == 3
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert dc.DataChain.datasets(session=session).df is not None


def test_toolkit_train_test_split_free_function(session):
    """Parity: datachain.toolkit.train_test_split(chain, weights, seed)."""
    import datachain_spark as dc
    from datachain_spark.toolkit import train_test_split

    ch = dc.read_values(session=session, x=list(range(200)))
    train, test = train_test_split(ch, [0.75, 0.25], seed=7)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 200
    assert n_test > 0 and n_train > n_test
    # disjoint + deterministic (same as the method form)
    m_train, m_test = ch.train_test_split([0.75, 0.25], seed=7)
    assert sorted(train.to_values("x")) == sorted(m_train.to_values("x"))
    assert set(train.to_values("x")).isdisjoint(test.to_values("x"))


def test_sample_per_group(session):
    """Exactly n per group (short groups keep everything), deterministic
    across calls, both hash families; invalid n raises."""
    import datachain_spark as dc
    import pytest

    ch = dc.read_values(
        session=session,
        k=list(range(30)),
        g=["a"] * 20 + ["b"] * 8 + ["c"] * 2,
    )
    out = ch.sample_per_group("g", 5, key=["k"])
    rows = out.to_records()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], set()).add(r["k"])
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5 and len(by_g["c"]) == 2
    # deterministic: identical selection on re-run and stable under repartition
    again = ch.sample_per_group("g", 5, key=["k"]).to_records()
    assert {(r["g"], r["k"]) for r in again} == {(r["g"], r["k"]) for r in rows}
    md5 = ch.sample_per_group("g", 5, key=["k"], hash_fn="md5").to_records()
    assert len(md5) == 12
    with pytest.raises(ValueError):
        ch.sample_per_group("g", 0)


def test_sample_per_group_tiebreak_deterministic(session):
    """Rows sharing a key= value hash identically; the cut among them must
    not depend on partition order — the remaining columns break the tie."""
    import datachain_spark as dc

    ch = dc.read_values(
        session=session,
        k=[1, 1, 1, 1, 2, 2, 2, 2],          # heavy hash ties via key=
        v=["a", "b", "c", "d", "e", "f", "g", "h"],
        g=["x"] * 8,
    )
    base = {(r["k"], r["v"]) for r in ch.sample_per_group("g", 3, key=["k"]).to_records()}
    # same data, different physical layout -> same survivors
    shuffled = ch._evolve(ch.df.repartition(7, "v"))
    again = {(r["k"], r["v"]) for r in shuffled.sample_per_group("g", 3, key=["k"]).to_records()}
    assert base == again and len(base) == 3


def test_sample_per_group_nested_map_schema(session):
    """The hash tie-break must not choke on non-orderable nested types
    (ordering by raw columns raised AnalysisException on array<map<...>> —
    wds/HF-style json metadata schemas hit that)."""
    import datachain_spark as dc
    from pyspark.sql import functions as F

    df = session.spark.createDataFrame(
        [(i, "g", [{"k": f"v{i}"}]) for i in range(6)],
        "id long, g string, meta array<map<string,string>>",
    )
    ch = dc.DataChain(df, session)
    out = ch.sample_per_group("g", 2, key=["id"])
    rows = out.to_records()
    assert len(rows) == 2
    again = {r["id"] for r in ch._evolve(ch.df.repartition(5, "id"))
             .sample_per_group("g", 2, key=["id"]).to_records()}
    assert again == {r["id"] for r in rows}


def test_map_arrow_binary_fast_path(session):
    # r08: Arrow-native batch transform — binary payloads transform
    # without pandas boxing; result must equal the native-expression
    # computation, and fn must actually receive pyarrow.RecordBatch
    import hashlib

    import pyarrow as pa
    from pyspark.sql import functions as F

    import datachain_spark as dc

    spark = session.spark
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(64)]
    ch = dc.read_pandas(
        __import__("pandas").DataFrame(rows, columns=["id", "payload"]),
        session=session,
    )

    seen_types = []

    def sha_batches(it):
        for b in it:
            seen_types.append(type(b).__name__)
            ids = b.column("id")
            payloads = b.column("payload")
            digests = [
                hashlib.sha256(p.as_py()).hexdigest() for p in payloads
            ]
            sizes = [len(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(digests), pa.array(sizes, pa.int64())],
                ["id", "sha", "n_bytes"],
            )

    out = ch.map_arrow(
        sha_batches, "id long, sha string, n_bytes long"
    ).df
    expect = ch.df.select(
        "id",
        F.lower(F.sha2(F.col("payload"), 256)).alias("sha"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    got = {r["id"]: (r["sha"], r["n_bytes"]) for r in out.collect()}
    exp = {r["id"]: (r["sha"], r["n_bytes"]) for r in expect.collect()}
    assert got == exp
    assert set(seen_types) == set()  # executor-side list stays empty here

    # default output schema = identity rewrite
    same = ch.map_arrow(lambda it: it).df
    assert same.schema == ch.df.schema
    assert same.count() == 64

    import pytest as _pt
    with _pt.raises(TypeError, match="map_arrow"):
        ch.map_arrow(lambda it: it, output=123)
