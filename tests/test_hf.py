"""read_hf Arrow ingest path, tested with synthetic in-memory stand-ins for
the HF 'datasets' objects (the real package is absent in this container).
Parity target: /root/reference/src/datachain/lib/hf.py (HFGenerator,
stream_splits: DatasetDict -> all splits + 'split' column; limit bounds
streaming datasets)."""

import pyarrow as pa
import pytest

import datachain_spark as dc


class FakeTableWrapper:
    """Mimics HF Dataset.data (a table wrapper exposing .table)."""

    def __init__(self, table):
        self.table = table


class FakeDataset:
    """Arrow-backed Dataset stand-in: exposes .data.table like HF."""

    def __init__(self, **cols):
        self.data = FakeTableWrapper(pa.table(cols))


class FakeDatasetDict(dict):
    """Split-name -> dataset mapping, like HF DatasetDict."""


class FakeIterableDataset:
    """Streaming stand-in: yields dict rows, no Arrow data attribute."""

    def __init__(self, rows):
        self._rows = rows

    def __iter__(self):
        return iter(self._rows)


def test_read_hf_arrow_dataset(session):
    ds = FakeDataset(id=[1, 2, 3], txt=["a", "b", "c"])
    ch = dc.read_hf(ds, session=session)
    assert sorted(ch.to_list()) == [(1, "a"), (2, "b"), (3, "c")]


def test_read_hf_dataset_dict_all_splits(session):
    dd = FakeDatasetDict(
        train=FakeDataset(id=[1, 2], txt=["a", "b"]),
        test=FakeDataset(id=[9], txt=["z"]),
    )
    ch = dc.read_hf(dd, session=session)
    rows = sorted(ch.to_list())
    assert rows == [(1, "a", "train"), (2, "b", "train"), (9, "z", "test")]
    assert "split" in ch.df.columns


def test_read_hf_dataset_dict_single_split(session):
    dd = FakeDatasetDict(
        train=FakeDataset(id=[1], txt=["a"]),
        test=FakeDataset(id=[9], txt=["z"]),
    )
    ch = dc.read_hf(dd, split="test", session=session)
    assert ch.to_list() == [(9, "z")]
    assert "split" not in ch.df.columns  # explicit split: no marker column


def test_read_hf_iterable_with_limit(session):
    rows = [{"id": i, "txt": f"t{i}"} for i in range(100)]
    ch = dc.read_hf(FakeIterableDataset(rows), limit=7, session=session)
    assert ch.df.count() == 7
    # unbounded ingests everything
    ch_all = dc.read_hf(FakeIterableDataset(rows), session=session)
    assert ch_all.df.count() == 100


def test_read_hf_string_requires_datasets_package(session):
    with pytest.raises(ImportError, match="datasets"):
        dc.read_hf("squad", session=session)


def test_read_hf_rejects_opaque_object(session):
    with pytest.raises(TypeError, match="cannot extract Arrow data"):
        dc.read_hf(object(), session=session)


def test_read_hf_named_dataset_via_fake_package(session, monkeypatch):
    """The string-name branch (load_dataset) end-to-end, exercised through a
    conftest-installable fake 'datasets' module — the real package is absent
    here, but the branch's argument plumbing (name, split=, kwargs
    passthrough) and its DatasetDict handling must still be covered."""
    import sys
    import types

    calls = {}

    def fake_load_dataset(name, split=None, **kwargs):
        calls["args"] = (name, split, kwargs)
        dd = FakeDatasetDict(
            train=FakeDataset(id=[1, 2], txt=["a", "b"]),
            validation=FakeDataset(id=[9], txt=["z"]),
        )
        if split is not None:
            return dd[split]
        return dd

    fake = types.ModuleType("datasets")
    fake.load_dataset = fake_load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake)

    # no split: every split ingested with a marker column
    ch = dc.read_hf("org/corpus", session=session, revision="main")
    assert calls["args"] == ("org/corpus", None, {"revision": "main"})
    rows = sorted(ch.to_list())
    assert rows == [(1, "a", "train"), (2, "b", "train"), (9, "z", "validation")]

    # explicit split: narrow result, split= forwarded to load_dataset
    one = dc.read_hf("org/corpus", split="validation", session=session)
    assert calls["args"] == ("org/corpus", "validation", {})
    assert one.to_list() == [(9, "z")]
    assert "split" not in one.df.columns
