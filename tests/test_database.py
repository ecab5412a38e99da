"""read_database / to_database without a JDBC jar: sqlite (stdlib) and
duckdb URL paths, plus live DB-API connections. Parity target:
/root/reference/src/datachain/lib/dc/database.py:298-381 (read) and 70-297
(write) — any-SQL-source ingestion into a chain and back."""

import sqlite3

import duckdb
import pytest

import datachain_spark as dc


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "t.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE items (id INTEGER, name TEXT, price REAL)")
    conn.executemany(
        "INSERT INTO items VALUES (?, ?, ?)",
        [(1, "bolt", 1.5), (2, "nut", 0.5), (3, "gear", 7.25)],
    )
    conn.commit()
    conn.close()
    return path


def test_read_sqlite_url(session, sqlite_db):
    ch = dc.read_database(
        "SELECT id, name, price FROM items WHERE price > 0.6 ORDER BY id",
        f"sqlite:///{sqlite_db}",
        session=session,
    )
    assert ch.to_list() == [(1, "bolt", 1.5), (3, "gear", 7.25)]


def test_read_sqlite_params(session, sqlite_db):
    ch = dc.read_database(
        "SELECT name FROM items WHERE id = ?",
        f"sqlite:///{sqlite_db}",
        session=session,
        params=[2],
    )
    assert ch.to_values("name") == ["nut"]


def test_read_live_dbapi_connection(session, sqlite_db):
    conn = sqlite3.connect(sqlite_db)
    try:
        ch = dc.read_database("SELECT count(*) AS n FROM items", conn, session=session)
        assert ch.to_values("n") == [3]
    finally:
        conn.close()


def test_read_duckdb_url(session, tmp_path):
    path = str(tmp_path / "d.duckdb")
    conn = duckdb.connect(path)
    conn.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v(k, s)")
    conn.close()
    ch = dc.read_database(
        "SELECT k, s FROM t ORDER BY k", f"duckdb:///{path}", session=session
    )
    assert ch.to_list() == [(1, "a"), (2, "b")]


def test_read_live_duckdb_connection(session):
    conn = duckdb.connect()
    try:
        ch = dc.read_database("SELECT 41 + 1 AS answer", conn, session=session)
        assert ch.to_values("answer") == [42]
    finally:
        conn.close()


def test_unsupported_url(session):
    with pytest.raises(ValueError, match="unsupported database url"):
        dc.read_database("SELECT 1", "postgres://nope", session=session)


def test_to_database_sqlite_roundtrip(session, tmp_path):
    path = str(tmp_path / "out.db")
    ch = dc.read_values(session=session, k=[3, 1, 2], v=["c", "a", "b"])
    ch.to_database("kv", f"sqlite:///{path}", mode="overwrite")
    back = dc.read_database("SELECT k, v FROM kv ORDER BY k", f"sqlite:///{path}",
                            session=session)
    assert back.to_list() == [(1, "a"), (2, "b"), (3, "c")]
    # append mode accumulates
    ch.to_database("kv", f"sqlite:///{path}", mode="append")
    n = dc.read_database("SELECT count(*) AS n FROM kv", f"sqlite:///{path}",
                         session=session)
    assert n.to_values("n") == [6]


def test_to_database_duckdb_roundtrip(session, tmp_path):
    path = str(tmp_path / "out.duckdb")
    ch = dc.read_values(session=session, k=[2, 1], v=["b", "a"])
    ch.to_database("kv", f"duckdb:///{path}", mode="overwrite")
    back = dc.read_database("SELECT k, v FROM kv ORDER BY k", f"duckdb:///{path}",
                            session=session)
    assert back.to_list() == [(1, "a"), (2, "b")]
    ch.to_database("kv", f"duckdb:///{path}", mode="append")
    n = dc.read_database("SELECT count(*) AS n FROM kv", f"duckdb:///{path}",
                         session=session)
    assert n.to_values("n") == [4]
