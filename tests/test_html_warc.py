"""Web-corpus ingestion wave: ops/html extraction (tag strip, entity
decode, signals) and sources/warc (record parsing, concatenated-gzip
members, HTTP payload split, record-type filter, html compose)."""

import gzip

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops import html as H
from datachain_spark.ops.text import normalize_text
from datachain_spark.sources.warc import _gunzip_members, _parse_warc_bytes


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, html string")


def test_html_basic_extraction(spark):
    rows = [(1,
        "<html><head><title>My &amp; Title</title><style>p{color:red}</style>"
        "</head><body><p>Hello &lt;world&gt;.</p><p>Second   line.</p>"
        "<script>var x='<p>no</p>';</script><a href='x'>link text</a>"
        "</body></html>")]
    out = H.html_extract(_df(spark, rows), "doc_id").collect()[0]
    assert out["text"] == "Hello <world>.\n\nSecond line.\nlink text"
    assert out["title"] == "My & Title"
    assert out["n_links"] == 1
    assert out["n_tags"] > 5
    assert 0 < out["text_ratio"] < 1


def test_html_head_and_comments_dropped(spark):
    rows = [(1, "<head><title>T</title><meta x=1></head><!-- <p>gone</p> -->body text")]
    out = H.html_extract(_df(spark, rows), "doc_id").collect()[0]
    assert out["text"] == "body text"
    assert out["title"] == "T"


def test_html_entity_single_decode(spark):
    # double-encoded text decodes exactly once: &amp;lt; -> &lt; (literal)
    rows = [(1, "<p>&amp;lt;tag&amp;gt; &nbsp;ok</p>")]
    out = H.html_extract(_df(spark, rows), "doc_id").collect()[0]
    assert out["text"] == "&lt;tag&gt; ok"


def test_html_null_and_plain(spark):
    rows = [(1, None), (2, "no tags at all")]
    got = {r["doc_id"]: r for r in H.html_extract(_df(spark, rows), "doc_id").collect()}
    assert got[1]["text"] is None and got[1]["n_tags"] == 0
    assert got[2]["text"] == "no tags at all" and got[2]["text_ratio"] == 1.0


def test_html_block_tags_preserve_lines_for_c4(spark):
    # line structure survives into the C4 gate: each <p>/<li> is a line
    from datachain_spark.ops import c4

    rows = [(1, "<ul><li>First bullet line is long enough.</li>"
                "<li>Second bullet line is long enough.</li>"
                "<li>Third bullet line is long enough.</li></ul>")]
    extracted = H.html_extract(_df(spark, rows), "doc_id", with_signals=False)
    gated = c4.c4_clean(extracted, "doc_id").collect()
    assert len(gated) == 1 and gated[0]["n_kept_lines"] == 3


def test_normalize_text_folds_case_accents_punct(spark):
    df = spark.createDataFrame(
        [(1, "Héllo, WÖRLD!!  Ça va — très bien…"), (2, None), (3, " a\tb\nc ")],
        "id int, t string",
    )
    got = {r["id"]: r["n"] for r in df.select("id", normalize_text("t").alias("n")).collect()}
    assert got[1] == "hello world ca va tres bien"
    assert got[2] is None
    assert got[3] == "a b c"


def test_normalize_text_dedups_near_identical(spark):
    from datachain_spark.ops.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "HÉLLO WORLD?"), (4, "other")],
        "id int, t string",
    ).withColumn("t", normalize_text("t"))
    assert exact_dedup(df, "t", "id").count() == 2


# ---------------------------------------------------------------- WARC ----

def _rec(rtype, uri, payload, rid="x"):
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + "Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


_HTML = b"<html><head><title>T</title></head><body><p>Hello page one.</p></body></html>"
_HTTP_OK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Content-Length: " + str(len(_HTML)).encode() + b"\r\n\r\n" + _HTML
)
_HTTP_404 = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nmissing"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    plain = (
        _rec("warcinfo", None, b"software: test\r\n", "w0")
        + _rec("request", "http://a.example/one", b"GET /one HTTP/1.1\r\n\r\n", "q0")
        + _rec("response", "http://a.example/one", _HTTP_OK, "r1")
        + _rec("response", "http://a.example/two", _HTTP_404, "r2")
    )
    (d / "a.warc").write_bytes(plain)
    with open(d / "b.warc.gz", "wb") as f:
        for m in (
            _rec("response", "http://b.example/one", _HTTP_OK, "g1"),
            _rec("response", "http://b.example/two", _HTTP_404, "g2"),
        ):
            f.write(gzip.compress(m))  # CONCATENATED members, per the spec
    return str(d)


def test_warc_reads_responses_with_http_split(spark, warc_dir, session):
    rows = {r["target_uri"]: r for r in dcs.read_warc(warc_dir, session=session).df.collect()}
    assert len(rows) == 4  # only response records by default
    ok = rows["http://a.example/one"]
    assert ok["http_status"] == 200
    assert ok["http_content_type"].startswith("text/html")
    assert bytes(ok["payload"]) == _HTML
    assert ok["content_length"] == len(_HTTP_OK)  # full record payload size
    nf = rows["http://a.example/two"]
    assert nf["http_status"] == 404 and bytes(nf["payload"]) == b"missing"
    assert rows["http://b.example/one"]["http_status"] == 200  # gz path


def test_warc_record_type_filter_and_raw_payload(spark, warc_dir, session):
    all_rows = dcs.read_warc(warc_dir, record_types=None, http_parse=False, session=session).df
    types = {r["record_type"] for r in all_rows.collect()}
    assert types == {"warcinfo", "request", "response"}
    resp = all_rows.filter(
        (F.col("record_type") == "response") & (F.col("http_status").isNull())
    ).collect()
    # http_parse=False keeps the HTTP head inside payload
    assert any(bytes(r["payload"]).startswith(b"HTTP/1.1 200") for r in resp)


def test_warc_html_pipeline_compose(spark, warc_dir, session):
    ch = dcs.read_warc(warc_dir, session=session)
    pages = ch.df.filter(F.col("http_status") == 200).select(
        "target_uri", F.col("payload").cast("string").alias("html")
    )
    out = H.html_extract(pages, "target_uri", with_signals=False).collect()
    assert all(r["text"] == "Hello page one." and r["title"] == "T" for r in out)


def test_gunzip_members_handles_concatenation():
    a, b = b"alpha" * 10, b"beta" * 7
    assert _gunzip_members(gzip.compress(a) + gzip.compress(b)) == a + b


def test_parse_warc_ignores_trailing_garbage():
    data = _rec("response", "http://x/1", _HTTP_404, "t1") + b"\r\n junk not a record"
    recs = list(_parse_warc_bytes(data))
    assert len(recs) == 1 and recs[0][0]["warc-target-uri"] == "http://x/1"
