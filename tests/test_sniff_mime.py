"""ops/multimodal.sniff_mime — magic-byte content-type detection."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.multimodal import sniff_mime

CASES = [
    (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"GIF89a....", "image/gif"),
    (b"GIF87a....", "image/gif"),
    (b"%PDF-1.7 ...", "application/pdf"),
    (b"PK\x03\x04zipdata", "application/zip"),
    (b"\x1f\x8b\x08gz", "application/gzip"),
    (b"BZh91AY", "application/x-bzip2"),
    (b"\xfd7zXZ\x00data", "application/x-xz"),
    (b"\x28\xb5\x2f\xfdzstd", "application/zstd"),
    (b"ID3\x04tag", "audio/mpeg"),
    (b"fLaCdata", "audio/flac"),
    (b"OggSdata", "application/ogg"),
    (b"\x1a\x45\xdf\xa3mkv", "video/webm"),
    (b"RIFF\x24\x00\x00\x00WAVEfmt", "audio/wav"),
    (b"RIFF\x24\x00\x00\x00WEBPVP8", "image/webp"),
    (b"RIFF\x24\x00\x00\x00AVI LIST", "video/x-msvideo"),
    (b"\x00\x00\x00\x18ftypmp42...", "video/mp4"),
    (b"\x00\x00\x00\x18ftypisom...", "video/mp4"),
    # ISO-BMFF brand disambiguation: 'ftyp' alone is NOT video
    (b"\x00\x00\x00\x18ftypheic...", "image/heic"),
    (b"\x00\x00\x00\x18ftypheix...", "image/heic"),
    (b"\x00\x00\x00\x18ftypmif1...", "image/heif"),
    (b"\x00\x00\x00\x1cftypavif...", "image/avif"),
    (b"\x00\x00\x00\x18ftypM4A ...", "audio/mp4"),
    (b"\x00\x00\x00\x14ftypqt  ...", "video/quicktime"),
    (b"<?xml version='1.0'?>", "application/xml"),
    (b"plain text content", "application/octet-stream"),
    (b"", "application/octet-stream"),
    (None, "application/octet-stream"),
]


def test_sniff_all_signatures(spark):
    df = spark.createDataFrame(
        [(i, d) for i, (d, _) in enumerate(CASES)], "i int, content binary"
    )
    got = {r["i"]: r["mime"] for r in sniff_mime(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i], got[i])


def test_sniff_zero_shuffle_codegen(spark):
    df = spark.createDataFrame([(b"\xff\xd8\xff",)], "content binary")
    out = sniff_mime(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sniff_fluent_and_registry(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    ok, detail = compare(
        q["sniff_mime_docs"](session.spark, "/root/testdata/sf0.001"),
        o["sniff_mime_docs"],
        "/root/testdata/sf0.001",
    )
    assert ok, detail
