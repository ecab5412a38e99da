"""WARC (Web ARChive) ingestion — the CommonCrawl on-ramp for web-corpus
pipelines (``read_warc`` -> ``ops.html.html_extract`` -> ``ops.c4.c4_clean``).

Spark-first shape: ``binaryFile`` scan (one task per WARC file — the
standard processing grain; CommonCrawl ships ~64k independent ~1 GB files
per crawl, so file-level parallelism saturates any cluster) feeding an
Arrow-batched ``mapInPandas`` record parser. Each task holds one
(decompressed) WARC in memory — the same peak any CC processor pays —and
streams records out in bounded batches, so executor memory stays flat
regardless of record count.

Format notes (ISO 28500, public spec):
- a record is ``WARC/1.x CRLF`` + header lines + CRLF CRLF + exactly
  ``Content-Length`` payload bytes + CRLF CRLF;
- ``.warc.gz`` files are CONCATENATED gzip members (one per record) —
  decompressed with a zlib loop because ``gzip.decompress`` stops at the
  first member;
- ``response`` record payloads open with an HTTP response head; with
  ``http_parse=True`` the status line / headers are split off so
  ``payload`` is the document body itself.

No reference counterpart (spec addition for the training-data pipeline).
"""

from __future__ import annotations

import zlib
from typing import Any, Iterable, Optional, Sequence, Union

from ..chain import DataChain
from ..session import Session

_SCHEMA = (
    "source string, record_type string, record_id string, target_uri string,"
    " warc_date string, content_type string, content_length long,"
    " http_status int, http_content_type string, payload binary"
)

_BATCH_ROWS = 1024


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (gzip.decompress stops at
    the first — every record is its own member in a .warc.gz)."""
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.unused_data or d.unused_data == data:
            break
        data = d.unused_data.lstrip(b"\x00")
    return b"".join(out)


def _parse_warc_bytes(data: bytes):
    """Yield (headers_dict, payload_bytes) per WARC record."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = head_end + 4
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def _split_http(payload: bytes):
    """(status, content_type, body) for an HTTP response payload; None
    status when the payload is not an HTTP message."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    head_lines = payload[:head_end].split(b"\r\n")
    try:
        status = int(head_lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in head_lines[1:]:
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("utf-8", "replace")
            break
    return status, ctype, payload[head_end + 4 :]


def read_warc(
    path: Union[str, Sequence[str]],
    record_types: Optional[Sequence[str]] = ("response",),
    http_parse: bool = True,
    pattern: str = "*.warc*",
    session: Optional[Session] = None,
) -> DataChain:
    """Read WARC files into (source, record_type, record_id, target_uri,
    warc_date, content_type, content_length, http_status,
    http_content_type, payload) rows.

    ``record_types`` filters records (None keeps all; the filter runs
    inside the parser, before any bytes cross a stage boundary).
    ``http_parse`` strips the HTTP response head from ``response``
    payloads so ``payload`` is the raw document body. ``warc_date`` stays
    the ISO-8601 string the record carries (cast with ``to_timestamp``
    downstream if needed).
    """
    import pandas as pd

    sess = Session.get(session)
    paths = [path] if isinstance(path, str) else list(path)
    files = (
        sess.spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(paths)
        .select("path", "content")
    )
    wanted = set(record_types) if record_types is not None else None
    parse_http = http_parse

    def _records(batches: Iterable["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        cols = [
            "source", "record_type", "record_id", "target_uri", "warc_date",
            "content_type", "content_length", "http_status",
            "http_content_type", "payload",
        ]
        rows: list[tuple[Any, ...]] = []

        def _flush():
            nonlocal rows
            if rows:
                yield pd.DataFrame(rows, columns=cols)
                rows = []

        for pdf in batches:
            for src, raw in zip(pdf["path"], pdf["content"]):
                data = bytes(raw)
                if data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data)
                for hdr, payload in _parse_warc_bytes(data):
                    rtype = hdr.get("warc-type", "")
                    if wanted is not None and rtype not in wanted:
                        continue
                    status = ctype_http = None
                    body = payload
                    if parse_http and rtype == "response":
                        status, ctype_http, body = _split_http(payload)
                    rows.append(
                        (
                            src,
                            rtype,
                            hdr.get("warc-record-id"),
                            hdr.get("warc-target-uri"),
                            hdr.get("warc-date"),
                            hdr.get("content-type"),
                            len(payload),
                            status,
                            ctype_http,
                            body,
                        )
                    )
                    if len(rows) >= _BATCH_ROWS:
                        yield from _flush()
        yield from _flush()

    df = files.mapInPandas(_records, _SCHEMA)
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])
