"""Minimal WARC source: Common Crawl's native wire format → the
north-rule pages schema ``(url, warc_ts, html, text?, lang?)``.

Parses WARC/1.0 records: each record is a header block terminated by
CRLFCRLF, a payload of exactly ``Content-Length`` bytes, then
CRLFCRLF.  Two record types matter to a text pipeline and both are
supported: ``response`` (raw WARC dumps — HTTP payloads have their own
header block stripped to reach the html body) and ``conversion`` (WET
extracted-text dumps — the payload IS the plain text, no HTTP
headers).  ``.gz`` members are supported via whole-file gunzip (Common
Crawl files are per-record gzip members, which ``gzip`` handles as a
concatenated stream).

Scale shape: ``ray.data.read_binary_files`` yields one task per WARC
file (the dump's natural shard), and each task's ``flat-parse`` emits
one row per response record — the same per-file parallelism the rest
of the engine's partitioning assumes.  No whole-dataset state.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            out[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return out


def parse_warc_bytes(data: bytes, record_type: str = "response") -> list[dict]:
    """→ one dict per WARC record of ``record_type``: url, warc_ts
    (µs), payload (html bytes for ``response``, utf-8 text bytes for
    ``conversion``/WET)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") != record_type:
            continue
        if record_type == "response":
            # HTTP response payload: strip the status/header block
            http_end = body.find(_CRLF2)
            body = body[http_end + 4 :] if http_end >= 0 else body
        # conversion (WET) payloads carry the extracted text directly
        ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        dt = datetime.fromisoformat(ts.replace("Z", "+00:00")).astimezone(timezone.utc)
        rows.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": int(dt.timestamp() * 1_000_000),
                "html": body,
            }
        )
    return rows


def read_warc(paths) -> "ray.data.Dataset":
    """WARC file(s) → Dataset with the pages schema (url, warc_ts, html)."""
    return _read_records(paths, "response", "html", pa.binary())


def read_wet(paths) -> "ray.data.Dataset":
    """WET file(s) (Common Crawl extracted text; WARC ``conversion``
    records) → Dataset (url, warc_ts, text).  The text column feeds the
    post-extraction pipeline stages directly — langid, perplexity,
    quality rules, dedup — skipping the html extract stage."""
    return _read_records(paths, "conversion", "text", pa.string())


def _read_records(paths, record_type: str, col: str, col_type) -> "ray.data.Dataset":
    files = [str(p) for p in (paths if isinstance(paths, (list, tuple)) else [paths])]
    raw = ray.data.read_binary_files(files)

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, bodies = [], [], []
        for data in batch.column("bytes").to_pylist():
            for row in parse_warc_bytes(data, record_type):
                urls.append(row["url"])
                tss.append(row["warc_ts"])
                bodies.append(row["html"])
        if col_type == pa.string():
            bodies = [b.decode("utf8", "replace") for b in bodies]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                col: pa.array(bodies, col_type),
            }
        )

    return raw.map_batches(parse, batch_format="pyarrow")


def write_warc(table: pa.Table, out_path, compress: bool = False) -> None:
    """Pages-shaped Arrow table → a WARC/1.0 file (test fixture writer;
    the inverse of :func:`read_warc`)."""
    chunks: list[bytes] = []
    for i in range(len(table)):
        url = table.column("url")[i].as_py()
        ts = table.column("warc_ts")[i].as_py()
        html = table.column("html")[i].as_py() or b""
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        iso = ts.replace(tzinfo=timezone.utc).isoformat().replace("+00:00", "Z")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
        ).encode("latin-1")
        chunks.append(hdr + b"\r\n" + http + b"\r\n\r\n")
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(out_path, "wb") as f:
        f.write(blob)


def write_wet(table: pa.Table, out_path, compress: bool = False) -> None:
    """(url, warc_ts, text) Arrow table → a WET file (WARC/1.0
    ``conversion`` records; test fixture writer, the inverse of
    :func:`read_wet`)."""
    chunks: list[bytes] = []
    for i in range(len(table)):
        url = table.column("url")[i].as_py()
        ts = table.column("warc_ts")[i].as_py()
        body = (table.column("text")[i].as_py() or "").encode("utf8")
        iso = ts.replace(tzinfo=timezone.utc).isoformat().replace("+00:00", "Z")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Content-Type: text/plain\r\n"
        ).encode("latin-1")
        chunks.append(hdr + b"\r\n" + body + b"\r\n\r\n")
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(out_path, "wb") as f:
        f.write(blob)
