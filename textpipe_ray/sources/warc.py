"""Minimal WARC source: Common Crawl's native wire format → the
north-rule pages schema ``(url, warc_ts, html, text?, lang?)``.

Parses WARC/1.0 ``response`` records (the subset Common Crawl WET/WARC
dumps use): each record is a header block terminated by CRLFCRLF, a
payload of exactly ``Content-Length`` bytes, then CRLFCRLF.  HTTP
response payloads have their own header block stripped to reach the
body.  ``.gz`` members are supported via whole-file gunzip (Common
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


def parse_warc_bytes(data: bytes) -> list[dict]:
    """→ one dict per WARC *response* record: url, warc_ts (µs), html."""
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
        if headers.get("warc-type") != "response":
            continue
        # HTTP response payload: strip the status/header block
        http_end = body.find(_CRLF2)
        html = body[http_end + 4 :] if http_end >= 0 else body
        ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        dt = datetime.fromisoformat(ts.replace("Z", "+00:00")).astimezone(timezone.utc)
        rows.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": int(dt.timestamp() * 1_000_000),
                "html": html,
            }
        )
    return rows


def read_warc(paths) -> "ray.data.Dataset":
    """WARC file(s) → Dataset with the pages schema (url, warc_ts, html)."""
    files = [str(p) for p in (paths if isinstance(paths, (list, tuple)) else [paths])]
    raw = ray.data.read_binary_files(files)

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for data in batch.column("bytes").to_pylist():
            for row in parse_warc_bytes(data):
                urls.append(row["url"])
                tss.append(row["warc_ts"])
                htmls.append(row["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
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
