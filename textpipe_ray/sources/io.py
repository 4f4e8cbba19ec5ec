"""Multi-format sources/sinks for the engine's tables.

The reference has no I/O layer at all (SURVEY.md §2.3) — every
source/sink here is new surface built on Ray Data's native readers so
each format streams block-by-block through the same downstream
pipeline:

- **parquet** — the primary format (column pruning pushed to the read).
- **jsonl** — newline-delimited JSON; binary columns (``html``) travel
  base64-encoded and are decoded in one vectorized post-read stage.
- **csv** — for flat text tables (no binary columns).

Schema discipline: whatever the wire format, the decoded Dataset
presents the SAME Arrow schema as the parquet path (asserted in
tests/test_sources_io.py), so pipelines are format-agnostic.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from textpipe_ray import schema as S

PAGES_COLUMNS = (S.URL, S.WARC_TS, S.HTML, "text", S.LANG)


def _paths(p) -> list[str]:
    return [str(x) for x in (p if isinstance(p, (list, tuple)) else [p])]


def read_documents(paths, fmt: str = "parquet", columns: list[str] | None = None):
    """Read a flat text table (``documents``-shaped) in any format."""
    if fmt == "parquet":
        return ray.data.read_parquet(_paths(paths), columns=columns)
    if fmt == "jsonl":
        ds = ray.data.read_json(_paths(paths))
    elif fmt == "csv":
        ds = ray.data.read_csv(_paths(paths))
    else:
        raise ValueError(f"unknown format: {fmt!r}")
    # json/csv readers have no column pushdown — prune in the first
    # stage so only requested columns flow downstream
    return ds.select_columns(columns) if columns else ds


def _decode_pages_batch(batch: pa.Table) -> pa.Table:
    """base64 html → binary; epoch-micros warc_ts → timestamp[us]."""
    if S.HTML in batch.column_names and pa.types.is_string(batch.schema.field(S.HTML).type):
        html = pa.array(
            [base64.b64decode(h) if h is not None else None for h in batch.column(S.HTML).to_pylist()],
            pa.binary(),
        )
        batch = batch.set_column(batch.column_names.index(S.HTML), S.HTML, html)
    ts_field = batch.schema.field(S.WARC_TS) if S.WARC_TS in batch.column_names else None
    if ts_field is not None and pa.types.is_integer(ts_field.type):
        ts = pc.cast(batch.column(S.WARC_TS), pa.timestamp("us"))
        batch = batch.set_column(batch.column_names.index(S.WARC_TS), S.WARC_TS, ts)
    return batch


def read_pages_any(paths, fmt: str = "parquet", columns: list[str] | None = None):
    """Read the north-rule pages table from parquet or jsonl with an
    identical output schema (jsonl carries ``html`` base64-encoded and
    ``warc_ts`` as epoch microseconds)."""
    if fmt == "parquet":
        return ray.data.read_parquet(_paths(paths), columns=columns)
    if fmt != "jsonl":
        raise ValueError(f"pages tables support parquet/jsonl, not {fmt!r}")
    ds = ray.data.read_json(_paths(paths))
    if columns:
        ds = ds.select_columns(columns)
    return ds.map_batches(_decode_pages_batch, batch_format="pyarrow")


def write_pages_jsonl(table: pa.Table, out_path) -> None:
    """Sink a pages-shaped Arrow table as JSONL (html → base64,
    warc_ts → epoch micros); the inverse of :func:`read_pages_any`."""
    import json

    cols = {name: table.column(name).to_pylist() for name in table.column_names}
    n = len(table)
    with open(out_path, "w", encoding="utf8") as f:
        for i in range(n):
            row = {}
            for name in table.column_names:
                v = cols[name][i]
                if name == S.HTML and v is not None:
                    v = base64.b64encode(v).decode("ascii")
                elif name == S.WARC_TS and v is not None:
                    if hasattr(v, "timestamp"):
                        # Arrow timestamps are UTC-naive; .timestamp() on a
                        # naive datetime would interpret it in the LOCAL
                        # zone — pin UTC explicitly so the roundtrip holds
                        # on any host timezone
                        from datetime import timezone as _tz

                        v = int(v.replace(tzinfo=_tz.utc).timestamp() * 1_000_000)
                    else:
                        v = int(v)
                row[name] = v
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
