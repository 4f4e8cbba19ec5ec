"""Co-partitioned lookup joins (no driver materialization, no broadcast).

The scale-path replacement for ``ray.put``-broadcast lookups: when the
lookup side is corpus-derived (signatures, per-doc sizes, document
frequencies) it grows with the corpus and must never funnel through the
driver.  Instead both sides are tagged, unioned, hash-partitioned on
the join key, and resolved with one vectorized ``searchsorted`` (or
pandas merge for string keys) per partition — the same exchange shape
as a shuffle join, with all per-row work in C.

Used by ``stages/dedup.py`` (signature verify, shingle-size attach) and
``pipelines/queries.py`` (document-frequency attach for TF-IDF); the
partitioning assumption is only that all rows of one key hash to one
partition — no key ever needs to fit anywhere in particular, so skew is
bounded by the hottest single key, not by table size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _hash_part(keys: np.ndarray, num_parts: int) -> np.ndarray:
    return ((keys.astype(np.uint64) * _GOLDEN) % np.uint64(num_parts)).astype(np.int32)


def copartition_attach(
    rows: "ray.data.Dataset",
    row_key: str,
    row_types: dict[str, "pa.DataType"],
    lookup: "ray.data.Dataset",
    lookup_key: str,
    value_types: dict[str, "pa.DataType"],
    out_names: dict[str, str] | None = None,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Attach ``value_types`` columns from ``lookup`` to ``rows`` by
    int64 equality ``rows[row_key] == lookup[lookup_key]`` (inner join —
    rows with no match are dropped).

    ``row_types`` / ``value_types`` are explicit name→``pa.DataType``
    maps so no ``Dataset.schema()`` call (which can force execution) is
    needed; ``out_names`` optionally renames attached columns (e.g. the
    same signature table attached twice as ``sig_a`` then ``sig_b``).
    """
    out_names = out_names or {v: v for v in value_types}
    val_out = [(v, out_names[v]) for v in value_types]

    def tag_rows(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch.column(row_key), dtype=np.int64)
        cols: dict[str, object] = {}
        for name, typ in row_types.items():
            cols[name] = batch.column(name).cast(typ)
        for vname, oname in val_out:
            cols[oname] = pa.nulls(len(batch), value_types[vname])
        cols["__key"] = pa.array(key, pa.int64())
        cols["__kind"] = pa.array(np.ones(len(batch), dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(_hash_part(key, num_parts), pa.int32())
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch.column(lookup_key), dtype=np.int64)
        cols = {}
        for name, typ in row_types.items():
            cols[name] = pa.nulls(len(batch), typ)
        for vname, oname in val_out:
            cols[oname] = batch.column(vname).cast(value_types[vname])
        cols["__key"] = pa.array(key, pa.int64())
        cols["__kind"] = pa.array(np.zeros(len(batch), dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(_hash_part(key, num_parts), pa.int32())
        return pa.table(cols)

    def _empty() -> pa.Table:
        cols = {n: pa.array([], t) for n, t in row_types.items()}
        for vname, oname in val_out:
            cols[oname] = pa.array([], value_types[vname])
        return pa.table(cols)

    def resolve(t: pa.Table) -> pa.Table:
        kind = np.asarray(t.column("__kind"))
        lk = t.filter(pa.array(kind == 0))
        rw = t.filter(pa.array(kind == 1))
        if len(rw) == 0 or len(lk) == 0:
            return _empty()
        lkeys = np.asarray(lk.column("__key"), dtype=np.int64)
        order = np.argsort(lkeys, kind="stable")
        sorted_keys = lkeys[order]
        rkeys = np.asarray(rw.column("__key"), dtype=np.int64)
        pos = np.minimum(np.searchsorted(sorted_keys, rkeys), len(order) - 1)
        take_idx = order[pos]
        matched = sorted_keys[pos] == rkeys
        if not matched.all():  # inner join: drop rows without a match
            rw = rw.filter(pa.array(matched))
            take_idx = take_idx[matched]
        take = pa.array(take_idx, pa.int64())
        cols = {n: rw.column(n) for n in row_types}
        for _, oname in val_out:
            col = lk.column(oname)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[oname] = col.take(take)
        return pa.table(cols)

    both = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )
    return both.groupby("__jp").map_groups(resolve, batch_format="pyarrow")


def copartition_merge_str(
    rows: "ray.data.Dataset",
    row_key: str,
    row_types: dict[str, "pa.DataType"],
    lookup: "ray.data.Dataset",
    lookup_key: str,
    value_types: dict[str, "pa.DataType"],
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """String-key variant: attach ``value_types`` columns from
    ``lookup`` to ``rows`` by exact string equality on the key (inner
    join), via a blake2b-hash partition + per-partition pandas merge on
    the REAL string key (the 64-bit hash only routes; equality decides —
    no collision risk).  Output columns: ``row_types`` + ``value_types``
    (``row_key`` must be listed in ``row_types`` if wanted)."""
    import hashlib as _hashlib

    row_cols = list(row_types)
    value_cols = list(value_types)

    def part_of(strs: list) -> np.ndarray:
        return np.asarray(
            [
                int.from_bytes(
                    _hashlib.blake2b((s or "").encode("utf8"), digest_size=4).digest(), "little"
                )
                % num_parts
                for s in strs
            ],
            dtype=np.int32,
        )

    def tag_rows(batch: pa.Table) -> pa.Table:
        keys = batch.column(row_key).to_pylist()
        cols = {name: batch.column(name).cast(typ) for name, typ in row_types.items()}
        for v, typ in value_types.items():
            cols[v] = pa.nulls(len(batch), typ)
        cols["__sk"] = batch.column(row_key).cast(pa.string())
        cols["__kind"] = pa.array(np.ones(len(batch), dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(part_of(keys), pa.int32())
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        keys = batch.column(lookup_key).to_pylist()
        cols = {name: pa.nulls(len(batch), typ) for name, typ in row_types.items()}
        for v, typ in value_types.items():
            cols[v] = batch.column(v).cast(typ)
        cols["__sk"] = batch.column(lookup_key).cast(pa.string())
        cols["__kind"] = pa.array(np.zeros(len(batch), dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(part_of(keys), pa.int32())
        return pa.table(cols)

    def resolve(t: pd.DataFrame) -> pd.DataFrame:
        lk = t[t["__kind"] == 0]
        rw = t[t["__kind"] == 1]
        if len(rw) == 0 or len(lk) == 0:
            return pd.DataFrame(columns=row_cols + value_cols)
        m = rw[row_cols + ["__sk"]].merge(
            lk[["__sk"] + value_cols], on="__sk", how="inner", sort=False
        )
        return m[row_cols + value_cols]

    both = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )
    return both.groupby("__jp").map_groups(resolve, batch_format="pandas")
