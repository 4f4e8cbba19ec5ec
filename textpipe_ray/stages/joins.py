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


def attach_pair_sides(
    pairs: "ray.data.Dataset",
    extra_types: dict[str, "pa.DataType"],
    lookup: "ray.data.Dataset",
    lookup_key: str,
    value_col: str,
    value_type: "pa.DataType",
    num_parts: int = 32,
    dedup_sides: bool = True,
    combine_lookup: str | None = None,
) -> "ray.data.Dataset":
    """ONE exchange that attaches a per-doc lookup value to BOTH sides
    of every (id_a, id_b) pair: each pair row is emitted twice (keyed by
    ``id_a`` with ``side=0`` and by ``id_b`` with ``side=1``), unioned
    with the lookup table, hash-partitioned on the key, and resolved
    with one vectorized ``searchsorted`` per partition.

    ``combine_lookup="sum"`` accepts a lookup table of PARTIAL numeric
    counts (several rows per key, e.g. per-batch partial sizes) and sums
    them per key before attaching — correct because every partial of a
    key hashes to the same partition, and it saves the separate
    aggregation exchange the lookup would otherwise need.

    Output rows: ``id_a, id_b, <extra cols>, side, <value_col>, __pp``
    where ``__pp`` is a pair-hash partition column — the caller follows
    with ``groupby("__pp").map_groups(combine)`` to bring a pair's two
    sides back together (the second and final exchange).  With
    ``dedup_sides`` every duplicate (pair, side) occurrence is collapsed
    before the value attaches, so the pair exchange ships exactly two
    value copies per unique pair.

    This is how the dedup verify path avoids both a driver-side
    broadcast of corpus-derived state AND a second full exchange of the
    lookup table (two sequential single-side joins would ship it twice).
    Sides whose key is missing from the lookup are dropped (inner)."""

    def explode_sides(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a"), dtype=np.int64)
        b = np.asarray(batch.column("id_b"), dtype=np.int64)
        key = np.concatenate([a, b])
        cols: dict[str, object] = {
            "id_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "id_b": pa.array(np.concatenate([b, b]), pa.int64()),
        }
        for name, typ in extra_types.items():
            col = batch.column(name).cast(typ)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = pa.concat_arrays([col, col])
        cols["side"] = pa.array(
            np.concatenate([np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]), pa.int8()
        )
        cols[value_col] = pa.nulls(2 * len(a), value_type)
        cols["__key"] = pa.array(key, pa.int64())
        cols["__kind"] = pa.array(np.ones(2 * len(a), dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(_hash_part(key, num_parts), pa.int32())
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch.column(lookup_key), dtype=np.int64)
        n = len(batch)
        cols = {
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
        }
        for name, typ in extra_types.items():
            cols[name] = pa.nulls(n, typ)
        cols["side"] = pa.nulls(n, pa.int8())
        cols[value_col] = batch.column(value_col).cast(value_type)
        cols["__key"] = pa.array(key, pa.int64())
        cols["__kind"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        cols["__jp"] = pa.array(_hash_part(key, num_parts), pa.int32())
        return pa.table(cols)

    out_fields = (
        ["id_a", "id_b"] + list(extra_types) + ["side", value_col, "__pp"]
    )

    def _empty() -> pa.Table:
        types = {
            "id_a": pa.int64(),
            "id_b": pa.int64(),
            **extra_types,
            "side": pa.int8(),
            value_col: value_type,
            "__pp": pa.int32(),
        }
        return pa.table({n: pa.array([], types[n]) for n in out_fields})

    def resolve(t: pa.Table) -> pa.Table:
        kind = np.asarray(t.column("__kind"))
        lk = t.filter(pa.array(kind == 0))
        rw = t.filter(pa.array(kind == 1))
        if len(rw) == 0 or len(lk) == 0:
            return _empty()
        a = np.asarray(rw.column("id_a"), dtype=np.int64)
        b = np.asarray(rw.column("id_b"), dtype=np.int64)
        side = np.asarray(rw.column("side"), dtype=np.int8)
        if dedup_sides and len(rw) > 1:
            # first occurrence of each (id_a, id_b, side) — all copies of
            # one side hash here, so this local dedup is globally complete
            order = np.lexsort((side, b, a))
            sa, sb, ss = a[order], b[order], side[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]) | (ss[1:] != ss[:-1])
            keep = np.sort(order[first])
            if len(keep) < len(rw):
                rw = rw.take(pa.array(keep, pa.int64()))
                a, b = a[keep], b[keep]
        rkeys = np.asarray(rw.column("__key"), dtype=np.int64)
        lkeys = np.asarray(lk.column("__key"), dtype=np.int64)
        if combine_lookup == "sum":
            sorted_keys, inv = np.unique(lkeys, return_inverse=True)
            sums = np.bincount(
                inv, weights=np.asarray(lk.column(value_col), dtype=np.float64)
            ).astype(np.int64)
            pos = np.minimum(np.searchsorted(sorted_keys, rkeys), len(sorted_keys) - 1)
            matched = sorted_keys[pos] == rkeys
            if not matched.all():
                rw = rw.filter(pa.array(matched))
                pos = pos[matched]
                a, b = a[matched], b[matched]
            attached = pa.array(sums[pos], value_type)
        else:
            lorder = np.argsort(lkeys, kind="stable")
            sorted_keys = lkeys[lorder]
            pos = np.minimum(np.searchsorted(sorted_keys, rkeys), len(lorder) - 1)
            take_idx = lorder[pos]
            matched = sorted_keys[pos] == rkeys
            if not matched.all():
                rw = rw.filter(pa.array(matched))
                take_idx = take_idx[matched]
                a, b = a[matched], b[matched]
            vcol = lk.column(value_col)
            if isinstance(vcol, pa.ChunkedArray):
                vcol = vcol.combine_chunks()
            attached = vcol.take(pa.array(take_idx, pa.int64()))
        pair_hash = (a.astype(np.uint64) * _GOLDEN) ^ b.astype(np.uint64)
        cols = {
            "id_a": rw.column("id_a"),
            "id_b": rw.column("id_b"),
            **{n: rw.column(n) for n in extra_types},
            "side": rw.column("side"),
            value_col: attached,
            "__pp": pa.array((pair_hash % np.uint64(num_parts)).astype(np.int32), pa.int32()),
        }
        return pa.table(cols)

    both = pairs.map_batches(explode_sides, batch_format="pyarrow").union(
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
    num_parts: int = 32,
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
