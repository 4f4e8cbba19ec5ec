"""Sharded in-cluster vector store (the reference's Redis-backed
KeyedVectors analog, wrappers.py:20-125, re-expressed as Ray actors).

The registry's ``FileVectorModel`` / per-actor ``ray.put`` broadcast is
right whenever the vector table fits a node's RAM.  This module is the
story for the case it doesn't: the table is hash-sharded across N
lightweight actors (each holding ~1/N of the keys), and batch stages
look vectors up with ONE round trip per shard per batch — the same
access pattern the reference gets from a Redis cluster, without leaving
the Ray cluster.

Scale shape:
- memory: each shard holds |table|/N rows; N scales with the table,
  not the query load.
- lookup: a batch of K keys costs at most ``min(N, K)`` RPCs (keys are
  grouped by shard first, one ``get_many`` per shard, results
  reassembled in key order).  Misses return the zero vector and are
  reported, mirroring gensim's OOV contract.
- placement: shards are plain actors — Ray spreads them across nodes;
  a shard is CPU-idle between lookups (num_cpus=0.1) so they don't
  steal slots from the data plane.

Determinism: shard assignment is the splitmix64 hash of the utf-8 key —
stable across processes and sessions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from textpipe_ray.functions.strhash import hash64_mixed


def _key_shard(keys: list[str], num_shards: int) -> np.ndarray:
    """Stable shard id per key — the vectorized avalanched hash from
    functions/strhash.py (process-independent, zero per-key Python)."""
    return (hash64_mixed(pa.array(keys, pa.string())) % np.uint64(num_shards)).astype(
        np.int64
    )


@ray.remote(num_cpus=0.1)
class _VectorShard:
    """One shard: a plain dict slice, loaded once, read-only after."""

    def __init__(self, dim: int):
        self._dim = dim
        self._vecs: dict[str, np.ndarray] = {}

    def put_many(self, items: dict[str, list[float]]) -> int:
        for k, v in items.items():
            self._vecs[k] = np.asarray(v, dtype=np.float64)
        return len(self._vecs)

    def get_many(self, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """→ (K×dim matrix with zero rows for misses, K hit mask)."""
        out = np.zeros((len(keys), self._dim), dtype=np.float64)
        hit = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            v = self._vecs.get(k)
            if v is not None:
                out[i] = v
                hit[i] = True
        return out, hit

    def size(self) -> int:
        return len(self._vecs)


class ShardedVectorStore:
    """Handle object — cheap to serialize into map_batches closures
    (it carries only actor handles + dim)."""

    def __init__(self, shards: list, dim: int):
        self._shards = shards
        self.dim = dim
        self.num_shards = len(shards)

    @classmethod
    def from_items(
        cls, items: dict[str, list[float]], dim: int, num_shards: int = 4
    ) -> "ShardedVectorStore":
        shards = [_VectorShard.remote(dim) for _ in range(num_shards)]
        keys = list(items)
        sid = _key_shard(keys, num_shards)
        groups: list[dict] = [{} for _ in range(num_shards)]
        for k, s in zip(keys, sid):
            groups[int(s)][k] = items[k]
        ray.get(
            [shards[s].put_many.remote(groups[s]) for s in range(num_shards) if groups[s]]
        )
        return cls(shards, dim)

    def lookup(self, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Batched lookup: → (K×dim matrix, K hit mask), zero rows for
        misses.  One get_many per TOUCHED shard, results scattered back
        into key order."""
        if not keys:
            return np.zeros((0, self.dim), dtype=np.float64), np.zeros(0, dtype=bool)
        sid = _key_shard(keys, self.num_shards)
        out = np.zeros((len(keys), self.dim), dtype=np.float64)
        hit = np.zeros(len(keys), dtype=bool)
        touched = np.unique(sid)
        futs, idxs = [], []
        for s in touched:
            idx = np.flatnonzero(sid == s)
            idxs.append(idx)
            futs.append(self._shards[s].get_many.remote([keys[i] for i in idx]))
        for idx, (mat, h) in zip(idxs, ray.get(futs)):
            out[idx] = mat
            hit[idx] = h
        return out, hit

    def total_size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self._shards])))
