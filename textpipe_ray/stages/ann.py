"""Approximate-nearest-neighbor stages over an embedding column.

Two tiers (SURVEY.md §2.7-adjacent; new-engine training-data ops):

- brute-force cosine top-k (``pipelines/queries.q_ann_topk``): query
  matrix broadcast once via ``ray.put``, one float64 matmul per batch,
  global per-query top-k via groupby — the exact baseline, O(N·Q).
- IVF (inverted-file) top-k (:func:`ann_ivf_topk`): k-means centroids
  fit on a bounded sample, every vector assigned to its nearest
  centroid in one streaming pass, queries probe only their ``nprobe``
  closest cells — the scale path: per-batch work drops to the probed
  fraction, and the same partition-by-centroid layout shards a 100 TB
  corpus into co-located IVF cells (write partitioned by ``centroid``
  → a query touches nprobe/num_centroids of the data).

Determinism: k-means seeds and sample bounds are fixed; recall vs the
brute-force baseline is asserted in tests (not exact by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of integer ids (splitmix64-style)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * _MIX1
        h ^= h >> np.uint64(30)
        h *= _MIX2
        h ^= h >> np.uint64(31)
    return h


def _uniform_sample(
    ds: "ray.data.Dataset", sample_size: int, id_col: str, embedding_col: str
) -> np.ndarray:
    """Deterministic uniform sample of ``sample_size`` embeddings,
    spread across the WHOLE dataset: keep rows whose id-hash falls
    under ``sample_size / n`` of the hash space, then cut to the
    ``sample_size`` smallest hashes.

    ``ds.limit(sample_size)`` (the round-2 implementation) takes the
    first blocks — real corpora are written clustered by
    source/lang/crawl, so centroids fit on one slice of the
    distribution and IVF recall collapses exactly at scale.  The
    hash-threshold filter is one streaming pass (no shuffle) and the
    driver holds only ~1.25×sample_size candidate rows regardless of
    corpus size."""
    n = ds.count()
    if n is None or n <= sample_size:
        rows = ds.take_all()
        return np.array([r[embedding_col] for r in rows], dtype=np.float64)
    # 1.25× overshoot so the S-smallest cut almost surely has S rows
    # (binomial tail); deterministic either way
    thresh = np.uint64(min(int(2**64 - 1), int(2**64 * sample_size / n * 1.25)))

    def filt(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.select([id_col, embedding_col])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        keep = _id_hash(ids) < thresh
        return batch.select([id_col, embedding_col]).filter(pa.array(keep))

    cand = ds.map_batches(filt, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: int(_id_hash(np.array([r[id_col]], dtype=np.int64))[0]))
    cand = cand[:sample_size]
    return np.array([r[embedding_col] for r in cand], dtype=np.float64)


def _kmeans(sample: np.ndarray, num_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd's iterations on the (bounded) sample — runs on the
    driver in milliseconds; the distributed work is the assignment."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(num_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ann_ivf_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    num_centroids: int = 32,
    nprobe: int = 8,
    sample_size: int = 2048,
    kmeans_iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """IVF-bucketed cosine top-k: (query_id, neighbor_id, rank, cos).

    A vector is scored against a query only when its IVF cell is among
    the query's ``nprobe`` nearest centroids, so each batch computes a
    masked matmul over the probed subset instead of the full Q columns.
    Centroids + query matrix + probe sets ship once (``ray.put``), not
    per batch."""
    sample = _uniform_sample(ds, sample_size, id_col, embedding_col)
    cents = _kmeans(sample, num_centroids, kmeans_iters, seed)

    qmat = np.asarray(query_mat, dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    # per-query probe set: nprobe nearest centroids by euclidean distance
    qd = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (Q, C)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    # probe_mask[c, j] = does query j probe centroid c
    probe_mask = np.zeros((len(cents), len(qmat)), dtype=bool)
    for j in range(len(qmat)):
        probe_mask[probe[j], j] = True
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, qnorm, cents, probe_mask))

    def score(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qnorm_, cents_, pmask_ = ray.get(ref)
        if len(batch) == 0:  # empty block: np.array([]) is 1-D → matmul breaks
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        d = ((emb[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)  # (B,)
        norms = np.sqrt((emb * emb).sum(axis=1))
        visible = pmask_[cell]  # (B, Q): vector's cell probed by query?
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            keep = visible[:, j] & (ids != qid)
            # similarity computed ONLY for the probed subset — this is
            # the IVF saving (the brute-force baseline does the full
            # B×Q matmul); work here is O(|probed| · dim) per query
            sub = emb[keep]
            sims_j = (sub @ qmat_[j]) / (norms[keep] * qnorm_[j])
            out_q.append(np.full(int(keep.sum()), qid, dtype=np.int64))
            out_n.append(ids[keep])
            out_s.append(sims_j)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")

    # rank and emit the cosine QUANTIZED to floor(cos*1e9): BLAS picks
    # different accumulation blockings for different batch shapes, so
    # raw doubles drift by ~1 ulp across parallelism levels — quantized
    # output is bit-stable run-to-run (golden-oracle requirement) and
    # the neighbor_id tie-break decides near-equal ranks
    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(
            cos_q=np.floor(group["cos"].to_numpy() * 1e9).astype(np.int64)
        )
        g = g.sort_values(["cos_q", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank", "cos_q"]]

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")
