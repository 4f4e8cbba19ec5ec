"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-LSH.

All are Dataset→Dataset compositions of vectorized ``map_batches`` +
``groupby`` shuffles, built around the engine's datasketch-compatible
MinHash kernel (functions/minhash.py; reference semantics
doc.py:456-497 — ``Doc.similarity`` is the verify kernel, LSH banding
is the candidate generator, SURVEY.md §2.7).

Scale notes: the LSH band explosion emits one small row per (doc,
band); the groupby shuffles band rows, never documents.  In the demo
``near_dup_minhash`` the signature rides along in the band rows for
in-group verification — at 100 TB you would instead emit bare
``(band_hash, doc_id)`` rows and join candidates back to a signature
table bucketed by ``hash(doc_id)`` (one extra co-partitioned join);
the shape of the shuffle is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from textpipe_ray.functions.minhash import (
    DEFAULT_NUM_PERM,
    jaccard,
    lsh_band_hashes,
    minhash_signature,
    simhash64,
)
from textpipe_ray.functions.tokenize import words


def _tokenize(text: str) -> list[str]:
    return [w for w, _ in words(text or "")]


def minhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Append the 128-perm minhash signature as ``list<uint64>``."""
    sigs = [minhash_signature(_tokenize(t)) for t in batch.column(text_col).to_pylist()]
    arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
    return batch.append_column("minhash", arr)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a 64-bit SimHash (stored as int64 bit-pattern)."""
    def to_i64(h: int) -> int:  # reinterpret the uint64 bit pattern as int64
        return h - (1 << 64) if h >= (1 << 63) else h

    hashes = [to_i64(simhash64(_tokenize(t))) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(hashes, pa.int64()))


def dedup_exact(ds: "ray.data.Dataset", key_col: str, order_col: str) -> "ray.data.Dataset":
    """Keep the first row (min ``order_col``) per ``key_col`` — a
    hash-partitioned groupby, no driver-side state."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key_col).map_groups(first, batch_format="pandas")


def near_dup_minhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 32,
    threshold: float = 0.7,
    shingle_size: int | None = None,
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate pairs: shingle→minhash→band→bucket
    groupby→within-bucket verify.  Returns (id_a, id_b, jaccard_est)
    with id_a < id_b, deduplicated across buckets.

    ``shingle_size=None`` hashes word tokens (the reference's
    ``Doc.find_minhash`` semantics, doc.py:469-478); an int switches to
    char n-gram shingles, which discriminate much better between
    documents that share vocabulary but not phrasing."""
    from textpipe_ray.functions.minhash import char_ngrams

    def feats(t: str) -> list[str]:
        if shingle_size is None:
            return _tokenize(t)
        return list(char_ngrams(t or "", shingle_size))

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(feats(t))
            for b, h in enumerate(lsh_band_hashes(sig, num_bands)):
                out_id.append(i)
                out_band.append(b)
                out_hash.append(h)
                out_sig.append(sig.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_est": []}).astype(
                {"id_a": "int64", "id_b": "int64", "jaccard_est": "float64"}
            )
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = [np.asarray(s, dtype=np.uint64) for s in g["sig"]]
        a_out, b_out, j_out = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                j = jaccard(sigs[x], sigs[y])
                if j >= threshold:
                    a_out.append(ids[x])
                    b_out.append(ids[y])
                    j_out.append(j)
        return pd.DataFrame(
            {
                "id_a": pd.array(a_out, dtype="int64"),
                "id_b": pd.array(b_out, dtype="int64"),
                "jaccard_est": pd.array(j_out, dtype="float64"),
            }
        )

    pairs = (
        ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair found in k bands appears k times — dedupe
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def near_dup_embeddings(
    ds: "ray.data.Dataset",
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 10,
    num_tables: int = 4,
    threshold: float = 0.9,
    dim: int = 64,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Embedding near-duplicates via random-hyperplane (SimHash) LSH:
    bucket by the sign pattern of ``num_planes`` seeded projections,
    verify cosine within buckets.  ``num_tables`` independent plane
    sets (OR-amplification) recover pairs that a single near-zero
    projection would split; duplicate pairs across tables are collapsed
    by a final groupby.  The scale path for cosine dedup — buckets
    shrink candidate pairs from O(n²) to near-linear."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, dim, num_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        ids = np.asarray(batch.column(id_col))
        embs = batch.column(embedding_col)
        if hasattr(embs, "combine_chunks"):
            embs = embs.combine_chunks()
        out_id, out_bucket = [], []
        for t in range(num_tables):
            bits = (emb @ planes[t]) > 0  # (B, P)
            keys = (bits.astype(np.uint64) << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
            out_id.append(ids)
            # table id in the high bits keeps tables' buckets disjoint
            out_bucket.append(keys.astype(np.int64) + (t << num_planes))
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
                "emb": pa.concat_arrays([embs] * num_tables),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        emb = np.array([np.asarray(e, dtype=np.float64) for e in g["emb"]])
        norms = np.sqrt((emb * emb).sum(axis=1))
        sims = (emb @ emb.T) / (norms[:, None] * norms[None, :])
        xs, ys = np.triu_indices(len(ids), k=1)
        mask = sims[xs, ys] >= threshold
        return pd.DataFrame(
            {
                "id_a": pd.array(ids[xs[mask]], dtype="int64"),
                "id_b": pd.array(ids[ys[mask]], dtype="int64"),
                "cosine": pd.array(sims[xs, ys][mask], dtype="float64"),
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    # a pair can surface from several tables/buckets — collapse
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
