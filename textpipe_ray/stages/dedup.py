"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-LSH.

All are Dataset→Dataset compositions of vectorized ``map_batches`` +
``groupby`` shuffles, built around the engine's datasketch-compatible
MinHash kernel (functions/minhash.py; reference semantics
doc.py:456-497 — ``Doc.similarity`` is the verify kernel, LSH banding
is the candidate generator, SURVEY.md §2.7).

Scale notes: the LSH band explosion emits one small row per (doc,
band); the groupby shuffles band rows, never documents.  Candidate
pairs are verified by joining them back to the signature table via
co-partitioned joins on ``hash(doc_id)``
(:mod:`textpipe_ray.stages.joins`) — corpus-derived state (signatures,
per-doc shingle counts) never passes through the driver, so every
operator here is bounded by per-partition size, not driver heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from textpipe_ray.functions.minhash import (
    DEFAULT_NUM_PERM,
    jaccard,
    minhash_signature,
    simhash64,
)
from textpipe_ray.functions.tokenize import words


def _tokenize(text: str) -> list[str]:
    return [w for w, _ in words(text or "")]


def _explode_band_rows(batch: pa.Table, num_bands: int):
    """(doc_id, sig) batch → flattened (ids, band_hashes, band_idx)
    arrays of length n·num_bands, via the vectorized matrix band hash
    (functions/minhash.lsh_band_hashes_matrix) — no per-row hashing."""
    from textpipe_ray.functions.minhash import lsh_band_hashes_matrix

    n = len(batch)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.int32)
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    sigs = np.asarray(
        batch.column("sig").combine_chunks().flatten(), dtype=np.uint64
    ).reshape(n, -1)
    bh = lsh_band_hashes_matrix(sigs, num_bands)  # (n, B) int64
    return (
        np.repeat(ids, num_bands),
        bh.reshape(-1),
        np.tile(np.arange(num_bands, dtype=np.int32), n),
    )


def minhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Append the 128-perm minhash signature as ``list<uint64>`` —
    batched kernel: each UNIQUE token across the batch is sha1-hashed
    once, signatures come from one chunked permute+reduceat
    (digest-identical to the per-doc path; parity-tested)."""
    from textpipe_ray.functions.minhash import minhash_signatures_from_token_sets

    doc_tokens = [set(_tokenize(t)) for t in batch.column(text_col).to_pylist()]
    sigs = minhash_signatures_from_token_sets(doc_tokens)
    arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
    return batch.append_column("minhash", arr)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a 64-bit SimHash (stored as int64 bit-pattern)."""
    def to_i64(h: int) -> int:  # reinterpret the uint64 bit pattern as int64
        return h - (1 << 64) if h >= (1 << 63) else h

    hashes = [to_i64(simhash64(_tokenize(t))) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(hashes, pa.int64()))


def dedup_exact(
    ds: "ray.data.Dataset", key_col: str, order_col: str, num_parts: int = 32
) -> "ray.data.Dataset":
    """Keep the first row (min ``order_col``) per ``key_col``.

    Physical plan: hash-partition on a coarse ``hash(key) % num_parts``
    column (each partition holds *all* rows of its keys), then one
    vectorized pandas ``drop_duplicates`` per partition.  This is the
    same exchange as ``groupby(key)`` but avoids Ray's per-group python
    dispatch, which dominates when keys are near-unique."""

    def add_part(batch: pa.Table) -> pa.Table:
        # vectorized partition ids over the Arrow buffer (was a per-row
        # blake2b loop); partition assignment is internal — any stable
        # hash keeps all rows of a key together, results are identical
        from textpipe_ray.functions.strhash import part_ids

        keys = batch.column(key_col)
        if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
            keys = pc.cast(keys, pa.string())
        return batch.append_column(
            "__part", pa.array(part_ids(keys, num_parts), pa.int32())
        )

    def dedupe_partition(part: pd.DataFrame) -> pd.DataFrame:
        out = (
            part.sort_values([key_col, order_col], kind="mergesort")
            .drop_duplicates(key_col, keep="first")
            .drop(columns="__part")
        )
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedupe_partition, batch_format="pandas")
    )


@ray.remote
def _consolidate_sigs(*blocks: pa.Table):
    """Concatenate signature blocks into (sorted_ids, sig_matrix) INSIDE
    a worker task — the driver only ever holds the ObjectRef; verify
    tasks read the arrays zero-copy from the object store (one copy per
    node)."""
    # empty blocks can arrive schema-less — skip them
    blocks = [b for b in blocks if len(b) and "doc_id" in b.column_names]
    ids_list = [np.asarray(b.column("doc_id"), dtype=np.int64) for b in blocks]
    mats = [
        np.asarray(b.column("sig").combine_chunks().flatten(), dtype=np.uint64).reshape(
            len(b), -1
        )
        for b in blocks
    ]
    ids_cat = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
    order = np.argsort(ids_cat)
    mat = np.concatenate(mats)[order] if mats else None
    return ids_cat[order], mat


def _broadcast_verify_pairs(
    candidates: "ray.data.Dataset", sig_ds: "ray.data.Dataset", threshold: float
) -> "ray.data.Dataset":
    """Verify (id_a, id_b) candidate pairs against a broadcast of the
    consolidated signature table → (id_a, id_b, jaccard_est) above
    ``threshold``, cross-partition duplicates collapsed (a pair firing
    in several band buckets verifies to the identical value; the final
    groupby keeps one)."""
    import ray as _ray

    sig_ref = _consolidate_sigs.remote(*sig_ds.to_arrow_refs())

    def bverify(batch: pa.Table) -> pa.Table:
        sorted_ids, sig_mat = _ray.get(sig_ref)
        a = np.asarray(batch.column("id_a"), dtype=np.int64)
        b = np.asarray(batch.column("id_b"), dtype=np.int64)
        if len(a) == 0 or sig_mat is None:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard_est": pa.array([], pa.float64()),
                }
            )
        sa = sig_mat[np.searchsorted(sorted_ids, a)]
        sb = sig_mat[np.searchsorted(sorted_ids, b)]
        j = (sa == sb).mean(axis=1)
        mask = j >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[mask], pa.int64()),
                "id_b": pa.array(b[mask], pa.int64()),
                "jaccard_est": pa.array(j[mask], pa.float64()),
            }
        )

    from ray.data.aggregate import Max as _Max

    return (
        candidates.map_batches(bverify, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(_Max("jaccard_est", alias_name="jaccard_est"))
    )


def near_dup_minhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 32,
    threshold: float = 0.7,
    shingle_size: int | None = None,
    verify_mode: str = "auto",
    broadcast_limit_bytes: int = 1 << 30,
    sig_col: str | None = None,
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate pairs: shingle→minhash→band→bucket
    groupby→within-bucket verify.  Returns (id_a, id_b, jaccard_est)
    with id_a < id_b, deduplicated across buckets.

    ``sig_col`` names a PRECOMPUTED ``list<uint64>`` signature column;
    when given, the signature pass is skipped entirely (the
    shared-read composition of :func:`near_dup_after_exact`).

    ``shingle_size=None`` hashes word tokens with sha1 (the reference's
    ``Doc.find_minhash`` semantics, doc.py:469-478); an int switches to
    utf8-byte n-gram shingles with vectorized rolling hashes — they
    discriminate much better between documents that share vocabulary
    but not phrasing, and hash ~100× faster.

    Run exact dedup FIRST (see :func:`near_dup_after_exact`): a corpus
    with many byte-identical boilerplate docs otherwise forms quadratic
    candidate buckets (k identical docs → k²/2 pairs).

    Physical plan: (1) one pass computes signatures — materialized once
    as DISTRIBUTED blocks in the object store (spillable; never
    collected to the driver); (2) the exchanged band rows carry only
    ``(band, band_hash, doc_id)`` — never the 1 KB signature; (3)
    bucket groupby emits candidate id pairs; (4) candidates verify by
    the classic join-strategy selection, ``verify_mode``:

    * ``"broadcast"`` — the signature table is consolidated into two
      flat arrays INSIDE A WORKER TASK (the driver only ever holds the
      ObjectRef) and read zero-copy from the object store (one copy per
      node) by every verify task; candidates never ship a signature.
      Right whenever the table fits an object store comfortably — the
      candidate set is often 10×+ the corpus (LSH background fire
      rate), so shipping two signatures per candidate through shuffles
      would move far MORE bytes than the table itself.
    * ``"join"`` — the two-exchange pair-side join
      (:func:`textpipe_ray.stages.joins.attach_pair_sides`): one
      exchange co-partitions pair sides with the signature table on
      ``hash(doc_id)``, one brings each pair's two signatures together.
      The only option once signatures outgrow a node's object store
      (10^12 docs → ~1 TB of signatures).
    * ``"auto"`` (default) — broadcast iff ``n_docs × num_perm × 8 ≤
      broadcast_limit_bytes`` (counted on the materialized table's
      metadata, no extra pass).

    Both modes produce identical pair sets (asserted by
    ``tests/test_dedup_stages.py`` against an independent in-process
    reference); neither funnels corpus-derived state through the
    driver."""
    import ray as _ray

    from textpipe_ray.functions.minhash import minhash_signature_shingles
    from textpipe_ray.stages.joins import attach_pair_sides

    def sig_of(t: str) -> np.ndarray:
        if shingle_size is None:
            return minhash_signature(_tokenize(t))
        return minhash_signature_shingles(t or "", shingle_size)

    def compute_sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = [sig_of(t) for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )

    def project_sigs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column(id_col), pa.int64()),
                "sig": batch.column(sig_col).cast(pa.list_(pa.uint64())),
            }
        )

    sig_ds = ds.map_batches(
        project_sigs if sig_col is not None else compute_sigs, batch_format="pyarrow"
    ).materialize()

    num_parts = 32

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, hashes, band_idx = _explode_band_rows(batch, num_bands)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(band_idx, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
                # coarse hash partition: all rows of a bucket land together
                "__part": pa.array(
                    (hashes.astype(np.uint64) % np.uint64(num_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """All within-bucket id pairs for every (band, band_hash) bucket
        in this hash partition — one vectorized pass, python only over
        the (few) buckets with ≥2 members.

        Bucket runs come from adjacency in the (band, band_hash) sort —
        NOT from packing both into one integer, which would truncate the
        64-bit hash and merge distinct buckets (silently dropping their
        pairs)."""
        g = part.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
        band = g["band"].to_numpy()
        bhash = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        n_rows = len(g)
        if n_rows == 0:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        new_run = np.ones(n_rows, dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bhash[1:] != bhash[:-1])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n_rows))
        a_out, b_out = [], []
        for s, k in zip(starts[counts > 1], counts[counts > 1]):
            bucket = ids[s : s + k]
            xs, ys = np.triu_indices(k, k=1)
            a_out.append(bucket[xs])
            b_out.append(bucket[ys])
        if not a_out:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a_cat = np.concatenate(a_out).astype("int64")
        b_cat = np.concatenate(b_out).astype("int64")
        # local dedup: a pair firing in several buckets of THIS partition
        # collapses here; cross-partition duplicates collapse in the
        # pair-side join (dedup_sides)
        order = np.lexsort((b_cat, a_cat))
        a_cat, b_cat = a_cat[order], b_cat[order]
        keep = np.ones(len(a_cat), dtype=bool)
        keep[1:] = (a_cat[1:] != a_cat[:-1]) | (b_cat[1:] != b_cat[:-1])
        return pa.table(
            {"id_a": pa.array(a_cat[keep], pa.int64()), "id_b": pa.array(b_cat[keep], pa.int64())}
        )

    candidates = (
        sig_ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
    )

    if verify_mode == "auto":
        n_docs = sig_ds.count()  # metadata on a materialized dataset
        n_perm = DEFAULT_NUM_PERM
        verify_mode = (
            "broadcast" if n_docs * n_perm * 8 <= broadcast_limit_bytes else "join"
        )

    if verify_mode == "broadcast":
        return _broadcast_verify_pairs(candidates, sig_ds, threshold)

    # "join": exchange 1 attaches each pair side's signature (sig table
    # shipped ONCE, duplicate (pair, side) occurrences from multiple
    # matching bands collapsed in-partition); exchange 2 brings the two
    # sides of a pair together and computes the estimated jaccard
    sided = attach_pair_sides(
        candidates,
        {},
        sig_ds,
        "doc_id",
        "sig",
        pa.list_(pa.uint64()),
        num_parts=num_parts,
    )

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )
        n = len(t)
        if n == 0:
            return empty
        a = np.asarray(t.column("id_a"), dtype=np.int64)
        b = np.asarray(t.column("id_b"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        mat = np.asarray(t.column("sig").combine_chunks().flatten(), dtype=np.uint64).reshape(
            n, -1
        )
        order = np.lexsort((side, b, a))
        a, b, side, mat = a[order], b[order], side[order], mat[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        # a pair needs both sides present (count==2, sides 0 then 1);
        # one-sided pairs mean the id was missing from the sig table
        two = starts[counts == 2]
        ok = (side[two] == 0) & (side[two + 1] == 1)
        two = two[ok]
        if len(two) == 0:
            return empty
        j = (mat[two] == mat[two + 1]).mean(axis=1)
        mask = j >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[two][mask], pa.int64()),
                "id_b": pa.array(b[two][mask], pa.int64()),
                "jaccard_est": pa.array(j[mask], pa.float64()),
            }
        )

    return sided.groupby("__pp").map_groups(combine, batch_format="pyarrow")


def near_dup_after_exact(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    **near_dup_kwargs,
) -> "ray.data.Dataset":
    """The recommended near-dup composition: collapse byte-identical
    docs first (min-id survivor per content hash), THEN MinHash-LSH the
    survivors.  Exact-duplicate families (boilerplate, templates) would
    otherwise each produce k²/2 trivial pairs inside one LSH bucket —
    this keeps the near-dup stage's bucket sizes bounded by real
    near-match density.

    Physical plan (pairs-only fast path): ONE pre-exchange pass over
    the input computes both the exact-dedup md5 (batched,
    functions/strhash.md5_hex) AND the MinHash signature, then projects
    the text away — the documents are read/extracted exactly once and
    the exact-dedup exchange moves (id, 32-char hash, 1 KB signature)
    rows instead of document text.  Trade-off, on purpose: signatures
    are computed for exact-dup losers too (wasted minhash on the dup
    fraction) in exchange for never shipping the text column through an
    all-to-all — at corpus scale the exchange, not the hash kernel, is
    the bottleneck.  Callers that need the surviving DOCUMENTS (not
    just pairs) use :func:`exact_survivors_and_pairs`, which must keep
    the original columns through the exchange."""
    from textpipe_ray.functions.minhash import minhash_signature_shingles
    from textpipe_ray.functions.strhash import md5_hex

    shingle_size = near_dup_kwargs.get("shingle_size")

    def sig_of(t: str) -> np.ndarray:
        if shingle_size is None:
            return minhash_signature(_tokenize(t))
        return minhash_signature_shingles(t or "", shingle_size)

    def hash_sig_project(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        sigs = [sig_of(t) for t in texts.to_pylist()]
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "__content_hash": pa.array(md5_hex(texts), pa.string()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )

    keyed = ds.map_batches(hash_sig_project, batch_format="pyarrow")
    surv = dedup_exact(keyed, "__content_hash", id_col).drop_columns(["__content_hash"])
    return near_dup_minhash(surv, text_col=text_col, id_col=id_col, sig_col="sig", **near_dup_kwargs)


def exact_survivors_and_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    **near_dup_kwargs,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Shared core of the near-dup compositions: (exact-dedup
    survivors, MinHash-LSH pair Dataset over those survivors).  The
    survivors keep every input column, so the exchange necessarily
    carries the text (the standard content-hash dedup shuffle); when
    only the PAIRS are needed, :func:`near_dup_after_exact` projects
    the text away before the exchange instead."""

    def add_hash(batch: pa.Table) -> pa.Table:
        from textpipe_ray.functions.strhash import md5_hex

        return batch.append_column(
            "__content_hash", pa.array(md5_hex(batch.column(text_col)), pa.string())
        )

    survivors = dedup_exact(
        ds.map_batches(add_hash, batch_format="pyarrow"), "__content_hash", id_col
    ).drop_columns(["__content_hash"])
    pairs = near_dup_minhash(survivors, text_col=text_col, id_col=id_col, **near_dup_kwargs)
    return survivors, pairs


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
        if len(batch) == 0:  # empty block: np.array([]) is 1-D → matmul breaks
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "emb": pa.array([], pa.list_(pa.float64())),
                }
            )
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

    def verify(group: pd.DataFrame) -> pa.Table:
        # returns ARROW: the downstream .aggregate() over pandas blocks
        # measured ~10x slower than over arrow blocks (sort-aggregate
        # falls off its vectorized path)
        if len(group) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        emb = np.array([np.asarray(e, dtype=np.float64) for e in g["emb"]])
        norms = np.sqrt((emb * emb).sum(axis=1))
        sims = (emb @ emb.T) / (norms[:, None] * norms[None, :])
        xs, ys = np.triu_indices(len(ids), k=1)
        mask = sims[xs, ys] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[xs[mask]].astype(np.int64), pa.int64()),
                "id_b": pa.array(ids[ys[mask]].astype(np.int64), pa.int64()),
                "cosine": pa.array(sims[xs, ys][mask], pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    # a pair can surface from several tables/buckets — collapse with a
    # vectorized aggregate (cosine of a given pair is identical in every
    # bucket, so Max just picks the one value; per-group map_groups
    # would pay python dispatch per near-unique pair key)
    from ray.data.aggregate import Max as _Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(_Max("cosine", alias_name="cosine"))


# ---------------------------------------------------------------------------
# SimHash near-dup (hamming-ball grouping)
# ---------------------------------------------------------------------------


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for a uint64 array (numpy<2 has no
    ``bitwise_count``): view as bytes, unpack bits, sum per word."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(b).reshape(-1, 64).sum(axis=1)


def near_dup_simhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """SimHash near-duplicate pairs over text: compute the 64-bit
    SimHash per doc, then run :func:`near_dup_fingerprints`."""
    hashed = ds.map_batches(
        simhash_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    return near_dup_fingerprints(
        hashed, id_col=id_col, max_hamming=max_hamming, num_parts=num_parts
    )


def near_dup_fingerprints(
    ds: "ray.data.Dataset",
    fp_col: str = "simhash",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """Near-duplicate pairs over ANY 64-bit fingerprint column (text
    SimHash, image perceptual hash, …): fingerprint → split into
    ``max_hamming + 1`` bit-bands → bucket groupby on (band, band
    bits) → within-bucket hamming verify.  Pigeonhole guarantees every
    pair at distance ≤ ``max_hamming`` agrees exactly on at least one
    band, so recall is 1.0 by construction (unlike MinHash-LSH's
    probabilistic recall).  Returns (id_a, id_b, hamming), id_a < id_b.

    Physical plan mirrors :func:`near_dup_minhash`: the exchange moves
    one small ``(band, band_bits, doc_id, fingerprint)`` row per (doc,
    band) — the 8-byte fingerprint rides along so verification happens
    in-group with no broadcast; the final pair-dedup groupby touches
    only verified pairs."""
    num_bands = max_hamming + 1
    band_width = 64 // num_bands
    mask = np.uint64((1 << band_width) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sims = np.asarray(
            [np.uint64(s) for s in np.asarray(batch.column(fp_col)).astype(np.uint64)],
            dtype=np.uint64,
        )
        out_id, out_band, out_bits, out_sim = [], [], [], []
        for b in range(num_bands):
            bits = (sims >> np.uint64(b * band_width)) & mask
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bits.append(bits.astype(np.int64))
            out_sim.append(sims.astype(np.int64))
        bits_cat = np.concatenate(out_bits)
        bands_cat = np.concatenate(out_band)
        part = (
            (bits_cat.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + bands_cat.astype(np.uint64))
            % np.uint64(num_parts)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(bands_cat, pa.int32()),
                "band_bits": pa.array(bits_cat, pa.int64()),
                "sim": pa.array(np.concatenate(out_sim), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["band", "band_bits", "doc_id"], kind="mergesort")
        # max_hamming=0 → one 64-bit band; 1<<64 overflows int64, and the
        # band column is constant 0 anyway, so the bits alone are the key
        if band_width >= 63:
            key = g["band_bits"].to_numpy().astype(np.int64)
        else:
            key = g["band"].to_numpy().astype(np.int64) * np.int64(1 << band_width) + g[
                "band_bits"
            ].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy()
        sims = g["sim"].to_numpy().astype(np.uint64)
        _, starts, counts = np.unique(key, return_index=True, return_counts=True)
        a_out, b_out, h_out = [], [], []
        for s, k in zip(starts[counts > 1], counts[counts > 1]):
            bid, bsim = ids[s : s + k], sims[s : s + k]
            xs, ys = np.triu_indices(k, k=1)
            ham = _popcount64(bsim[xs] ^ bsim[ys])
            keep = ham <= max_hamming
            a_out.append(bid[xs[keep]])
            b_out.append(bid[ys[keep]])
            h_out.append(ham[keep])
        if not a_out:
            # arrow out: the downstream .aggregate() is ~10x slower
            # over pandas blocks than arrow blocks
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out).astype(np.int64), pa.int64()),
                "id_b": pa.array(np.concatenate(b_out).astype(np.int64), pa.int64()),
                "hamming": pa.array(np.concatenate(h_out).astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Min as _Min

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
    )
    # a close pair matches on several bands — collapse duplicates
    return pairs.groupby(["id_a", "id_b"]).aggregate(_Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Exact n-gram (word-shingle) Jaccard near-dup — oracle-checkable
# ---------------------------------------------------------------------------

SHINGLE_TOKEN_RE2 = r"[0-9a-z_]+"


def shingle_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """EXACT word-k-gram Jaccard near-duplicate pairs (no sketch):
    inverted index on distinct shingles → co-occurrence pair counts →
    ``|A∩B| / (|A|+|B|-|A∩B|) ≥ threshold``.  Semantically identical to
    the DuckDB oracle (same token regex, same shingle construction,
    one int/int double division), so value hashes match bit-for-bit.

    Physical plan: one pass emits ``(shingle_hash64, doc_id)`` rows
    partitioned by shingle hash (the inverted-index exchange — the only
    all-to-all); each partition self-joins its postings into partial
    pair counts; the partial counts and per-batch partial per-doc
    distinct-shingle sizes then meet in ONE co-partitioned pair-side
    join on ``hash(doc_id)``
    (:func:`textpipe_ray.stages.joins.attach_pair_sides`), and a final
    pair-keyed exchange sums each pair's partials and computes the
    exact jaccard — never collected on the driver.  Unlike LSH this is
    exact but quadratic in posting lengths — use it when recall must be
    1.0 at a hard threshold and boilerplate has been collapsed by exact
    dedup first."""
    import hashlib as _hashlib
    import re as _re

    tok_re = _re.compile(SHINGLE_TOKEN_RE2)

    def doc_shingles(text: str) -> set:
        ws = tok_re.findall((text or "").lower())
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, hash_out, size_out = [], [], []
        for did, t in zip(
            np.asarray(batch.column(id_col), dtype=np.int64),
            batch.column(text_col).to_pylist(),
        ):
            # pair keys pack (id_a, id_b) into one int64 downstream
            if did < 0 or did >= (1 << 31):
                raise ValueError(
                    f"{id_col} must fit in 31 bits for pair packing (got {did}); "
                    "renumber ids (e.g. dense rank) before shingle_jaccard_pairs"
                )
            shs = doc_shingles(t)
            for sh in shs:
                ids_out.append(did)
                size_out.append(len(shs))
                hash_out.append(
                    int.from_bytes(
                        _hashlib.blake2b(sh.encode("utf8"), digest_size=8).digest(), "little"
                    )
                    >> 1  # keep positive in int64
                )
        h = np.asarray(hash_out, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                # the doc's TOTAL distinct-shingle count rides along in
                # every posting row (known for free at tokenize time) —
                # this is what lets the final jaccard be computed with NO
                # size-table join and NO driver state
                "n_sh": pa.array(size_out, pa.int64()),
                "sh": pa.array(h, pa.int64()),
                "__part": pa.array(
                    (h.astype(np.uint64) % np.uint64(num_parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """Partial pair intersection counts for this inverted-index
        partition, each carrying both docs' total shingle sizes."""
        g = part.sort_values(["sh", "doc_id"], kind="mergesort")
        sh = g["sh"].to_numpy()
        ids = g["doc_id"].to_numpy()
        szs = g["n_sh"].to_numpy()
        _, starts, counts = np.unique(sh, return_index=True, return_counts=True)
        a_out, b_out, sa_out, sb_out = [], [], [], []
        for s, c in zip(starts[counts > 1], counts[counts > 1]):
            bucket = ids[s : s + c]
            bsz = szs[s : s + c]
            xs, ys = np.triu_indices(c, k=1)
            a_out.append(bucket[xs])
            b_out.append(bucket[ys])
            sa_out.append(bsz[xs])
            sb_out.append(bsz[ys])
        if not a_out:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "n": [], "sa": [], "sb": [], "__pp": []}
            ).astype("int64")
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        sa = np.concatenate(sa_out)
        sb = np.concatenate(sb_out)
        # partial pair counts within this partition (shrinks the second
        # exchange from one row per co-occurrence to one per pair); the
        # sizes are constant per pair, so `first` per group is exact
        key = a.astype(np.int64) * np.int64(1 << 32) + b.astype(np.int64)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        firsts = np.ones(len(key_s), dtype=bool)
        firsts[1:] = key_s[1:] != key_s[:-1]
        idx = order[firsts]
        uk = key_s[firsts]
        cnt = np.diff(np.append(np.flatnonzero(firsts), len(key_s)))
        return pd.DataFrame(
            {
                "id_a": (uk >> 32).astype("int64"),
                "id_b": (uk & np.int64(0xFFFFFFFF)).astype("int64"),
                "n": cnt.astype("int64"),
                "sa": sa[idx].astype("int64"),
                "sb": sb[idx].astype("int64"),
                "__pp": (
                    (uk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    % np.uint64(num_parts)
                ).astype("int64"),
            }
        )

    # Exactly TWO exchanges, no driver state: (1) the inverted-index
    # groupby above; (2) a coarse pair-hash groupby that sums each
    # pair's partial counts vectorized (np.unique + bincount — NOT a
    # per-pair map_groups, which pays python dispatch on near-unique
    # keys).  Sizes ride with the partials, so no size join is needed.
    pair_partials = ds.map_batches(explode, batch_format="pyarrow").groupby(
        "__part"
    ).map_groups(partition_pairs, batch_format="pandas")

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "jac": []}).astype(
                {"id_a": "int64", "id_b": "int64", "jac": "float64"}
            )
        a = part["id_a"].to_numpy()
        b = part["id_b"].to_numpy()
        key = a * np.int64(1 << 32) + b
        uk, inv = np.unique(key, return_inverse=True)
        inter = np.bincount(inv, weights=part["n"].to_numpy()).astype(np.int64)
        sa = np.zeros(len(uk), dtype=np.int64)
        sa[inv] = part["sa"].to_numpy()  # constant per pair — overwrite is exact
        sb = np.zeros(len(uk), dtype=np.int64)
        sb[inv] = part["sb"].to_numpy()
        jac = inter.astype(np.float64) / (sa + sb - inter).astype(np.float64)
        m = jac >= threshold
        return pd.DataFrame(
            {
                "id_a": (uk[m] >> 32).astype("int64"),
                "id_b": (uk[m] & np.int64(0xFFFFFFFF)).astype("int64"),
                "jac": jac[m],
            }
        )

    return pair_partials.groupby("__pp").map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# Cluster formation + survivor selection (the dedup finisher)
# ---------------------------------------------------------------------------


def _join_partitions(cap: int = 64) -> int:
    """Partition count for ``Dataset.join``: the join's hash-shuffle
    aggregator actors must fit the cluster's CPU slots — requesting far
    more partitions than CPUs deadlocks a small cluster (measured: 32
    partitions hang at 4 CPUs; ≤4× CPUs is safe)."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(cap, cpus * 2))


def pair_clusters(pairs_df) -> dict[int, int]:
    """Union-find over near-dup pairs → {doc_id: cluster_root}.

    Runs on the driver: verified pairs are orders of magnitude smaller
    than the corpus (they fit even at 100 TB corpus scale — a pair list
    that didn't fit would mean most of the corpus is duplicated).  Path
    compression + union by attaching larger root keeps it linear-ish."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    # an empty pair Dataset can come back as a column-less DataFrame
    if len(pairs_df) == 0 or "id_a" not in pairs_df.columns:
        return {}
    seen: set[int] = set()
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        a, b = int(a), int(b)
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # the smaller id becomes the root → deterministic clusters
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def pair_clusters_distributed(
    pairs: "ray.data.Dataset", num_partitions: int | None = None, max_rounds: int = 64
) -> "ray.data.Dataset":
    """Distributed connected components over the near-dup pair graph:
    iterative min-label propagation.  Returns a Dataset ``(doc_id,
    root)`` covering every node that appears in a pair; ``root`` is the
    component's minimum doc id (identical to the driver union-find's
    deterministic roots).

    Each round joins the current labels onto the symmetric edge list
    (``Dataset.join`` hash shuffle) and takes a per-node min — labels
    only ever decrease, so a round that leaves ``sum(label)`` unchanged
    is the fixpoint.  Rounds = component diameter; near-dup clusters
    are star-like (diameter 2-4).  This is the cluster-formation scale
    path for when even the PAIR LIST outgrows one process (most of the
    corpus duplicated) — nothing here touches the driver beyond one
    8-byte convergence scalar per round."""
    from ray.data.aggregate import Min as _Min

    def sym(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a"), dtype=np.int64)
        b = np.asarray(batch.column("id_b"), dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    # repartition coalesces schema-less empty blocks (all-to-all
    # leftovers pass through map_batches untouched and break the join's
    # schema resolution) — applied to every dataset that feeds a join
    edges = (
        pairs.map_batches(sym, batch_format="pyarrow")
        .repartition(num_partitions or _join_partitions())
        .materialize()
    )
    if num_partitions is None:
        # size the per-round exchanges to the MEASURED graph, not the
        # CPU count: each propagation round pays per-partition task
        # overhead (join + groupby + union), which dominates wall time
        # when the pair graph is small (a 500-edge graph on 64
        # partitions spends ~100% of each round on scheduling).  ~100k
        # edges per partition keeps partitions meaty; the cap keeps
        # giant graphs within the join-partition budget.
        num_partitions = int(
            min(_join_partitions(), max(2, edges.count() // 100_000 + 1))
        )
        edges = edges.repartition(num_partitions).materialize()

    # initial label = min(node, min neighbor) — folds round one in
    labels = (
        edges.groupby("node")
        .aggregate(_Min("nbr", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "label": pa.array(
                        np.minimum(
                            np.asarray(t.column("node"), dtype=np.int64),
                            np.asarray(t.column("label"), dtype=np.int64),
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )
    if labels.count() == 0:
        # keep the output schema identical to the non-empty path
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "root": pa.array([], pa.int64())})
        )

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        lhs = labels.map_batches(
            lambda t: t.rename_columns(["lnode", "label"]), batch_format="pyarrow"
        )
        cand = edges.join(
            lhs,
            join_type="inner",
            num_partitions=num_partitions,
            on=("nbr",),
            right_on=("lnode",),
        ).select_columns(["node", "label"])
        labels = (
            cand.union(labels.select_columns(["node", "label"]))
            .groupby("node")
            .aggregate(_Min("label", alias_name="label"))
            .repartition(num_partitions)
            .materialize()
        )
        new_sum = labels.sum("label")
        if new_sum == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = new_sum
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "root"]), batch_format="pyarrow"
    )


def drop_near_dups(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_mode: str = "auto",
    driver_pairs_limit: int = 50_000_000,
    **near_dup_kwargs,
) -> "ray.data.Dataset":
    """End-to-end near-dup removal: exact dedup → MinHash-LSH pairs →
    connected components → keep the min-id survivor of each cluster.

    ``cluster_mode`` selects the component algorithm (same strategy
    selection as the signature verify):

    * ``"driver"`` — union-find over the collected pair list, droplist
      broadcast once as a sorted int64 array.  Right while pairs ≪
      corpus (the usual case: a pair list that doesn't fit one process
      means most of the corpus is duplicated).
    * ``"distributed"`` — :func:`pair_clusters_distributed` label
      propagation + hash-join anti-filter; nothing corpus-derived
      touches the driver.
    * ``"auto"`` (default) — driver below ``driver_pairs_limit`` pairs,
      distributed above.

    Both modes produce identical survivor sets (tested)."""
    import ray as _ray

    survivors, pairs = exact_survivors_and_pairs(ds, text_col, id_col, **near_dup_kwargs)
    if cluster_mode == "auto":
        pairs = pairs.materialize()
        cluster_mode = "driver" if pairs.count() <= driver_pairs_limit else "distributed"

    if cluster_mode == "driver":
        roots = pair_clusters(pairs.to_pandas())
        # every doc whose cluster root is not itself gets dropped
        droplist = np.array(sorted(x for x, r in roots.items() if r != x), dtype=np.int64)
        if len(droplist) == 0:
            return survivors  # no near-dup clusters at all
        drop_ref = _ray.put(droplist)

        def keep_batch(batch: pa.Table) -> pa.Table:
            drops = _ray.get(drop_ref)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            pos = np.minimum(np.searchsorted(drops, ids), len(drops) - 1)
            is_dup = drops[pos] == ids
            return batch.filter(pa.array(~is_dup))

        return survivors.map_batches(keep_batch, batch_format="pyarrow")

    # distributed: anti-join survivors against the non-root cluster
    # members via the native hash join (left_outer + null-marker filter)
    clusters = pair_clusters_distributed(pairs)

    def non_roots(t: pa.Table) -> pa.Table:
        # schema-less empty blocks (all-to-all leftovers) must still
        # emit the join schema or Dataset.join can't resolve the key
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {
                    "__dup_id": pa.array([], pa.int64()),
                    "__is_dup": pa.array([], pa.int8()),
                }
            )
        dup = t.filter(
            pa.array(
                np.asarray(t.column("doc_id"), dtype=np.int64)
                != np.asarray(t.column("root"), dtype=np.int64)
            )
        )
        return pa.table(
            {
                "__dup_id": pa.array(np.asarray(dup.column("doc_id"), dtype=np.int64), pa.int64()),
                "__is_dup": pa.array(np.ones(len(dup), dtype=np.int8), pa.int8()),
            }
        )

    # repartition coalesces the schema-less empty blocks all-to-all ops
    # leave behind (map_batches skips empty blocks, so they'd survive to
    # the join and break its schema resolution); both join inputs are
    # materialized first so the join's aggregator actors never compete
    # for CPUs with a still-running upstream (deadlocks tiny clusters)
    np_join = _join_partitions()
    drops = (
        clusters.map_batches(non_roots, batch_format="pyarrow")
        .repartition(np_join)
        .materialize()
    )
    joined = survivors.materialize().join(
        drops,
        join_type="left_outer",
        num_partitions=np_join,
        on=(id_col,),
        right_on=("__dup_id",),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch.column("__is_dup"))
        return batch.filter(mask).drop_columns(
            [c for c in ("__is_dup", "__dup_id") if c in batch.column_names]
        )

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental near-dup: new snapshot vs a persisted corpus index
# ---------------------------------------------------------------------------


def _check_index_meta(index_path: str, expect: dict) -> dict:
    """Load ``{index_path}/_meta.json`` and refuse kernel/parameter
    mismatches: stored band_hash values would never match freshly
    computed ones and a reader would silently find zero cross-snapshot
    buckets (total recall collapse) instead of an error."""
    import json
    import os

    meta_path = os.path.join(index_path, "_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"MinHash index at {index_path!r} has no _meta.json marker: it was "
            "either written by an incompatible engine version or the write did "
            "not complete.  Rebuild it with write_minhash_index."
        )
    with open(meta_path) as f:
        meta = json.load(f)
    mismatches = {k: (meta.get(k), v) for k, v in expect.items() if meta.get(k) != v}
    if mismatches:
        raise ValueError(
            f"MinHash index at {index_path!r} is incompatible "
            f"(stored vs requested): {mismatches}.  Rebuild the index or pass "
            "matching parameters."
        )
    return meta


def compute_minhash_sigs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int | None = None,
    keep_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """(doc_id, sig) MinHash signature table for a snapshot.  Shingle
    sha1 dominates snapshot ingest cost, so the production loop computes
    this ONCE per snapshot and passes it to BOTH
    :func:`near_dup_against_index` (dedup) and
    :func:`append_minhash_index` (ingest) via their ``sig_ds``
    parameters — 'signatures are computed once per document ever'.

    ``keep_cols`` carries named input columns through to the output so
    the one text pass can feed OTHER per-snapshot structures too (e.g.
    a dedup-key column for the Bloom scan/build in the snapshot-ingest
    loop) — callers that write the table into an index should
    ``select_columns(["doc_id", "sig"])`` first."""
    from textpipe_ray.functions.minhash import minhash_signature_shingles

    def sig_of(t: str) -> np.ndarray:
        if shingle_size is None:
            return minhash_signature(_tokenize(t))
        return minhash_signature_shingles(t or "", shingle_size)

    def compute(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sigs = [sig_of(t) for t in batch.column(text_col).to_pylist()]
        out = {
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        }
        for c in keep_cols or []:
            out[c] = batch.column(c)
        return pa.table(out)

    return ds.map_batches(compute, batch_format="pyarrow")


def _committed_gens(meta: dict) -> list[int]:
    """Committed generation ids.  ``gens`` is the explicit list
    (compaction retires ids, so it need not be contiguous); the older
    ``generations`` count form is accepted for indexes written before
    compaction existed."""
    if "gens" in meta:
        return [int(g) for g in meta["gens"]]
    return list(range(1, int(meta["generations"]) + 1))


def _index_gen_dirs(path: str, sub: str, gens: list[int]) -> list[str]:
    """Parquet files of the COMMITTED generations only — an uncommitted
    generation dir (crashed append/compaction) is never listed.
    read_parquet gets explicit files because it does not expand
    directories in a list."""
    import glob as _glob

    files: list[str] = []
    for g in gens:
        files.extend(
            sorted(_glob.glob(f"{path}/{sub}/gen={g}/**/*.parquet", recursive=True))
        )
    return files


def _write_meta_atomic(path: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_meta.json"))


def _write_index_data(
    sig_ds: "ray.data.Dataset",
    path: str,
    gen: int,
    num_bands: int,
    num_buckets: int,
) -> None:
    """Write one GENERATION of the index from a materialized (doc_id,
    sig) table: ``{path}/sigs/gen={g}`` and ``{path}/bands/gen={g}``,
    bucket-partitioned inside the generation.  Any stale directory for
    this generation (a crashed earlier attempt that never committed the
    meta bump) is removed first, so retries are idempotent."""
    import shutil

    sdir = f"{path}/sigs/gen={gen}"
    bdir = f"{path}/bands/gen={gen}"
    for d in (sdir, bdir):
        shutil.rmtree(d, ignore_errors=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.append_column(
            "bucket",
            pa.array(
                (
                    (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    % np.uint64(num_buckets)
                ).astype(np.int32),
                pa.int32(),
            ),
        )

    sig_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        sdir, partition_cols=["bucket"]
    )

    def bands_of(batch: pa.Table) -> pa.Table:
        ids, hashes, band_idx = _explode_band_rows(batch, num_bands)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(band_idx, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
                "bucket": pa.array(
                    (hashes.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    sig_ds.map_batches(bands_of, batch_format="pyarrow").write_parquet(
        bdir, partition_cols=["bucket"]
    )


def write_minhash_index(
    ds: "ray.data.Dataset | None",
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 32,
    shingle_size: int | None = None,
    num_buckets: int = 32,
    sig_ds: "ray.data.Dataset | None" = None,
) -> None:
    """Persist a MinHash-LSH index of a corpus as partitioned parquet:
    ``{path}/sigs/gen={g}`` (doc_id, sig) and ``{path}/bands/gen={g}``
    (doc_id, band, band_hash), bucket-partitioned within each
    GENERATION (one generation per ingested snapshot).  This is how a
    100 TB pipeline dedups each NEW crawl snapshot against everything
    already ingested without recomputing the old corpus: signatures are
    computed once per document ever (pass a shared ``sig_ds`` from
    :func:`compute_minhash_sigs`), and the index grows via
    :func:`append_minhash_index` after each snapshot is deduped.

    ``_meta.json`` is the COMMIT MARKER, written atomically (temp +
    rename) AFTER the generation's data: it records the band-hash
    kernel id, the build parameters and the committed generation count,
    so readers never see a torn write/append and a reader with a
    different kernel fails loudly instead of silently finding zero
    cross-snapshot buckets.

    ``path`` must be a POSIX filesystem visible to every node (local
    disk single-node, NFS/Lustre/gcsfuse on a cluster).  Raw
    object-store URIs are NOT supported: the commit protocol relies on
    atomic ``os.replace``, ``glob`` generation listing and ``rmtree``
    stale-dir cleanup — mount the bucket instead of passing ``s3://``."""
    from textpipe_ray.functions.minhash import BAND_HASH_KERNEL

    if sig_ds is None:
        sig_ds = compute_minhash_sigs(ds, text_col, id_col, shingle_size)
    sig_ds = sig_ds.materialize()
    _write_index_data(sig_ds, path, 1, num_bands, num_buckets)
    _write_meta_atomic(
        path,
        {
            "format_version": 2,
            "band_hash_kernel": BAND_HASH_KERNEL,
            "num_bands": num_bands,
            "shingle_size": shingle_size,
            "num_buckets": num_buckets,
            "num_perm": DEFAULT_NUM_PERM,
            "gens": [1],
        },
    )


def append_minhash_index(
    ds: "ray.data.Dataset | None",
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sig_ds: "ray.data.Dataset | None" = None,
) -> None:
    """Grow an existing MinHash index with a new snapshot's documents —
    the ingest step after :func:`near_dup_against_index` has deduped the
    snapshot (pass the SAME ``sig_ds`` to both so signatures are
    computed once).  Build parameters come from the INDEX's own
    ``_meta.json`` (never from the caller), so every appended snapshot
    is banded identically to the stored corpus; the snapshot writes a
    fresh generation directory and the meta's generation count is
    bumped atomically LAST — a crashed append leaves an uncommitted
    generation that readers ignore and a retry overwrites.  Doc ids
    must stay disjoint across snapshots (use a snapshot-id prefix in
    the high bits)."""
    from textpipe_ray.functions.minhash import BAND_HASH_KERNEL

    meta = _check_index_meta(
        path,
        {
            "band_hash_kernel": BAND_HASH_KERNEL,
            "format_version": 2,
            "num_perm": DEFAULT_NUM_PERM,
        },
    )
    if sig_ds is None:
        sig_ds = compute_minhash_sigs(ds, text_col, id_col, meta["shingle_size"])
    sig_ds = sig_ds.materialize()
    gens = _committed_gens(meta)
    gen = max(gens) + 1
    _write_index_data(sig_ds, path, gen, int(meta["num_bands"]), int(meta["num_buckets"]))
    meta.pop("generations", None)
    meta["gens"] = gens + [gen]
    _write_meta_atomic(path, meta)


def compact_minhash_index(path: str) -> None:
    """Merge every committed generation into ONE and retire the old
    directories — the small-files lifecycle step after many snapshot
    appends (read fan-in grows by O(num_buckets) files per append;
    compaction restores a single generation's worth).  Crash-safe like
    append: the merged generation is written from the stored signature
    table (no text, no re-shingling), the atomic meta swap commits it,
    and only then are retired directories deleted (best-effort —
    readers never list them either way)."""
    import shutil

    import ray.data as _rd

    from textpipe_ray.functions.minhash import BAND_HASH_KERNEL

    meta = _check_index_meta(
        path,
        {
            "band_hash_kernel": BAND_HASH_KERNEL,
            "format_version": 2,
            "num_perm": DEFAULT_NUM_PERM,
        },
    )
    gens = _committed_gens(meta)
    if len(gens) <= 1:
        return
    sig_ds = _rd.read_parquet(
        _index_gen_dirs(path, "sigs", gens), columns=["doc_id", "sig"]
    ).materialize()
    new_gen = max(gens) + 1
    _write_index_data(
        sig_ds, path, new_gen, int(meta["num_bands"]), int(meta["num_buckets"])
    )
    meta.pop("generations", None)
    meta["gens"] = [new_gen]
    _write_meta_atomic(path, meta)
    for sub in ("sigs", "bands"):
        for g in gens:
            shutil.rmtree(f"{path}/{sub}/gen={g}", ignore_errors=True)


_BLOOM_SALT = np.uint64(0x5851F42D4C957F2D)


def _bloom_hashes(texts: pa.Array, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via Kirsch-Mitzenmacher double hashing of the
    avalanched 64-bit content hash: idx_i = (h1 + i·h2) mod m.  h2 is
    forced odd so it is coprime with the power-of-two m (every probe
    sequence walks the whole table)."""
    from textpipe_ray.functions.strhash import avalanche, hash64_mixed_chunked

    # chunked: the inputs here are FULL DOCUMENT TEXTS, and hash64's
    # vectorization costs ~32 B of temporaries per input byte — the
    # byte-bounded slices keep each map task's transient ≤ ~128 MB
    h1 = hash64_mixed_chunked(texts)
    with np.errstate(over="ignore"):
        h2 = avalanche(h1 ^ _BLOOM_SALT) | np.uint64(1)
        steps = np.arange(k, dtype=np.uint64)
        idx = (h1[:, None] + steps[None, :] * h2[:, None]) % np.uint64(m_bits)
    return idx


@ray.remote
def _or_bloom_blocks(meta: dict, *blocks: pa.Table) -> dict:
    """OR-fold per-batch bitmap partials INSIDE a worker task; the
    driver only holds the ObjectRef, scan tasks read it zero-copy.
    The filter travels WITH its geometry meta (kernel id, m_bits, k) so
    every consumer can refuse a mismatched filter instead of silently
    probing wrong positions."""
    words_len = meta["m_bits"] // 64
    acc = np.zeros(words_len, dtype=np.uint64)
    for b in blocks:
        if len(b) == 0 or "bits" not in b.column_names:
            continue
        flat = np.asarray(b.column("bits").combine_chunks().flatten(), dtype=np.uint64)
        acc |= np.bitwise_or.reduce(flat.reshape(len(b), words_len), axis=0)
    return {"bits": acc, **meta}


def _bloom_meta(m_bits: int, k: int) -> dict:
    return {"bloom_hash_kernel": _BLOOM_HASH_KERNEL, "m_bits": m_bits, "k": k}


def _check_bloom(filt: dict, m_bits: int, k: int, where: str) -> np.ndarray:
    """Validate a dereferenced filter's meta against the caller's
    expected geometry → the bitmap.  A k or kernel mismatch would not
    crash anything downstream — it would silently produce FALSE
    NEGATIVES (probes of positions the builder never set), breaking the
    filter's one guarantee — so every consumer checks."""
    expect = _bloom_meta(m_bits, k)
    mismatches = {kk: (filt.get(kk), v) for kk, v in expect.items() if filt.get(kk) != v}
    if mismatches:
        raise ValueError(
            f"Bloom filter passed to {where} is incompatible "
            f"(stored vs requested): {mismatches}."
        )
    return filt["bits"]


def build_bloom(
    ds: "ray.data.Dataset", text_col: str = "text", m_bits: int = 1 << 22, k: int = 6
):
    """Build a Bloom filter over a corpus' exact content hashes →
    ObjectRef of a ``m_bits/64``-word uint64 bitmap.

    The DCLM-style constant-memory membership structure for
    cross-snapshot exact dedup: each batch emits ONE constant-size
    bitmap partial (m/8 bytes — the HLL exchange idiom), a worker task
    OR-folds them, and the final bitmap broadcasts through the object
    store (one copy per node).  Scale: m is sized to the indexed corpus
    (~10 bits/key for ~1% FP) — GBs at 10^9-10^10 keys, still a
    broadcast; beyond that, shard the scan by key range or use the
    persisted parquet index (:func:`write_minhash_index` /
    :func:`near_dup_against_index`), which is exact."""
    words_len = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words_len, dtype=np.uint64)
        if len(batch):
            idx = _bloom_hashes(batch.column(text_col), m_bits, k)
            flat = idx.reshape(-1).astype(np.int64)
            np.bitwise_or.at(bits, flat >> 6, np.uint64(1) << (flat & np.int64(63)).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tolist()], pa.list_(pa.uint64()))})

    refs = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    return _or_bloom_blocks.remote(_bloom_meta(m_bits, k), *refs)


def bloom_scan(
    ds: "ray.data.Dataset",
    bloom_ref,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 22,
    k: int = 6,
) -> "ray.data.Dataset":
    """Row-local membership scan of a snapshot against a built filter →
    (id, bloom_hit).  No exchange at all: the one broadcast bitmap is
    read zero-copy per node, every batch tests its own rows.  Hits are
    probabilistic (bounded false-positive rate, zero false negatives) —
    the cheap first pass that keeps true-duplicate candidates only,
    before any exact verification."""

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bits = _check_bloom(_ray.get(bloom_ref), m_bits, k, "bloom_scan")
        if len(batch) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "bloom_hit": pa.array([], pa.bool_())}
            )
        idx = _bloom_hashes(batch.column(text_col), m_bits, k)
        flat = idx.astype(np.int64)
        probe = (bits[flat >> 6] >> (flat & np.int64(63)).astype(np.uint64)) & np.uint64(1)
        hit = probe.astype(bool).all(axis=1)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "bloom_hit": pa.array(hit),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


_BLOOM_HASH_KERNEL = "km-splitmix-v1"  # identifies _bloom_hashes; bump on change


def save_bloom(bloom_ref, path: str, m_bits: int, k: int) -> None:
    """Persist a built Bloom bitmap for cross-RUN reuse — the DCLM loop:
    each crawl snapshot loads the accumulated filter, scans, ORs its own
    keys in (:func:`merge_blooms`) and saves back.  Written atomically
    (temp + rename); the embedded meta (hash kernel id + geometry) is
    validated at load, because a changed kernel or m/k would make every
    probe miss — silent zero hits instead of an error."""
    import json
    import os

    bits = _check_bloom(ray.get(bloom_ref), m_bits, k, "save_bloom")
    meta = _bloom_meta(m_bits, k)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, bits=bits, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8))
    os.replace(tmp, path)


def load_bloom(path: str, m_bits: int, k: int):
    """Load a :func:`save_bloom` bitmap → ObjectRef for
    :func:`bloom_scan`.  Refuses a kernel/geometry mismatch."""
    import json

    with np.load(path) as z:
        bits = z["bits"]
        meta = json.loads(bytes(z["meta"]).decode())
    expect = _bloom_meta(m_bits, k)
    mismatches = {kk: (meta.get(kk), v) for kk, v in expect.items() if meta.get(kk) != v}
    if mismatches:
        raise ValueError(
            f"Bloom filter at {path!r} is incompatible (stored vs requested): "
            f"{mismatches}.  Rebuild it or pass matching parameters."
        )
    return ray.put({"bits": bits.astype(np.uint64), **expect})


@ray.remote
def _or_bloom_refs(*filters: dict) -> dict:
    if not filters:
        raise ValueError("merge_blooms needs at least one filter")
    meta0 = {kk: v for kk, v in filters[0].items() if kk != "bits"}
    acc = filters[0]["bits"].copy()
    for f in filters[1:]:
        meta = {kk: v for kk, v in f.items() if kk != "bits"}
        if meta != meta0:
            # an OR of mixed-k/kernel filters would still have the
            # right SHAPE but keys from the odd filter would set fewer
            # probe positions than scans test → silent false negatives
            raise ValueError(
                f"merge_blooms: incompatible filter geometries {meta0} vs {meta}"
            )
        acc |= f["bits"]
    return {"bits": acc, **meta0}


def merge_blooms(*bloom_refs):
    """OR several built filters into one — the snapshot-ingest step of
    the cross-run loop.  Every filter carries its (kernel, m_bits, k)
    meta; the merge task REFUSES mixed geometries (same-shape bitmaps
    built under a different k would OR cleanly and then produce silent
    false negatives at scan).  Refs pass straight to the worker task
    (Ray dereferences them there); the driver never holds a bitmap."""
    if not bloom_refs:
        raise ValueError("merge_blooms needs at least one filter")
    return _or_bloom_refs.remote(*bloom_refs)


def near_dup_against_index(
    ds: "ray.data.Dataset | None",
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 32,
    threshold: float = 0.7,
    shingle_size: int | None = None,
    num_parts: int = 32,
    verify_mode: str = "auto",
    broadcast_limit_bytes: int = 1 << 30,
    sig_ds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Near-dup pairs between a NEW snapshot and a persisted corpus
    index (:func:`write_minhash_index`): the incremental path — only the
    new documents are shingled/minhashed; the old corpus contributes its
    stored band and signature tables.  Returns ``(new_id, index_id,
    jaccard_est)``; doc ids must be disjoint between snapshot and index
    (use a snapshot-id prefix in the high bits).

    Physical plan: new band rows union with the INDEX band table,
    bucket-grouped exactly like :func:`near_dup_minhash`; only
    new-vs-index pairs leave a bucket (new-vs-new is a separate
    self-dedup concern, index-vs-index was settled when the index was
    built).  Verification joins candidates against the union of the new
    signatures and the stored signature table — the pair-side join, no
    driver state.  Pass ``sig_ds`` (from :func:`compute_minhash_sigs`,
    same ``shingle_size``) to reuse signatures the snapshot loop will
    also hand to :func:`append_minhash_index`."""
    import ray.data as _rd

    from textpipe_ray.functions.minhash import BAND_HASH_KERNEL
    from textpipe_ray.stages.joins import attach_pair_sides

    meta = _check_index_meta(
        index_path,
        {
            "band_hash_kernel": BAND_HASH_KERNEL,
            "format_version": 2,
            "num_bands": num_bands,
            "shingle_size": shingle_size,
            "num_perm": DEFAULT_NUM_PERM,
        },
    )
    gens = _committed_gens(meta)

    if sig_ds is None:
        sig_ds = compute_minhash_sigs(ds, text_col, id_col, shingle_size)
    new_sigs = sig_ds.materialize()

    def new_bands(batch: pa.Table) -> pa.Table:
        ids, hashes, band_idx = _explode_band_rows(batch, num_bands)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(band_idx, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
                "is_new": pa.array(np.ones(len(ids), dtype=np.int8), pa.int8()),
                "__part": pa.array(
                    (hashes.astype(np.uint64) % np.uint64(num_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def tag_index_bands(batch: pa.Table) -> pa.Table:
        hashes = np.asarray(batch.column("band_hash"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "band": batch.column("band").cast(pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
                "is_new": pa.array(np.zeros(len(batch), dtype=np.int8), pa.int8()),
                "__part": pa.array(
                    (hashes.astype(np.uint64) % np.uint64(num_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    idx_bands = _rd.read_parquet(
        _index_gen_dirs(index_path, "bands", gens),
        columns=["doc_id", "band", "band_hash"],
    ).map_batches(tag_index_bands, batch_format="pyarrow")

    both = new_sigs.map_batches(new_bands, batch_format="pyarrow").union(idx_bands)

    def cross_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """Within each (band, band_hash) bucket: new × index pairs only."""
        g = part.sort_values(["band", "band_hash"], kind="mergesort")
        band = g["band"].to_numpy()
        bhash = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        isnew = g["is_new"].to_numpy().astype(bool)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bhash[1:] != bhash[:-1])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, n))
        a_out, b_out = [], []
        for s, k in zip(starts, counts):
            sl = slice(s, s + k)
            news = ids[sl][isnew[sl]]
            olds = ids[sl][~isnew[sl]]
            if len(news) and len(olds):
                a_out.append(np.repeat(news, len(olds)))
                b_out.append(np.tile(olds, len(news)))
        if not a_out:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a = np.concatenate(a_out).astype("int64")
        b = np.concatenate(b_out).astype("int64")
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    candidates = both.groupby("__part").map_groups(cross_pairs, batch_format="pandas")

    idx_sigs = _rd.read_parquet(
        _index_gen_dirs(index_path, "sigs", gens), columns=["doc_id", "sig"]
    )
    all_sigs = new_sigs.union(idx_sigs)

    # the same verify strategy selection as near_dup_minhash: when the
    # combined signature table fits an object store, one zero-copy
    # broadcast beats hash-partitioning the WHOLE table (three
    # exchanges) to serve what is usually a small candidate set
    if verify_mode == "auto":
        all_sigs = all_sigs.materialize()
        n_docs = all_sigs.count()
        verify_mode = (
            "broadcast" if n_docs * DEFAULT_NUM_PERM * 8 <= broadcast_limit_bytes else "join"
        )

    if verify_mode == "broadcast":
        verified = _broadcast_verify_pairs(candidates, all_sigs, threshold)

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "new_id": batch.column("id_a"),
                    "index_id": batch.column("id_b"),
                    "jaccard_est": batch.column("jaccard_est"),
                }
            )

        return verified.map_batches(rename, batch_format="pyarrow")

    sided = attach_pair_sides(
        candidates, {}, all_sigs, "doc_id", "sig", pa.list_(pa.uint64()), num_parts=num_parts
    )

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "new_id": pa.array([], pa.int64()),
                "index_id": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )
        n = len(t)
        if n == 0:
            return empty
        a = np.asarray(t.column("id_a"), dtype=np.int64)
        b = np.asarray(t.column("id_b"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        mat = np.asarray(t.column("sig").combine_chunks().flatten(), dtype=np.uint64).reshape(
            n, -1
        )
        order = np.lexsort((side, b, a))
        a, b, side, mat = a[order], b[order], side[order], mat[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        two = starts[counts == 2]
        ok = (side[two] == 0) & (side[two + 1] == 1)
        two = two[ok]
        if len(two) == 0:
            return empty
        j = (mat[two] == mat[two + 1]).mean(axis=1)
        mask = j >= threshold
        return pa.table(
            {
                "new_id": pa.array(a[two][mask], pa.int64()),
                "index_id": pa.array(b[two][mask], pa.int64()),
                "jaccard_est": pa.array(j[mask], pa.float64()),
            }
        )

    return sided.groupby("__pp").map_groups(combine, batch_format="pyarrow")
