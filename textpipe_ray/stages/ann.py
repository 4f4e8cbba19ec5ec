"""Approximate-nearest-neighbor stages over an embedding column.

Two tiers (SURVEY.md §2.7-adjacent; new-engine training-data ops):

- brute-force cosine top-k (:func:`ann_brute_topk`): query matrix
  broadcast once via ``ray.put``, one float64 matmul per batch, then a
  per-batch PARTIAL top-k so only k rows per query per batch reach the
  global merge groupby — exact baseline compute O(N·Q), exchange
  O(k·Q·blocks) (never O(N·Q) rows).
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
        # take_all row order follows block completion and is NOT
        # deterministic run-to-run (observed on materialized datasets);
        # k-means seeding reads the matrix by position, so sort by id
        # to keep centroids — and everything derived — bit-stable
        rows.sort(key=lambda r: r[id_col])
        return np.array([r[embedding_col] for r in rows], dtype=np.float64)

    def make_filt(thresh: np.uint64):
        def filt(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch.select([id_col, embedding_col])
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            keep = _id_hash(ids) < thresh
            return batch.select([id_col, embedding_col]).filter(pa.array(keep))

        return filt

    # 1.25× overshoot so the S-smallest cut almost surely has S rows;
    # on the binomial tail where it yields fewer, double the threshold
    # and re-filter (one extra streaming pass each time, deterministic)
    # rather than silently training fewer centroids than requested
    overshoot = 1.25
    while True:
        thresh = np.uint64(min(int(2**64 - 1), int(2**64 * sample_size / n * overshoot)))
        cand = ds.map_batches(make_filt(thresh), batch_format="pyarrow").take_all()
        if len(cand) >= sample_size or thresh == np.uint64(2**64 - 1):
            break
        overshoot *= 2.0
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


def _topk_select(cq: np.ndarray, nid: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of one query's candidates by (cos_q desc,
    neighbor_id asc) — a strict total order (ids unique).  Threshold
    preselect keeps ALL boundary ties into the lexsort, so the
    neighbor_id tie-break is applied over the full tie set."""
    if len(cq) > k:
        t = np.partition(cq, len(cq) - k)[len(cq) - k]  # k-th largest
        sel = cq >= t
        cq, nid = cq[sel], nid[sel]
    order = np.lexsort((nid, -cq))[:k]
    return cq[order], nid[order]


def _partial_topk_table(
    out_q: list, out_n: list, out_s: list
) -> pa.Table:
    """Assemble per-query partial top-k pieces into the bounded
    (query_id, neighbor_id, cos_q) exchange table.

    The per-BATCH partial top-k bounds the exchange into the global
    top-k groupby at k·Q·num_blocks rows instead of every scored
    candidate (O(N·Q)): any row a batch drops is strictly worse than k
    surviving rows of the same batch and query, so it can never enter
    the global top-k — partial selection composes exactly with the
    merge."""
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos_q": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "cos_q": pa.array(np.concatenate(out_s), pa.int64()),
        }
    )


def _merge_topk(scored: "ray.data.Dataset", k: int) -> "ray.data.Dataset":
    """Global top-k per query over the bounded partials: the groupby
    sees ≤ k rows per query per block."""

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos_q", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank", "cos_q"]]

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


def ann_brute_scores(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """Brute-force cosine scoring stage with BOUNDED output: one float64
    matmul per batch against the broadcast query matrix, then a
    per-batch partial top-k — each batch emits ≤ k rows per query, so
    the downstream exchange never grows with the corpus.  Scores are
    quantized to floor(cos·1e9) int64 before selection (BLAS summation
    order varies with batch shape; quantization + the neighbor_id
    tie-break make ranks engine- and batching-stable)."""
    qids = np.asarray(query_ids, dtype=np.int64)
    qmat = np.asarray(query_mat, dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    ref = ray.put((qids, qmat, qnorm))

    def score(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qnorm_ = ray.get(ref)
        if len(batch) == 0:  # empty block: np.array([]) is 1-D → matmul breaks
            return _partial_topk_table([], [], [])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        norms = np.sqrt((emb * emb).sum(axis=1))
        sims = (emb @ qmat_.T) / (norms[:, None] * qnorm_[None, :])  # (B, Q)
        cos_q = np.floor(sims * 1e9).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            keep = ids != qid  # self-exclusion
            cq, nid = _topk_select(cos_q[keep, j], ids[keep], k)
            out_q.append(np.full(len(nid), qid, dtype=np.int64))
            out_n.append(nid)
            out_s.append(cq)
        return _partial_topk_table(out_q, out_n, out_s)

    return ds.map_batches(score, batch_format="pyarrow")


def ann_brute_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """Exact cosine top-k baseline: (query_id, neighbor_id, rank, cos_q)."""
    return _merge_topk(
        ann_brute_scores(ds, query_ids, query_mat, k, id_col, embedding_col), k
    )


def _nearest_cell(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Row-wise nearest-centroid ids ((B, D) × (C, D) → (B,) int64) by
    squared euclidean distance — the one IVF assignment kernel shared by
    the layout writer, the in-memory IVF and SemDeDup."""
    d = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1).astype(np.int64)


def assign_cells(
    ds: "ray.data.Dataset",
    cents_ref,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """Row-local IVF cell assignment: (id, embedding) → (id, embedding,
    cell).  Centroids ship once through the object store (``cents_ref``
    is a ``ray.put`` ObjectRef), never per batch."""

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cents_ref)
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    embedding_col: pa.array([], pa.list_(pa.float64())),
                    "cell": pa.array([], pa.int64()),
                }
            )
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                embedding_col: batch.column(embedding_col),
                "cell": pa.array(_nearest_cell(emb, cents_), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def refine_hot_cells(
    assigned: "ray.data.Dataset",
    cap: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    sub_sample: int = 512,
    subk_max: int = 16,
    max_depth: int = 4,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Recursive DISTRIBUTED cell split: any cell holding more than
    ``cap`` rows is re-clustered into sub-cells so that no single
    ``groupby("cell")`` task ever receives a mega-cluster (the
    documented SemDeDup failure mode: one skewed cell makes one task
    O(m²) while 100 TB streams past it).

    Per depth (≤ ``max_depth``):

    1. per-cell counts — per-BLOCK partials merged on the driver
       (≤ #cells·#blocks tiny rows collected, NO all-to-all);
    2. hash-uniform sample of each hot cell's members (expected
       ``2·sub_sample`` rows/cell via a per-cell id-hash threshold;
       driver holds ≤ #hot_cells · 2·sub_sample rows, and #hot_cells ≤
       n/cap by definition);
    3. per-cell sub-k-means fit on the driver (milliseconds — the
       sample is bounded), ``subk = min(subk_max, ceil(count/cap))``,
       centroids shipped ONCE via ``ray.put``;
    4. row-local injective remap: every cell id becomes
       ``cell·(subk_max+1)``, and hot-cell rows add ``1 + subcell`` —
       no two old cells can collide and cold cells keep their grouping.

    Splitting is semantic (k-means on the cell's own geometry), so
    near-duplicate neighbourhoods stay co-located — the recall argument
    is the same one SemDeDup itself makes for clustering in the first
    place.  Residual: a cell of near-IDENTICAL vectors cannot be split
    by any geometric method — but that case is exactly where the
    chunked greedy is CHEAP (the first kept row blocks everything, so
    verification is O(m·chunk), not O(m²)); the expensive diverse-blob
    case is the one k-means can split.  Deterministic end-to-end:
    hash-threshold sampling, id-sorted fit matrices, seeded k-means
    (seed varies per depth so a failed split retries differently)."""
    def cell_counts(batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch.column("cell"), dtype=np.int64)
        u, c = np.unique(cells, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    for depth in range(max_depth):
        # per-block partial counts + driver merge: ≤ #cells·#blocks tiny
        # rows to the driver, NO all-to-all (a groupby-count here would
        # add an exchange per depth just to learn ~#cells integers)
        counts: dict[int, int] = {}
        for r in assigned.map_batches(cell_counts, batch_format="pyarrow").take_all():
            counts[int(r["cell"])] = counts.get(int(r["cell"]), 0) + int(r["n"])
        hot = {c: n for c, n in counts.items() if n > cap}
        if not hot:
            break
        hot_ids = np.array(sorted(hot), dtype=np.int64)
        hot_thresh = np.array(
            [
                min(2**64 - 1, int(2**64 * min(1.0, 2.0 * sub_sample / hot[int(c)])))
                for c in hot_ids
            ],
            dtype=np.uint64,
        )

        # loop-iteration state is bound through DEFAULT ARGS, not free
        # closure variables: the remap stage is lazy, so a depth-0
        # closure reading rebound loop variables would silently use
        # depth-1's centroids when the chain executes later
        def samp(
            batch: pa.Table, hot_ids=hot_ids, hot_thresh=hot_thresh
        ) -> pa.Table:
            if len(batch) == 0:
                return batch.select([id_col, embedding_col, "cell"])
            cells = np.asarray(batch.column("cell"), dtype=np.int64)
            pos = np.searchsorted(hot_ids, cells)
            pos_c = np.clip(pos, 0, len(hot_ids) - 1)
            lim = np.where(hot_ids[pos_c] == cells, hot_thresh[pos_c], np.uint64(0))
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            keep = _id_hash(ids) < lim
            return batch.select([id_col, embedding_col, "cell"]).filter(pa.array(keep))

        sample_rows = assigned.map_batches(samp, batch_format="pyarrow").take_all()
        by_cell: dict[int, list] = {}
        for r in sample_rows:
            by_cell.setdefault(int(r["cell"]), []).append(r)
        subcents: dict[int, np.ndarray] = {}
        for c, n in hot.items():
            rows = by_cell.get(c, [])
            rows.sort(key=lambda r: r[id_col])
            if len(rows) < 2:
                continue  # unsplittable this depth (tiny sample)
            mat = np.array([r[embedding_col] for r in rows], dtype=np.float64)
            subk = min(subk_max, max(2, -(-n // cap)), len(mat))
            subcents[c] = _kmeans(mat, subk, iters=8, seed=seed + depth)
        if not subcents:
            break
        sub_ref = ray.put(subcents)
        mult = np.int64(subk_max + 1)

        def remap(batch: pa.Table, sub_ref=sub_ref, mult=mult) -> pa.Table:
            if len(batch) == 0:
                return batch
            sc = ray.get(sub_ref)
            cells = np.asarray(batch.column("cell"), dtype=np.int64) * mult
            emb = None
            for c, cents_ in sc.items():
                mask = cells == c * mult
                if not mask.any():
                    continue
                if emb is None:
                    emb = np.array(
                        batch.column(embedding_col).to_pylist(), dtype=np.float64
                    )
                cells[mask] += 1 + _nearest_cell(emb[mask], cents_)
            return batch.set_column(
                batch.schema.get_field_index("cell"), "cell", pa.array(cells, pa.int64())
            )

        # materialize per depth: the count + sample passes above would
        # otherwise re-execute every earlier remap stage each iteration
        # (object-store blocks, spillable; depth >0 only occurs under
        # actual skew)
        assigned = assigned.map_batches(remap, batch_format="pyarrow").materialize()
    return assigned


def write_ivf_layout(
    ds: "ray.data.Dataset",
    path: str,
    num_centroids: int = 32,
    sample_size: int = 2048,
    kmeans_iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Persist the embedding table PARTITIONED BY IVF CELL — the layout
    that turns nprobe into file-level read pruning: centroids fit on
    the hash-uniform bounded sample, every vector is assigned in one
    streaming pass, and ``write_parquet(partition_cols=["cell"])``
    co-locates each cell's vectors.  Centroids are saved next to the
    data (``centroids.npy``).  ``path`` must be shared storage on a
    multi-node cluster (same contract as the minhash index).  Returns
    the centroid matrix."""
    if centroids is None:
        sample = _uniform_sample(ds, sample_size, id_col, embedding_col)
        cents = _kmeans(sample, num_centroids, kmeans_iters, seed)
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    assign_cells(ds, ray.put(cents), id_col, embedding_col).write_parquet(
        path, partition_cols=["cell"]
    )
    np.save(f"{path}/centroids.npy", cents)
    return cents


IVF_LAYOUT_FORMAT = "textpipe_ray-ivf-layout-v1"


def _ivf_meta(path: str) -> dict:
    """Committed-generation manifest; a missing meta file means a plain
    :func:`write_ivf_layout` base with no appends (back-compat)."""
    import json
    import os

    p = f"{path}/_meta.json"
    if not os.path.exists(p):
        return {"format": IVF_LAYOUT_FORMAT, "gens": [], "base": True}
    with open(p, "r", encoding="utf8") as f:
        meta = json.load(f)
    if meta.get("format") != IVF_LAYOUT_FORMAT:
        raise ValueError(f"not a {IVF_LAYOUT_FORMAT} layout: {path}")
    return meta


def _write_ivf_meta(path: str, meta: dict) -> None:
    """Atomic commit marker (temp + rename, same contract as the
    minhash index): data files are written FIRST, the meta bump is
    LAST, so a crashed append/compact is invisible to readers and a
    retry simply overwrites the orphan directory."""
    import json
    import os

    tmp = f"{path}/_meta.json.tmp"
    with open(tmp, "w", encoding="utf8") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/_meta.json")


def _ivf_sources(path: str, meta: dict) -> list[str]:
    """Root directories holding committed cell partitions."""
    roots = [path] if meta.get("base", True) else []
    roots.extend(f"{path}/gen-{g}" for g in meta.get("gens", []))
    return roots


def append_ivf_layout(
    path: str,
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> int:
    """Grow a persisted IVF layout with a new embedding snapshot — the
    ANN side of the index LIFECYCLE the minhash dedup index already
    has (write → append generations → compact): new vectors are
    assigned to the EXISTING centroids (read from the layout, never
    recomputed — appends must not shift cell boundaries under
    already-written data) and land in a fresh ``gen-N`` directory,
    committed by an atomic ``_meta.json`` bump written LAST.  Queries
    over the layout see base + every committed generation.  ``path``
    must be shared storage on a multi-node cluster.  Returns the new
    generation id."""
    import shutil as _sh

    meta = _ivf_meta(path)
    cents = np.load(f"{path}/centroids.npy")
    gen = max(meta["gens"], default=0) + 1
    # a crashed earlier attempt may have left an UNCOMMITTED gen dir at
    # this number; write_parquet appends files rather than replacing, so
    # the stale dir must go first for retries to be idempotent
    _sh.rmtree(f"{path}/gen-{gen}", ignore_errors=True)
    assign_cells(ds, ray.put(cents), id_col, embedding_col).write_parquet(
        f"{path}/gen-{gen}", partition_cols=["cell"]
    )
    meta["gens"] = meta["gens"] + [gen]
    _write_ivf_meta(path, meta)
    return gen


def compact_ivf_layout(path: str) -> None:
    """Merge base + every committed generation into ONE fresh
    generation and retire the old directories: restores O(cells) read
    fan-in after many snapshot appends.  The rewrite is a streaming
    cell-partitioned copy (rows already carry their cell in the dir
    name — no re-assignment, no centroid math); the atomic meta swap
    commits it, so readers see either the old generation set or the
    compacted one, never a mix."""
    import glob as _glob
    import shutil as _sh

    import pyarrow.compute as _pc
    import ray.data as _rd

    meta = _ivf_meta(path)
    old_roots = _ivf_sources(path, meta)
    files: list[str] = []
    for root in old_roots:
        files.extend(sorted(_glob.glob(f"{root}/cell=*/*.parquet")))
    if not meta.get("gens"):
        return  # base only — nothing to compact
    gen = max(meta["gens"]) + 1

    def stamp(batch: pa.Table) -> pa.Table:
        cell = _pc.cast(
            _pc.struct_field(
                _pc.extract_regex(batch.column("path"), r"cell=(?P<cell>\d+)/"),
                "cell",
            ),
            pa.int64(),
        )
        return batch.drop_columns(["path"]).append_column("cell", cell)

    # read only the PHYSICAL file columns (hive inference would add the
    # dir-derived cell column and collide with the stamped one)
    import pyarrow.parquet as _pq

    phys_cols = [
        n for n in _pq.ParquetFile(files[0]).schema_arrow.names if n != "cell"
    ]
    # same retry-idempotence rule as append: clear any uncommitted
    # leftover at this generation number before writing into it
    _sh.rmtree(f"{path}/gen-{gen}", ignore_errors=True)
    _rd.read_parquet(files, columns=phys_cols, include_paths=True).map_batches(
        stamp, batch_format="pyarrow"
    ).write_parquet(f"{path}/gen-{gen}", partition_cols=["cell"])
    _write_ivf_meta(
        path, {"format": IVF_LAYOUT_FORMAT, "gens": [gen], "base": False}
    )
    # retirement after the commit point: a crash here only leaks dirs
    # (readers already ignore them)
    for root in old_roots:
        if root == path:
            for d in _glob.glob(f"{path}/cell=*"):
                _sh.rmtree(d, ignore_errors=True)
        else:
            _sh.rmtree(root, ignore_errors=True)


def ann_ivf_topk_layout(
    path: str,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> tuple["ray.data.Dataset", int, int]:
    """IVF top-k over a :func:`write_ivf_layout` table, reading ONLY the
    probed cell partitions — the executable form of the "a query
    touches nprobe/num_centroids of the data" claim: pruning happens at
    the READ (file level), not as a post-read filter.  Returns
    (result dataset, cells read, cells total).  Scoring/merging reuse
    the bounded partial-top-k machinery, so results are identical to
    :func:`ann_ivf_topk` with the same centroids and parameters."""
    import glob as _glob

    cents = np.load(f"{path}/centroids.npy")
    qids = np.asarray(query_ids, dtype=np.int64)
    qmat = np.asarray(query_mat, dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qd = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (Q, C)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    probed_cells = sorted({int(c) for row in probe for c in row})
    # committed sources only: the base dir (unless retired by a
    # compaction) plus every generation the meta marks committed — an
    # in-flight append's files are invisible until its meta bump
    src_roots = _ivf_sources(path, _ivf_meta(path))
    all_cells = sorted(
        {
            int(p.rsplit("cell=", 1)[1])
            for root in src_roots
            for p in _glob.glob(f"{root}/cell=*")
        }
    )
    probe_sets = [set(int(c) for c in row) for row in probe]
    ref = ray.put((qids, qmat, qnorm, probe_sets))

    import ray.data as _rd

    # file-level pruning: ONLY the probed hive partitions are opened.
    # ONE read_parquet over the union of probed-cell files (not one
    # read per cell): per-cell reads each get split toward the target
    # parallelism, so nprobe × splits tiny blocks explode the merge
    # groupby's per-block scheduling cost (observed 1600 blocks of ~1.5
    # rows → a 230 s sort at sf0.1).  A single read lets Ray pick the
    # natural block count for the probed bytes.  The partition key
    # lives in the dir name (not the files), so it is recovered
    # vectorized from the ``include_paths`` column.
    existing = set(all_cells)
    cells_read = [c for c in probed_cells if c in existing]
    files = []
    for c in cells_read:
        for root in src_roots:
            files.extend(sorted(_glob.glob(f"{root}/cell={c}/*.parquet")))
    if not files:
        # every probed centroid owns zero vectors (k-means empty cells
        # get no hive dir) — the correct answer is an empty result, not
        # an IndexError
        return _merge_topk(_rd.from_arrow(_partial_topk_table([], [], [])), k), 0, len(all_cells)

    import pyarrow.compute as _pc

    def stamp(batch: pa.Table) -> pa.Table:
        cell = _pc.cast(
            _pc.struct_field(
                _pc.extract_regex(batch.column("path"), r"cell=(?P<cell>\d+)/"),
                "cell",
            ),
            pa.int64(),
        )
        return batch.drop_columns(["path"]).append_column("cell", cell)

    ds = _rd.read_parquet(
        files, columns=[id_col, embedding_col], include_paths=True
    ).map_batches(stamp, batch_format="pyarrow")

    def score(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qnorm_, probe_sets_ = ray.get(ref)
        if len(batch) == 0:
            return _partial_topk_table([], [], [])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        cells = np.asarray(batch.column("cell"), dtype=np.int64)
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        norms = np.sqrt((emb * emb).sum(axis=1))
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            keep = np.isin(cells, list(probe_sets_[j])) & (ids != qid)
            if not keep.any():
                continue
            sub = emb[keep]
            sims_j = (sub @ qmat_[j]) / (norms[keep] * qnorm_[j])
            cq, nid = _topk_select(np.floor(sims_j * 1e9).astype(np.int64), ids[keep], k)
            out_q.append(np.full(len(nid), qid, dtype=np.int64))
            out_n.append(nid)
            out_s.append(cq)
        return _partial_topk_table(out_q, out_n, out_s)

    scored = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(scored, k), len(cells_read), len(all_cells)


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
            return _partial_topk_table([], [], [])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        cell = _nearest_cell(emb, cents_)  # (B,)
        norms = np.sqrt((emb * emb).sum(axis=1))
        visible = pmask_[cell]  # (B, Q): vector's cell probed by query?
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            keep = visible[:, j] & (ids != qid)
            if not keep.any():
                continue
            # similarity computed ONLY for the probed subset — this is
            # the IVF saving (the brute-force baseline does the full
            # B×Q matmul); work here is O(|probed| · dim) per query.
            # Then a per-batch partial top-k bounds the emitted rows at
            # k per query per batch (quantized to floor(cos·1e9) FIRST:
            # BLAS accumulation order varies with batch shape, so raw
            # doubles drift ~1 ulp — quantized selection + neighbor_id
            # tie-break is batching-stable)
            sub = emb[keep]
            sims_j = (sub @ qmat_[j]) / (norms[keep] * qnorm_[j])
            cq, nid = _topk_select(np.floor(sims_j * 1e9).astype(np.int64), ids[keep], k)
            out_q.append(np.full(len(nid), qid, dtype=np.int64))
            out_n.append(nid)
            out_s.append(cq)
        return _partial_topk_table(out_q, out_n, out_s)

    scored = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(scored, k)


# --- Product quantization (PQ) ---------------------------------------------
# Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
# Search" (public literature).  The memory tier of the ANN family: a
# 64-dim float32 vector (256 B) compresses to M uint8 codes (8 B at
# M=8), so a corpus whose raw embeddings exceed cluster RAM keeps its
# whole index resident.  Search is asymmetric-distance (ADC): the exact
# normalized query is dotted against each subspace codebook ONCE into a
# (M × K) lookup table on the driver; per-vector scoring is then M
# table lookups + adds — no float multiply touches the corpus.


def train_pq(
    sample: np.ndarray,
    m_subspaces: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 10,
    seed: int = 29,
) -> np.ndarray:
    """Train PQ codebooks on a bounded sample: L2-normalize (the cosine
    contract shared by the whole ANN family), slice dims into
    ``m_subspaces`` blocks, fit an independent k-means codebook per
    block.  Returns ``(M, K, dsub)`` float64.  Runs on the driver in
    milliseconds — the distributed work is encode + scan."""
    s = np.asarray(sample, dtype=np.float64)
    n = np.sqrt((s * s).sum(axis=1))
    n[n == 0] = 1.0
    s = s / n[:, None]
    dim = s.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    if n_codes > 256:
        # codes are stored as uint8; a larger codebook would silently
        # wrap indices mod 256 and return wrong neighbors
        raise ValueError(f"n_codes {n_codes} > 256 does not fit uint8 codes")
    dsub = dim // m_subspaces
    return np.stack(
        [
            _kmeans(s[:, m * dsub : (m + 1) * dsub], n_codes, kmeans_iters, seed + m)
            for m in range(m_subspaces)
        ]
    )


def _codes_matrix(col, num_rows: int) -> np.ndarray:
    """(B, M) uint8 matrix from the fixed-size-list ``codes`` column
    (per-chunk flatten respects block slices)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    flat = np.concatenate(
        [np.asarray(c.flatten(), dtype=np.uint8) for c in chunks if len(c)]
    )
    return flat.reshape(num_rows, -1)


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """Row-local PQ encode: every vector (normalized) → M uint8 codes.
    Codebooks ship once (``ray.put``); output is ``(id, codes)`` — the
    16-32× smaller table downstream ADC scans stream over instead of
    the raw embeddings."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(batch: pa.Table) -> pa.Table:
        books = ray.get(ref)
        m_sub, _, dsub = books.shape
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "codes": pa.array([], pa.list_(pa.uint8(), m_sub)),
                }
            )
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        emb = np.array(batch.column(embedding_col).to_pylist(), dtype=np.float64)
        nrm = np.sqrt((emb * emb).sum(axis=1))
        nrm[nrm == 0] = 1.0
        emb = emb / nrm[:, None]
        codes = np.empty((len(emb), m_sub), dtype=np.uint8)
        for m in range(m_sub):
            sub = emb[:, m * dsub : (m + 1) * dsub]
            d = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d.argmin(axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()), m_sub
                ),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def ann_pq_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    m_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 29,
    refine: int | None = None,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> "ray.data.Dataset":
    """PQ-ADC approximate cosine top-k: ``(query_id, neighbor_id, rank,
    cos_q)`` with ``cos_q = floor(adc_score · 1e9)`` (or the EXACT
    quantized cosine when ``refine`` is set).

    Scale shape: codebooks train on the bounded
    :func:`_uniform_sample`; encode is one row-local pass; the ADC
    lookup table (Q × M × K doubles) ships once via ``ray.put``; the
    scoring scan streams the CODES table (8 B/vector at defaults, not
    the raw embeddings) and emits a per-batch partial top-k, so the
    merge groupby sees ≤ k·Q·blocks rows — the same bounded-exchange
    contract as the brute/IVF tiers.  Per-row ADC sums the M lookup
    terms in fixed subspace order, so scores are batching-stable even
    before quantization.

    ``refine=R`` adds the production second stage: the ADC scan
    generates ``k·R`` CANDIDATES per query (PQ collapses near-identical
    vectors onto shared codes, so its intra-shortlist order is coarse
    — recall@k-in-top-k·R is what PQ actually guarantees), then one
    exact-cosine pass re-ranks ONLY the shortlist (candidate→query map
    broadcast; per batch the masked subset is matmul'd — work and
    exchange are both answer-sized, O(k·R·Q))."""
    sample = _uniform_sample(ds, sample_size, id_col, embedding_col)
    books = train_pq(sample, m_subspaces, n_codes, kmeans_iters, seed)
    codes = pq_encode(ds, books, id_col, embedding_col)
    kk = k * refine if refine else k
    shortlist = _merge_topk(
        ann_pq_scores(codes, books, query_ids, query_mat, kk, id_col), kk
    )
    if not refine:
        return shortlist

    # exact re-rank of the answer-sized shortlist (k·R rows per query)
    cand = shortlist.select_columns(["query_id", "neighbor_id"]).take_all()
    by_nid: dict = {}
    for r in cand:
        by_nid.setdefault(r["neighbor_id"], []).append(r["query_id"])
    cand_ids = np.sort(np.fromiter(by_nid.keys(), dtype=np.int64))  # once, not per batch
    qids = np.asarray(query_ids, dtype=np.int64)
    qmat = np.asarray(query_mat, dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qpos = {int(q): j for j, q in enumerate(qids)}
    ref = ray.put((by_nid, cand_ids, qids, qmat, qnorm, qpos))

    def rerank(batch: pa.Table) -> pa.Table:
        by_nid_, cand_ids_, qids_, qmat_, qnorm_, qpos_ = ray.get(ref)
        if len(batch) == 0:
            return _partial_topk_table([], [], [])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sel = np.isin(ids, cand_ids_)
        if not sel.any():
            return _partial_topk_table([], [], [])
        sub_ids = ids[sel]
        emb = np.array(
            batch.column(embedding_col).filter(pa.array(sel)).to_pylist(),
            dtype=np.float64,
        )
        norms = np.sqrt((emb * emb).sum(axis=1))
        sims = (emb @ qmat_.T) / (norms[:, None] * qnorm_[None, :])
        cos_q = np.floor(sims * 1e9).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for i, nid in enumerate(sub_ids):
            for qid in by_nid_[int(nid)]:
                out_q.append(np.array([qid], dtype=np.int64))
                out_n.append(np.array([nid], dtype=np.int64))
                out_s.append(np.array([cos_q[i, qpos_[int(qid)]]], dtype=np.int64))
        return _partial_topk_table(out_q, out_n, out_s)

    return _merge_topk(ds.map_batches(rerank, batch_format="pyarrow"), k)


def pq_lut(books: np.ndarray, query_mat: np.ndarray) -> np.ndarray:
    """ADC lookup table: ``lut[q, m, c] = qhat_q[m-th slice] ·
    books[m, c]`` — Q × M × K doubles, computed once on the driver."""
    qmat = np.asarray(query_mat, dtype=np.float64)
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    qn[qn == 0] = 1.0
    qhat = qmat / qn[:, None]
    m_sub, _, dsub = books.shape
    qsub = qhat.reshape(len(qhat), m_sub, dsub)
    return np.einsum("qmd,mkd->qmk", qsub, books)


def ann_pq_scores(
    codes: "ray.data.Dataset",
    books: np.ndarray,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """ADC scoring over the codes table with the bounded-exchange
    contract: each batch emits ≤ k rows per query."""
    qids = np.asarray(query_ids, dtype=np.int64)
    lut = pq_lut(books, query_mat)
    ref = ray.put((qids, lut))

    def score(batch: pa.Table) -> pa.Table:
        qids_, lut_ = ray.get(ref)
        if len(batch) == 0:
            return _partial_topk_table([], [], [])
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        cm = _codes_matrix(batch.column("codes"), len(batch))
        s = np.zeros((len(ids), len(qids_)), dtype=np.float64)
        for m in range(cm.shape[1]):  # fixed m-order: batching-stable sums
            s += lut_[:, m, cm[:, m]].T
        sq = np.floor(s * 1e9).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            keep = ids != qid  # self-exclusion
            cq, nid = _topk_select(sq[keep, j], ids[keep], k)
            out_q.append(np.full(len(nid), qid, dtype=np.int64))
            out_n.append(nid)
            out_s.append(cq)
        return _partial_topk_table(out_q, out_n, out_s)

    return codes.map_batches(score, batch_format="pyarrow")
