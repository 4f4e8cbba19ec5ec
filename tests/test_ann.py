"""ANN: IVF-bucketed top-k recall vs the brute-force baseline."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import pyarrow as pa

    import ray.data

    rng = np.random.RandomState(3)
    n, d = 400, 16
    base = rng.standard_normal((8, d))
    # clustered vectors: cluster center + small noise
    vecs = base[rng.randint(0, 8, n)] + 0.15 * rng.standard_normal((n, d))
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
                }
            )
        ).repartition(4),
        vecs,
    )


def test_ivf_recall(emb_ds):
    from textpipe_ray.stages.ann import ann_ivf_topk

    ds, vecs = emb_ds
    qids = np.arange(5, dtype=np.int64)
    qmat = vecs[:5]
    out = ann_ivf_topk(ds, qids, qmat, k=10, num_centroids=16, nprobe=6).to_pandas()

    # brute-force ground truth
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    sims = (vecs @ qmat.T) / (norms[:, None] * norms[:5][None, :])
    recalls = []
    for j, qid in enumerate(qids):
        s = sims[:, j].copy()
        s[qid] = -np.inf
        truth = set(np.argsort(-s)[:10])
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        assert len(got) == 10
        recalls.append(len(truth & got) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_ranks_sorted(emb_ds):
    from textpipe_ray.stages.ann import ann_ivf_topk

    ds, vecs = emb_ds
    out = ann_ivf_topk(ds, np.array([0]), vecs[:1], k=5, num_centroids=8, nprobe=4).to_pandas()
    g = out.sort_values("rank")
    assert list(g["rank"]) == [1, 2, 3, 4, 5]
    assert (np.diff(g["cos_q"].to_numpy()) <= 0).all()  # quantized cos, descending


def test_brute_partial_topk_bounds_exchange_and_is_exact(emb_ds):
    """The scoring stage must emit at most k rows per query per batch
    (the round-3 verdict's O(N·Q) exchange, now bounded), and the merged
    result must equal the quantized numpy ground truth exactly."""
    from textpipe_ray.stages.ann import ann_brute_scores, ann_brute_topk

    ds, vecs = emb_ds
    qids = np.arange(5, dtype=np.int64)
    qmat = vecs[:5]
    k = 10
    # 400 rows in 4 blocks → ≤ 4 batches; the partial stage may emit at
    # most k·Q rows per batch (vs 395·Q per batch before the bound)
    scored_rows = ann_brute_scores(ds, qids, qmat, k=k).count()
    assert scored_rows <= k * len(qids) * 4, scored_rows

    out = ann_brute_topk(ds, qids, qmat, k=k).to_pandas()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    for j, qid in enumerate(qids):
        sims = (vecs @ qmat[j]) / (norms * norms[qid])
        cos_q = np.floor(sims * 1e9).astype(np.int64)
        ids = np.arange(len(vecs), dtype=np.int64)
        keep = ids != qid
        order = np.lexsort((ids[keep], -cos_q[keep]))[:k]
        want = ids[keep][order]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert list(got["neighbor_id"]) == list(want)
        assert list(got["rank"]) == list(range(1, k + 1))


def test_ivf_layout_prunes_reads_and_matches(emb_ds, tmp_path):
    """The partition-by-centroid parquet layout must (a) let a query
    open ONLY its probed cell partitions (file-level pruning — the
    'touches nprobe/num_centroids of the data' claim made executable)
    and (b) return exactly the same top-k as the in-memory IVF with the
    same centroids and parameters."""
    from textpipe_ray.stages.ann import ann_ivf_topk, ann_ivf_topk_layout, write_ivf_layout

    ds, vecs = emb_ds
    qids = np.arange(3, dtype=np.int64)
    qmat = vecs[:3]
    layout = str(tmp_path / "ivf")
    write_ivf_layout(ds, layout, num_centroids=16, sample_size=2048, seed=13)

    got, cells_read, cells_total = ann_ivf_topk_layout(layout, qids, qmat, k=10, nprobe=4)
    got = got.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert cells_read < cells_total, (cells_read, cells_total)  # pruning is real
    assert cells_read <= 3 * 4  # ≤ Q × nprobe partitions opened

    want = (
        ann_ivf_topk(ds, qids, qmat, k=10, num_centroids=16, nprobe=4, sample_size=2048, seed=13)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "neighbor_id", "rank", "cos_q"]].equals(
        want[["query_id", "neighbor_id", "rank", "cos_q"]]
    )


def test_ivf_layout_all_probed_cells_empty(ray_session, tmp_path):
    """k-means empty cells get no hive dir; a query whose probed
    centroids all own zero vectors must return an empty result (not
    IndexError)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import ann_ivf_topk_layout

    layout = tmp_path / "ivf"
    (layout / "cell=1").mkdir(parents=True)
    # two centroids, but only cell 1 holds vectors — cell 0 is empty
    np.save(str(layout / "centroids.npy"), np.array([[0.0, 0.0], [10.0, 10.0]]))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[10.0, 10.0], [9.0, 11.0]], pa.list_(pa.float64())),
            }
        ),
        str(layout / "cell=1" / "part.parquet"),
    )
    # query at the empty centroid with nprobe=1 → probes only cell 0
    got, cells_read, cells_total = ann_ivf_topk_layout(
        str(layout), np.array([7], dtype=np.int64), np.array([[0.1, -0.1]]), k=5, nprobe=1
    )
    assert cells_read == 0 and cells_total == 1
    assert got.count() == 0


def test_ivf_recall_on_label_sorted_input(ray_session):
    """Centroid sampling must survive input ORDERED by cluster (exactly
    how real corpora are laid out: by source/lang/crawl). A head sample
    (``ds.limit``) sees only the first clusters and recall collapses;
    the hash-threshold uniform sample must not."""
    import pyarrow as pa

    import ray.data

    from textpipe_ray.stages.ann import ann_ivf_topk

    rng = np.random.RandomState(7)
    n, d, n_clusters = 600, 16, 8
    base = rng.standard_normal((n_clusters, d)) * 3.0
    labels = np.sort(rng.randint(0, n_clusters, n))  # SORTED by cluster
    vecs = base[labels] + 0.1 * rng.standard_normal((n, d))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(6)

    # the sample must COVER the distribution: every cluster represented.
    # A head sample (the round-2 ds.limit(96)) sees only the first one
    # or two clusters; the collapse shows up as every far vector landing
    # in one IVF cell (the scale pathology: one cell = most of the
    # corpus, probing it = a brute-force scan).
    from textpipe_ray.stages.ann import _kmeans, _uniform_sample

    sample = _uniform_sample(ds, 96, "vec_id", "embedding")
    d2 = ((sample[:, None, :] - base[None, :, :]) ** 2).sum(axis=2)
    covered = set(d2.argmin(axis=1))
    assert covered == set(range(n_clusters)), covered

    cents = _kmeans(sample, 16, 8, 13)
    cell = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    largest_share = np.bincount(cell).max() / n
    assert largest_share <= 0.35, largest_share

    # end-to-end recall on queries from the LAST cluster still holds
    qidx = np.arange(n - 5, n, dtype=np.int64)
    out = ann_ivf_topk(
        ds, qidx, vecs[qidx], k=10, num_centroids=16, nprobe=6, sample_size=96
    ).to_pandas()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    recalls = []
    for qid in qidx:
        s = (vecs @ vecs[qid]) / (norms * norms[qid])
        s[qid] = -np.inf
        truth = set(np.argsort(-s)[:10])
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_layout_append_compact_lifecycle(emb_ds, tmp_path):
    """Lifecycle invariants of the persisted IVF layout:
    (1) base(EVEN) + append(ODD) answers bit-equal a JOINT layout built
        in one write with the same base centroids — appends add
        postings, never shift cell boundaries;
    (2) the append is invisible until its atomic meta commit (data
        written first, meta bump last);
    (3) compaction rewrites everything into one generation, retires
        old dirs, and answers stay bit-identical."""
    import glob
    import json
    import os

    import ray.data

    from textpipe_ray.stages.ann import (
        ann_ivf_topk_layout,
        append_ivf_layout,
        compact_ivf_layout,
        write_ivf_layout,
    )

    ds, vecs = emb_ds
    qids = np.arange(3, dtype=np.int64)
    qmat = vecs[:3]

    import pyarrow as pa

    def half(parity):
        def f(b):
            v = b.column("vec_id").to_numpy()
            return b.filter(pa.array(v % 2 == parity))
        return ds.map_batches(f, batch_format="pyarrow")

    lay = str(tmp_path / "lifecycle")
    cents = write_ivf_layout(half(0), lay, num_centroids=16, sample_size=2048, seed=13)

    # (2) data-before-commit: snapshot assigned + written under gen-1,
    # but until the meta bump the reader must see the base only
    before, _, _ = ann_ivf_topk_layout(lay, qids, qmat, k=10, nprobe=4)
    before = before.to_pandas()
    assert set(before["neighbor_id"]) <= set(range(0, 400, 2))

    append_ivf_layout(lay, half(1))
    meta = json.load(open(f"{lay}/_meta.json"))
    assert meta["gens"] == [1] and meta["base"] is True

    got, _, _ = ann_ivf_topk_layout(lay, qids, qmat, k=10, nprobe=4)
    got = got.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    # (1) joint layout with the SAME centroids
    joint = str(tmp_path / "joint")
    write_ivf_layout(ds, joint, centroids=cents)
    want, _, _ = ann_ivf_topk_layout(joint, qids, qmat, k=10, nprobe=4)
    want = want.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    cols = ["query_id", "neighbor_id", "rank", "cos_q"]
    assert got[cols].equals(want[cols])

    # (3) compaction: same answers, old dirs retired, one generation
    compact_ivf_layout(lay)
    meta = json.load(open(f"{lay}/_meta.json"))
    assert meta["base"] is False and len(meta["gens"]) == 1
    assert not glob.glob(f"{lay}/cell=*") and not os.path.isdir(f"{lay}/gen-1")
    after, _, _ = ann_ivf_topk_layout(lay, qids, qmat, k=10, nprobe=4)
    after = after.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert after[cols].equals(want[cols])

    # further appends still work after compaction
    append_ivf_layout(lay, half(1))
    meta = json.load(open(f"{lay}/_meta.json"))
    assert len(meta["gens"]) == 2


def test_ivf_append_retry_is_idempotent(emb_ds, tmp_path):
    """A crashed append (gen dir written, meta never bumped) must be
    invisible to readers, and the RETRY must replace the orphan rather
    than append alongside it (no doubled postings)."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import (
        ann_ivf_topk_layout,
        append_ivf_layout,
        write_ivf_layout,
    )

    ds, vecs = emb_ds
    qids = np.arange(3, dtype=np.int64)
    qmat = vecs[:3]

    def half(parity):
        def f(b):
            v = b.column("vec_id").to_numpy()
            return b.filter(pa.array(v % 2 == parity))
        return ds.map_batches(f, batch_format="pyarrow")

    lay = str(tmp_path / "retry")
    write_ivf_layout(half(0), lay, num_centroids=16, sample_size=2048, seed=13)
    baseline, _, _ = ann_ivf_topk_layout(lay, qids, qmat, k=10, nprobe=4)
    baseline = baseline.to_pandas()

    # simulate the crash: gen-1 data lands on disk, no meta bump
    import shutil

    tmp_lay = str(tmp_path / "donor")
    write_ivf_layout(half(1), tmp_lay, num_centroids=16, sample_size=2048, seed=13)
    shutil.copytree(
        glob.glob(f"{tmp_lay}")[0], f"{lay}/gen-1",
        ignore=shutil.ignore_patterns("centroids.npy"),
    )
    crashed, _, _ = ann_ivf_topk_layout(lay, qids, qmat, k=10, nprobe=4)
    # (2) invisible: identical answer to the pre-crash layout
    assert crashed.to_pandas().equals(baseline)

    # retry the append: orphan replaced, not appended to
    append_ivf_layout(lay, half(1))
    total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{lay}/gen-1/cell=*/*.parquet")
    )
    assert total == 200  # exactly one copy of the odd half
    meta = json.load(open(f"{lay}/_meta.json"))
    assert meta["gens"] == [1]


def test_pq_matches_independent_reference(emb_ds):
    """The distributed encode→ADC→merge chain must equal a plain-Python
    reference computing the same PQ search over the same codebooks."""
    from textpipe_ray.stages.ann import (
        _uniform_sample,
        ann_pq_topk,
        train_pq,
    )

    ds, vecs = emb_ds
    qids = np.arange(5, dtype=np.int64)
    qmat = vecs[:5]
    k = 10
    m_sub, n_codes = 4, 16  # dim 16 → 4 subspaces of 4

    out = ann_pq_topk(
        ds, qids, qmat, k=k, m_subspaces=m_sub, n_codes=n_codes
    ).to_pandas()

    # reference: same codebooks (deterministic sample + seeds), but
    # encode/ADC/top-k re-derived with plain loops
    sample = _uniform_sample(ds, 2048, "vec_id", "embedding")
    books = train_pq(sample, m_sub, n_codes)
    dsub = vecs.shape[1] // m_sub
    x = vecs / np.sqrt((vecs * vecs).sum(axis=1))[:, None]
    codes = np.empty((len(x), m_sub), dtype=np.int64)
    for i in range(len(x)):
        for m in range(m_sub):
            d = ((books[m] - x[i, m * dsub : (m + 1) * dsub]) ** 2).sum(axis=1)
            codes[i, m] = int(d.argmin())
    qhat = qmat / np.sqrt((qmat * qmat).sum(axis=1))[:, None]
    for j, qid in enumerate(qids):
        scores = np.zeros(len(x))
        for i in range(len(x)):
            s = 0.0
            for m in range(m_sub):
                s += float(qhat[j, m * dsub : (m + 1) * dsub] @ books[m][codes[i, m]])
            scores[i] = s
        sq = np.floor(scores * 1e9).astype(np.int64)
        ids = np.arange(len(x), dtype=np.int64)
        keep = ids != qid
        order = np.lexsort((ids[keep], -sq[keep]))[:k]
        exp_n = ids[keep][order]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert list(got["neighbor_id"]) == list(exp_n), qid
        assert list(got["cos_q"]) == list(sq[keep][order]), qid


def test_pq_recall_vs_brute(emb_ds):
    """PQ's contract: the exact top-10 lives inside the ADC top-50
    shortlist (recall@10-in-top-50 high), and the refined search (ADC
    candidates + exact re-rank) recovers the exact top-10 almost
    everywhere."""
    from textpipe_ray.stages.ann import ann_pq_topk

    ds, vecs = emb_ds
    qids = np.arange(5, dtype=np.int64)
    qmat = vecs[:5]
    shortlist = ann_pq_topk(ds, qids, qmat, k=50, m_subspaces=4, n_codes=16).to_pandas()
    refined = ann_pq_topk(
        ds, qids, qmat, k=10, m_subspaces=4, n_codes=16, refine=5
    ).to_pandas()

    norms = np.sqrt((vecs * vecs).sum(axis=1))
    sims = (vecs @ qmat.T) / (norms[:, None] * norms[:5][None, :])
    short_rec, ref_rec = [], []
    for j, qid in enumerate(qids):
        s = sims[:, j].copy()
        s[qid] = -np.inf
        truth = set(np.argsort(-s)[:10])
        in_short = set(shortlist[shortlist["query_id"] == qid]["neighbor_id"])
        got = refined[refined["query_id"] == qid]
        assert len(got) == 10
        short_rec.append(len(truth & in_short) / 10)
        ref_rec.append(len(truth & set(got["neighbor_id"])) / 10)
    assert np.mean(short_rec) >= 0.9, short_rec
    assert np.mean(ref_rec) >= 0.9, ref_rec
    # the re-rank scores are EXACT quantized cosines for the survivors
    for _, r in refined.iterrows():
        exact = np.floor(sims[int(r["neighbor_id"]), int(r["query_id"])] * 1e9)
        assert int(r["cos_q"]) == int(exact)


def test_pq_scores_bound_exchange_and_layout_independent(emb_ds):
    """The ADC scoring stage emits ≤ k rows per query per batch, and
    the merged result is identical under any block layout."""
    from textpipe_ray.stages.ann import (
        _uniform_sample,
        ann_pq_scores,
        ann_pq_topk,
        pq_encode,
        train_pq,
    )

    ds, vecs = emb_ds
    qids = np.arange(5, dtype=np.int64)
    qmat = vecs[:5]
    k = 10
    sample = _uniform_sample(ds, 2048, "vec_id", "embedding")
    books = train_pq(sample, 4, 16)
    codes = pq_encode(ds, books)  # emb_ds has 4 blocks
    scored = ann_pq_scores(codes, books, qids, qmat, k=k).count()
    assert scored <= k * len(qids) * 4, scored

    a = (
        ann_pq_topk(ds, qids, qmat, k=k, m_subspaces=4, n_codes=16)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        ann_pq_topk(ds.repartition(1), qids, qmat, k=k, m_subspaces=4, n_codes=16)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pq_rejects_oversized_codebook():
    """Codes are uint8; n_codes > 256 must raise instead of silently
    wrapping indices mod 256 (wrong neighbors, no error)."""
    from textpipe_ray.stages.ann import train_pq

    with pytest.raises(ValueError, match="256"):
        train_pq(np.random.RandomState(0).standard_normal((400, 16)), 4, 512)


def test_refine_hot_cells_bounds_planted_skew(ray_session):
    """The SemDeDup skew hole: a planted diverse mega-cell (1500 rows
    vs cap=256) must be recursively split BEFORE the groupby so no
    single map_groups task is O(mega²).  Asserts the per-cell pair
    bound, row conservation, and run-to-run determinism."""
    import pyarrow as pa

    import ray
    import ray.data
    from textpipe_ray.stages.ann import assign_cells, refine_hot_cells

    rng = np.random.RandomState(7)
    small = rng.randn(50, 8) + 100.0
    mega = rng.randn(1500, 8) * 5.0 - 100.0  # diverse blob → one cell
    vecs = np.vstack([small, mega])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(6)
    cents = np.array([[100.0] * 8, [-100.0] * 8])
    cap = 256

    refined = refine_hot_cells(
        assign_cells(ds, ray.put(cents)), cap=cap, sub_sample=128, seed=3
    )
    counts = [int(r["count()"]) for r in refined.groupby("cell").count().take_all()]
    assert sum(counts) == len(vecs)  # no rows lost or duplicated
    # bounded per-cell pair count: max m² is ~cap², not 1500²
    assert max(counts) <= cap
    assert sum(c * c for c in counts) < 1500 * 1500 // 4

    # deterministic end-to-end (hash sampling + seeded k-means)
    again = refine_hot_cells(
        assign_cells(ds, ray.put(cents)), cap=cap, sub_sample=128, seed=3
    )
    m1 = sorted(
        (r["vec_id"], r["cell"])
        for r in refined.select_columns(["vec_id", "cell"]).take_all()
    )
    m2 = sorted(
        (r["vec_id"], r["cell"])
        for r in again.select_columns(["vec_id", "cell"]).take_all()
    )
    assert m1 == m2


def test_refine_hot_cells_identity_when_balanced(ray_session):
    """No hot cells → cell ids pass through untouched (golden outputs
    at test scale stay byte-identical)."""
    import pyarrow as pa

    import ray
    import ray.data
    from textpipe_ray.stages.ann import assign_cells, refine_hot_cells

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((120, 8))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(120), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(3)
    cents = rng.standard_normal((8, 8))
    base = assign_cells(ds, ray.put(cents))
    refined = refine_hot_cells(base, cap=256)
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in base.select_columns(["vec_id", "cell"]).take_all()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in refined.select_columns(["vec_id", "cell"]).take_all()
    )
    assert a == b


def test_refine_hot_cells_identical_vector_blob_terminates(ray_session):
    """The one geometry no split can separate: a hot cell of IDENTICAL
    vectors.  refine_hot_cells must terminate at max_depth without
    losing rows — and this is exactly the case where the downstream
    chunked greedy is LINEAR (first kept row blocks everything), so
    leaving it unsplit is safe by construction."""
    import pyarrow as pa

    import ray
    import ray.data
    from textpipe_ray.stages.ann import assign_cells, refine_hot_cells

    vecs = np.tile(np.array([[-100.0] * 8]), (800, 1))  # 800 identical
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(800), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    cents = np.array([[100.0] * 8, [-100.0] * 8])
    refined = refine_hot_cells(
        assign_cells(ds, ray.put(cents)), cap=256, sub_sample=64, max_depth=3, seed=5
    )
    counts = [int(r["count()"]) for r in refined.groupby("cell").count().take_all()]
    assert sum(counts) == 800  # nothing lost, no infinite loop
