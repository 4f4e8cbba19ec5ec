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
