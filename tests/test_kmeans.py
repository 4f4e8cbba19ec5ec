"""q_kmeans: the distributed Lloyd iterations must reproduce a
single-process full-batch reference bit-for-bit — the fixed-point
integer contract makes the per-cell sums exact integers, so block
layout, batching and scheduling order cannot perturb the centroids."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _reference(ray_session):
    """Single-process Lloyd with the SAME integer contract, one numpy
    array, no blocking — any divergence in the distributed reduction
    shows up as a value mismatch."""
    import ray.data

    from textpipe_ray.pipelines.queries import KMEANS_ITERS, KMEANS_K, KMEANS_Q
    from textpipe_ray.stages.ann import _uniform_sample

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    cents = _uniform_sample(ds, KMEANS_K, "vec_id", "embedding")
    xi = np.floor(x * KMEANS_Q).astype(np.int64)
    for _ in range(KMEANS_ITERS):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = cents.copy()
        for c in range(KMEANS_K):
            m = a == c
            n = int(m.sum())
            if n > 0:
                new[c] = (xi[m].sum(axis=0) / KMEANS_Q) / n
        cents = new
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    sq = np.floor(d[np.arange(len(x)), a] * KMEANS_Q).astype(np.int64)
    return ids, a.astype(np.int64), sq


def test_kmeans_matches_single_process_reference(ray_session):
    from textpipe_ray.pipelines.queries import q_kmeans

    got = q_kmeans(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids, cells, sq = _reference(ray_session)
    order = np.argsort(ids)
    assert got["vec_id"].to_numpy().tolist() == ids[order].tolist()
    assert got["cell"].to_numpy().tolist() == cells[order].tolist()
    assert got["sqdist_micro"].to_numpy().tolist() == sq[order].tolist()


def test_kmeans_cells_valid_and_populated(ray_session):
    from textpipe_ray.pipelines.queries import KMEANS_K, q_kmeans

    df = q_kmeans(SF).to_pandas()
    assert df["cell"].between(0, KMEANS_K - 1).all()
    # clustered synthetic embeddings: expect several cells in use
    assert df["cell"].nunique() >= 3
    assert (df["sqdist_micro"] >= 0).all()
