"""ShardedVectorStore: the >node-RAM KeyedVectors story (reference
wrappers.py:20-125 Redis analog as Ray shard actors)."""

import numpy as np


def _items(n=200, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    return {f"word{i}": rng.standard_normal(dim).tolist() for i in range(n)}


def test_lookup_matches_source_and_reports_misses(ray_session):
    from textpipe_ray.state.vecstore import ShardedVectorStore

    items = _items()
    store = ShardedVectorStore.from_items(items, dim=8, num_shards=4)
    assert store.total_size() == len(items)

    keys = ["word3", "nope", "word199", "word42", "alsomissing"]
    mat, hit = store.lookup(keys)
    assert mat.shape == (5, 8)
    assert hit.tolist() == [True, False, True, True, False]
    np.testing.assert_allclose(mat[0], items["word3"])
    np.testing.assert_allclose(mat[2], items["word199"])
    assert (mat[1] == 0).all() and (mat[4] == 0).all()
    # empty batch
    m0, h0 = store.lookup([])
    assert m0.shape == (0, 8) and len(h0) == 0


def test_lookup_inside_map_batches_stage(ray_session):
    """The intended use: the store handle rides into a map_batches
    closure; each batch costs one RPC per touched shard."""
    import pyarrow as pa

    import ray.data

    from textpipe_ray.state.vecstore import ShardedVectorStore

    items = _items()
    store = ShardedVectorStore.from_items(items, dim=8, num_shards=4)

    ds = ray.data.from_arrow(
        pa.table({"word": pa.array([f"word{i}" for i in range(100)] + ["missing"] * 4)})
    ).repartition(4)

    def embed(batch: pa.Table) -> pa.Table:
        keys = batch.column("word").to_pylist()
        mat, hit = store.lookup(keys)
        return pa.table(
            {
                "word": batch.column("word"),
                "norm_micro": pa.array(
                    np.floor(np.sqrt((mat * mat).sum(axis=1)) * 1e6).astype(np.int64),
                    pa.int64(),
                ),
                "hit": pa.array(hit),
            }
        )

    out = ds.map_batches(embed, batch_format="pyarrow").to_pandas().set_index("word")
    assert int(out["hit"].sum()) == 100
    v = np.asarray(items["word7"])
    assert out.loc["word7", "norm_micro"] == int(np.floor(np.sqrt((v * v).sum()) * 1e6))
    assert (out.loc["missing", "norm_micro"] == 0).all()
