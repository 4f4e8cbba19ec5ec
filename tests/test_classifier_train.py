"""Distributed IRLS quality-classifier training (q_classifier_train).

Planted ground truth: the teacher labels come from the rule set the
features feed, so a correctly-trained linear model must reproduce them
almost perfectly on the HELD-OUT half.  The fixed-point sufficient
statistics must make training bit-identical under any block layout.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(ray_session):
    from textpipe_ray.pipelines import queries as Q

    return Q.q_classifier_train(SF).to_pandas()


def test_holdout_accuracy(result):
    hold = result[~result.is_train]
    assert len(hold) > 100
    acc = (hold.pred == hold.keep).mean()
    assert acc >= 0.95, acc


def test_split_and_prob_bounds(result):
    assert 0.3 < result.is_train.mean() < 0.7
    assert result.prob_micro.between(0, 10**9).all()
    # pred must be exactly the z>0 side of the quantized probability
    assert ((result.prob_micro > 5 * 10**8) == result.pred).mean() > 0.99


def test_block_layout_independence(ray_session):
    """The per-row fixed-point quantization makes the learned
    coefficients EXACTLY equal under different block layouts — the
    property that keeps training deterministic across cluster sizes."""
    from textpipe_ray.functions.quality_score import SCORE_FEATURES
    from textpipe_ray.pipelines import queries as Q

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from textpipe_ray.stages.ann import _id_hash
    from textpipe_ray.stages.text import quality_batch

    ds = Q._read(SF, "documents", ["doc_id", "text"])

    def featurize(batch: pa.Table) -> pa.Table:
        b = quality_batch(batch, text_col="text")
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for f in SCORE_FEATURES:
            v = np.asarray(b.column(f), dtype=np.float64)
            cols[f + "_micro"] = pa.array(
                np.floor(v * Q.CLF_QF).astype(np.int64), pa.int64()
            )
        cols["y"] = pc.cast(b.column("keep"), pa.int8())
        cols["is_train"] = pa.array((_id_hash(ids) % np.uint64(2)) == 0)
        return pa.table(cols)

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    betas = []
    for nblocks in (1, 7):
        f = feats.repartition(nblocks).materialize()
        beta, mu, sd, losses, n = Q._train_quality_classifier(
            f, list(SCORE_FEATURES)
        )
        betas.append((beta, mu, sd, losses, n))
    (b1, m1, s1, l1, n1), (b2, m2, s2, l2, n2) = betas
    assert n1 == n2
    assert np.array_equal(b1, b2)  # exact, not allclose
    assert np.array_equal(m1, m2) and np.array_equal(s1, s2)
    assert l1 == l2


def test_loss_decreases(ray_session):
    from textpipe_ray.functions.quality_score import SCORE_FEATURES
    from textpipe_ray.pipelines import queries as Q

    import pyarrow as pa
    import pyarrow.compute as pc
    from textpipe_ray.stages.ann import _id_hash
    from textpipe_ray.stages.text import quality_batch

    ds = Q._read(SF, "documents", ["doc_id", "text"])

    def featurize(batch: pa.Table) -> pa.Table:
        b = quality_batch(batch, text_col="text")
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for f in SCORE_FEATURES:
            v = np.asarray(b.column(f), dtype=np.float64)
            cols[f + "_micro"] = pa.array(
                np.floor(v * Q.CLF_QF).astype(np.int64), pa.int64()
            )
        cols["y"] = pc.cast(b.column("keep"), pa.int8())
        cols["is_train"] = pa.array((_id_hash(ids) % np.uint64(2)) == 0)
        return pa.table(cols)

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    _, _, _, losses, _ = Q._train_quality_classifier(feats, list(SCORE_FEATURES))
    assert len(losses) == Q.CLF_ITERS
    assert losses[-1] < losses[0]
    # Newton on a convex objective: monotone after the first step
    assert all(b <= a + 1e-12 for a, b in zip(losses[1:], losses[2:]))
