"""Distributed IRLS quality-classifier training (q_classifier_train).

Planted ground truth: the teacher labels come from the rule set the
features feed, so a correctly-trained linear model must reproduce them
almost perfectly on the HELD-OUT half.  The fixed-point sufficient
statistics must make training bit-identical under any block layout.
The layout/loss tests run the SAME ``clf_featurize`` the shipped query
uses (imported, not copied) so they certify the production featurization.
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


@pytest.fixture(scope="module")
def feats(ray_session):
    """Materialized feature table via the PRODUCTION featurize pass."""
    from textpipe_ray.pipelines import queries as Q

    ds = Q._read(SF, "documents", ["doc_id", "text"])
    return ds.map_batches(Q.clf_featurize, batch_format="pyarrow").materialize()


def test_block_layout_independence(feats):
    """The per-row fixed-point quantization makes the learned
    coefficients EXACTLY equal under different block layouts — the
    property that keeps training deterministic across cluster sizes."""
    from textpipe_ray.functions.quality_score import SCORE_FEATURES
    from textpipe_ray.pipelines import queries as Q

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


def test_loss_decreases(feats):
    from textpipe_ray.functions.quality_score import SCORE_FEATURES
    from textpipe_ray.pipelines import queries as Q

    _, _, _, losses, _ = Q._train_quality_classifier(feats, list(SCORE_FEATURES))
    assert len(losses) == Q.CLF_ITERS
    assert losses[-1] < losses[0]
    # Newton on a convex objective: monotone after the first step
    assert all(b <= a + 1e-12 for a, b in zip(losses[1:], losses[2:]))
