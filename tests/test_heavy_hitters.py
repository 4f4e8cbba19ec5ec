"""CMS heavy-hitters: kernel guarantees + end-to-end cross-check
against an independent exact count."""

import collections
import glob
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from textpipe_ray.functions.cms import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_buckets,
    cms_dense,
    cms_estimate,
)

SF = "/root/testdata/sf0.001"


def _zipf_items(n_distinct=5000, total=60000, seed=7):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_distinct + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    hashes = rng.integers(0, 2**62, size=n_distinct, dtype=np.int64)
    draws = rng.choice(n_distinct, size=total, p=p)
    uniq, cnt = np.unique(draws, return_counts=True)
    return hashes[uniq], cnt.astype(np.int64)


def _merge_partials(splits):
    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for h, c in splits:
        cms += cms_dense(h, c)
    return cms


def test_cms_merge_is_layout_independent():
    h, c = _zipf_items()
    whole = _merge_partials([(h, c)])
    # arbitrary 3-way split of the same multiset, different order
    i1, i2 = len(h) // 3, 2 * len(h) // 3
    split = _merge_partials(
        [(h[i2:], c[i2:]), (h[:i1], c[:i1]), (h[i1:i2], c[i1:i2])]
    )
    assert np.array_equal(whole, split)


def test_cms_estimate_overestimates_every_item():
    h, c = _zipf_items()
    cms = _merge_partials([(h, c)])
    est = cms_estimate(cms, h)
    assert np.all(est >= c)
    # the head of a Zipf distribution should be estimated tightly:
    # its own mass dominates its buckets
    top = np.argsort(-c)[:10]
    assert np.all(est[top] - c[top] <= c.sum() * 2 // CMS_WIDTH)


def test_cms_dense_preserves_mass_and_bucket_range():
    h, c = _zipf_items()
    dense = cms_dense(h, c)
    assert dense.shape == (CMS_DEPTH, CMS_WIDTH)
    # every occurrence lands in exactly one bucket per depth row
    assert (dense.sum(axis=1) == c.sum()).all()
    bk = cms_buckets(h)
    assert bk.min() >= 0 and bk.max() < CMS_WIDTH


def test_local_candidate_bound():
    # at most DEN/NUM items can hold a ≥ NUM/DEN share of one batch
    from textpipe_ray.pipelines.queries import HH_PHI_DEN, HH_PHI_NUM

    h, c = _zipf_items()
    n_b = int(c.sum())
    loc = c * HH_PHI_DEN >= n_b * HH_PHI_NUM
    assert int(loc.sum()) <= HH_PHI_DEN // HH_PHI_NUM


def _exact_paragraph_counts(sf_dir):
    from textpipe_ray.functions.clean import html_to_paragraphs
    from textpipe_ray.pipelines.queries import pages_dir_for

    cnt = collections.Counter()
    for f in sorted(glob.glob(pages_dir_for(sf_dir) + "/pages-*.parquet")):
        for h in pq.read_table(f, columns=["html"]).column("html").to_pylist():
            raw = h.decode("utf8", "replace") if isinstance(h, bytes) else h
            for p in html_to_paragraphs(raw):
                cnt[p] += 1
    return cnt


def test_heavy_hitters_match_exact_counts(ray_session):
    """End-to-end vs an INDEPENDENT exact count (python Counter over
    the same pages parquet): the query must return exactly the ≥φ·N
    set with exact counts, and cms_est must upper-bound every count."""
    from textpipe_ray.pipelines.queries import HH_PHI_DEN, HH_PHI_NUM, q_heavy_hitters

    exact = _exact_paragraph_counts(SF)
    n = sum(exact.values())
    want = {
        p: c for p, c in exact.items() if c * HH_PHI_DEN >= n * HH_PHI_NUM
    }
    got = q_heavy_hitters(SF).to_pandas()
    assert dict(zip(got["paragraph"], got["cnt"])) == want
    assert (got["cms_est"] >= got["cnt"]).all()
    # output ordering contract: cnt desc, paragraph asc
    key = list(zip(-got["cnt"], got["paragraph"]))
    assert key == sorted(key)


def test_distributed_prune_path_identical(ray_session):
    """collect_bound=0 forces the corpus-scale path (driver collects
    only the sketch; candidates prune distributed) — output must be
    byte-identical to the direct-collect path."""
    from textpipe_ray.pipelines.queries import _heavy_hitters, q_heavy_hitters

    a = q_heavy_hitters(SF).to_pandas()
    b = _heavy_hitters(SF, collect_bound=0).to_pandas()
    assert a.equals(b)
