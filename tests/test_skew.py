"""Skew handling: the url-hash part_id must balance partitions even
when hosts are Zipf-skewed, and the pre-scoring shuffle must not change
pipeline semantics."""

import numpy as np
import pytest


def test_url_hash_balances_zipf_hosts(ray_session):
    """Host distribution is Zipf (top host ~28% of pages) but url-hash
    partitioning spreads rows near-uniformly — the north rule's answer
    to host-domain skew."""
    import pyarrow as pa

    from textpipe_ray.pipelines.flagship import add_part_id
    from textpipe_ray.sources.pages import generate_pages

    t = generate_pages(2000, seed=21)
    out = add_part_id(t, num_parts=16)
    # input IS skewed by host...
    hosts = [u.split("/")[2] for u in out.column("url").to_pylist()]
    _, host_counts = np.unique(hosts, return_counts=True)
    assert host_counts.max() > 2000 / 20 * 2  # top host well above uniform
    # ...but partitions are balanced
    _, part_counts = np.unique(np.asarray(out.column("part_id")), return_counts=True)
    assert len(part_counts) == 16
    assert part_counts.max() / part_counts.min() < 1.6, part_counts


def test_shuffle_before_scoring_semantics_invariant(ray_session, pages_dir):
    """repartition(shuffle=True) before the actor pool changes physical
    layout only: keep/drop, clean bytes and perplexity are identical."""
    import glob as _glob

    from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages

    files = sorted(_glob.glob(f"{pages_dir}/pages-*.parquet"))
    a = (
        build_pages_pipeline(read_pages(files), shuffle_before_scoring=False)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        build_pages_pipeline(read_pages(files), shuffle_before_scoring=True, shuffle_blocks=8)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    for col in ("url", "clean", "keep", "drop_reason", "pred_lang", "perplexity"):
        assert list(a[col]) == list(b[col]), col


def test_skew_salt_left_spreads_hot_key():
    """A hot key's fact rows spread near-uniformly over SKEW_SALTS
    buckets; cold keys stay at salt 0 (no pointless replication)."""
    from textpipe_ray.pipelines.queries import SKEW_SALTS, skew_salt_left

    okey = np.arange(10_000, dtype=np.int64)
    ckey = np.where(okey % 4 == 0, 7, okey % 100 + 1000)  # key 7 holds 25%
    hot = np.asarray([7], dtype=np.int64)
    salt = skew_salt_left(okey, ckey, hot)
    assert (salt[ckey != 7] == 0).all()
    _, counts = np.unique(salt[ckey == 7], return_counts=True)
    assert len(counts) == SKEW_SALTS
    assert counts.max() / counts.min() < 1.5, counts


def test_skew_replicate_right_exact_copies():
    """Dimension side: hot keys get exactly one copy per salt bucket
    (0..R-1), cold keys exactly one copy at salt 0."""
    from textpipe_ray.pipelines.queries import SKEW_SALTS, skew_replicate_right

    ishot = np.asarray([False, True, False, True])
    idx, salt = skew_replicate_right(4, ishot)
    assert idx.tolist() == [0] + [1] * SKEW_SALTS + [2] + [3] * SKEW_SALTS
    assert salt[0] == 0 and salt[1 + SKEW_SALTS] == 0
    assert salt[1 : 1 + SKEW_SALTS].tolist() == list(range(SKEW_SALTS))
    assert salt[2 + SKEW_SALTS :].tolist() == list(range(SKEW_SALTS))
    # empty input
    idx0, salt0 = skew_replicate_right(0, np.zeros(0, dtype=bool))
    assert len(idx0) == 0 and len(salt0) == 0


def test_skew_join_detects_planted_hot_key(ray_session):
    """The measurement pass flags exactly the planted hot customer at
    sf0.001 (key 1 holds ~20% of fact rows; uniform keys ~0.07%)."""
    import ray as _ray

    from textpipe_ray.pipelines.compare import compare, run_oracle
    from textpipe_ray.pipelines.oracle import build_oracle_sql
    from textpipe_ray.pipelines.queries import q_skew_join

    sf = "/root/testdata/sf0.001"
    res = q_skew_join(sf)
    c = compare(res, run_oracle(sf, build_oracle_sql()["q_skew_join"]))
    assert c["rows_match"] and c["cols_match"] and c["values_match"], c
