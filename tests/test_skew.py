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
