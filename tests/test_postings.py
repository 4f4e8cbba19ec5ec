"""Postings layout: pruned reads, tokenizer guard, full-scan parity."""

import glob
import json

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    from textpipe_ray.pipelines.queries import TFIDF_TOKEN_RE, _read
    from textpipe_ray.stages.postings import write_postings_layout

    path = str(tmp_path_factory.mktemp("postings"))
    meta = write_postings_layout(
        _read(SF, "documents", ["doc_id", "text"]),
        path,
        token_pattern=TFIDF_TOKEN_RE,
        num_buckets=16,
    )
    return path, meta


def test_meta_stats_exact(layout):
    """n_docs / sum_dl in the committed meta must equal the direct
    corpus counts — the stats-bucket fold is exact, not sampled."""
    import duckdb

    path, meta = layout
    n, sdl = duckdb.sql(
        f"""SELECT count(*), sum(len(regexp_extract_all(lower(text), '[0-9a-z_]+')))
        FROM '{SF}/documents.parquet'"""
    ).fetchone()
    assert meta["n_docs"] == n
    assert meta["sum_dl"] == sdl


def test_pruned_read_touches_only_query_buckets(layout):
    """The layout's reason to exist: a query must open strictly fewer
    bucket partitions than the layout holds."""
    from textpipe_ray.pipelines.queries import BM25_TERMS
    from textpipe_ray.stages.postings import term_buckets

    path, meta = layout
    nb = meta["num_buckets"]
    need = set(int(x) for x in term_buckets(BM25_TERMS, nb))
    assert len(need) < nb  # 6 terms into 16 buckets
    # the query's buckets all exist on disk AND are a strict subset of
    # the populated ones — the pruned read skips real data, not air
    on_disk = {
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{path}/bucket=*")
        if int(p.rsplit("=", 1)[1]) < nb
    }
    assert need <= on_disk
    assert len(need) < len(on_disk), "fixture too small to prove pruning"


def test_layout_matches_full_scan_bm25(layout, ray_session):
    """bm25_topk_layout must reproduce q_bm25's top-k row-for-row
    (same floats, same quantization, same tie-breaks) whenever the
    top-k is all positive-score docs — the IEEE +0.0 fold argument."""
    from textpipe_ray.pipelines.queries import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
        TFIDF_TOKEN_RE,
        q_bm25,
    )
    from textpipe_ray.stages.postings import bm25_topk_layout

    path, _ = layout
    got = (
        bm25_topk_layout(path, BM25_TERMS, BM25_TOPK, k1=BM25_K1, b=BM25_B,
                         token_pattern=TFIDF_TOKEN_RE)
        .to_pandas()
        .sort_values(["bm25_micro", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = (
        q_bm25(SF)
        .to_pandas()
        .sort_values(["bm25_micro", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert (want["bm25_micro"].to_numpy() > 0).all(), "fixture lost positive scores"
    assert np.array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    assert np.array_equal(got["bm25_micro"].to_numpy(), want["bm25_micro"].to_numpy())


def test_tokenizer_guard_refuses_mismatch(layout):
    from textpipe_ray.stages.postings import postings_meta

    path, _ = layout
    with pytest.raises(ValueError, match="different tokenizer"):
        postings_meta(path, token_pattern=r"\S+")


def test_format_guard_refuses_foreign_meta(layout, tmp_path):
    from textpipe_ray.stages.postings import postings_meta

    bad = tmp_path / "foreign"
    bad.mkdir()
    (bad / "_meta.json").write_text(json.dumps({"format": "other-v9"}))
    with pytest.raises(ValueError, match="not a textpipe_ray-postings"):
        postings_meta(str(bad))


def test_append_compact_lifecycle_matches_joint_write(ray_session, tmp_path):
    """Base(even docs) + append(odd docs) must score bit-equal to a
    joint single-write layout; compaction must preserve the result and
    retire the old directories; an uncommitted gen dir is invisible."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from textpipe_ray.pipelines.queries import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
        TFIDF_TOKEN_RE,
        _read,
    )
    from textpipe_ray.stages.postings import (
        append_postings_layout,
        bm25_topk_layout,
        compact_postings_layout,
        postings_meta,
        write_postings_layout,
    )

    ds = _read(SF, "documents", ["doc_id", "text"])

    def half(parity):
        def f(b: pa.Table) -> pa.Table:
            d = np.asarray(pc.cast(b.column("doc_id"), pa.int64()), dtype=np.int64)
            return b.filter(pa.array(d % 2 == parity))

        return ds.map_batches(f, batch_format="pyarrow")

    kw = dict(token_pattern=TFIDF_TOKEN_RE, num_buckets=16)
    joint = str(tmp_path / "joint")
    write_postings_layout(ds, joint, **kw)
    want = bm25_topk_layout(joint, BM25_TERMS, BM25_TOPK, k1=BM25_K1, b=BM25_B).to_pandas()
    want = want.sort_values(["bm25_micro", "doc_id"], ascending=[False, True]).reset_index(drop=True)

    grown = str(tmp_path / "grown")
    write_postings_layout(half(0), grown, **kw)
    gen = append_postings_layout(grown, half(1))
    assert gen == 1
    meta = postings_meta(grown)
    assert meta["n_docs"] == postings_meta(joint)["n_docs"]
    assert meta["sum_dl"] == postings_meta(joint)["sum_dl"]

    def run(path):
        got = bm25_topk_layout(path, BM25_TERMS, BM25_TOPK, k1=BM25_K1, b=BM25_B).to_pandas()
        return got.sort_values(["bm25_micro", "doc_id"], ascending=[False, True]).reset_index(drop=True)

    got = run(grown)
    assert np.array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    assert np.array_equal(got["bm25_micro"].to_numpy(), want["bm25_micro"].to_numpy())

    # an uncommitted (crashed) generation directory must be invisible
    import shutil

    shutil.copytree(f"{grown}/gen-1", f"{grown}/gen-2")
    got = run(grown)
    assert np.array_equal(got["bm25_micro"].to_numpy(), want["bm25_micro"].to_numpy())

    # compact: new gen = max(committed)+1 = 2 — the crashed gen-2 dir is
    # cleared first (retry idempotence), result preserved, base bucket
    # dirs + old gens retired
    compact_postings_layout(grown)
    meta = postings_meta(grown)
    assert meta["gens"] == [2] and meta["base"] is False
    got = run(grown)
    assert np.array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    assert np.array_equal(got["bm25_micro"].to_numpy(), want["bm25_micro"].to_numpy())
    assert not glob.glob(f"{grown}/bucket=*")
    assert not glob.glob(f"{grown}/gen-1")
