"""Empty-shard robustness: at crawl scale some input files ARE empty
(a host bucket with nothing that day, a filtered-out WARC segment) and
some partitions end up with zero rows after filtering.  The flagship
job and the heavier dedup chains must treat a zero-row shard as a
no-op — same output as without it, no crash, no schema loss."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _pages_with_empty_shard(tmp_path):
    from textpipe_ray.sources.pages import write_pages

    src = str(tmp_path / "pages_src")
    write_pages(src, 300, num_files=2)
    mixed = str(tmp_path / "pages_mixed")
    os.makedirs(mixed, exist_ok=True)
    for f in glob.glob(f"{src}/pages-*.parquet"):
        shutil.copy(f, mixed)
    # one zero-row shard with the exact pages schema, sorted first by
    # name so it is the FIRST file the reader opens (schema inference
    # must not degrade on it)
    pq.write_table(PAGES_SCHEMA.empty_table(), f"{mixed}/pages-0000-empty.parquet")
    shutil.copy(f"{src}/expected.parquet", mixed)
    return src, mixed


def test_flagship_job_ignores_empty_shard(ray_session, tmp_path):
    import duckdb

    from textpipe_ray.pipelines.runner import run_pages_job

    src, mixed = _pages_with_empty_shard(tmp_path)
    out_a = str(tmp_path / "out_plain")
    out_b = str(tmp_path / "out_mixed")
    s_a = run_pages_job(f"{src}/pages-*.parquet", out_a, num_partitions=2)
    s_b = run_pages_job(f"{mixed}/pages-*.parquet", out_b, num_partitions=2)
    assert s_a["totals"]["rows"] == s_b["totals"]["rows"] == 300
    assert s_a["totals"]["kept"] == s_b["totals"]["kept"]
    con = duckdb.connect()
    n_diff = con.execute(
        f"""
        select count(*) from (
          (select * from parquet_scan('{out_a}/part-*/*.parquet')
           except
           select * from parquet_scan('{out_b}/part-*/*.parquet'))
          union all
          (select * from parquet_scan('{out_b}/part-*/*.parquet')
           except
           select * from parquet_scan('{out_a}/part-*/*.parquet'))
        )"""
    ).fetchone()[0]
    assert n_diff == 0


def test_neardup_chain_survives_empty_shard(ray_session, tmp_path):
    """The exchange-heaviest chain: exact dedup + MinHash-LSH over a
    read that includes a zero-row shard must equal the run without it
    (empty blocks flow through signature, banding and verify stages)."""
    import ray

    from textpipe_ray.stages.dedup import near_dup_after_exact

    src, mixed = _pages_with_empty_shard(tmp_path)

    def pre(batch: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[1]) for u in batch.column("url").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": batch.column("text"),
            }
        )

    def pairs_for(d):
        ds = ray.data.read_parquet(
            sorted(glob.glob(f"{d}/pages-*.parquet")), columns=["url", "text"]
        ).map_batches(pre, batch_format="pyarrow")
        pairs = near_dup_after_exact(
            ds, threshold=0.85, shingle_size=5, num_bands=16
        )
        df = pairs.to_pandas()
        return sorted(zip(df["id_a"], df["id_b"]))

    got = pairs_for(mixed)
    assert got == pairs_for(src)
