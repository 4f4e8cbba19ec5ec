"""Format-agnostic sources: jsonl/csv readers must present the same
schema + values as the parquet path."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_documents_jsonl_csv_match_parquet(ray_session, tmp_path):
    import duckdb

    from textpipe_ray.sources.io import read_documents

    src = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.execute(f"COPY (SELECT doc_id, text, lang FROM '{src}') TO '{tmp_path}/docs.jsonl' (FORMAT json)")
    con.execute(f"COPY (SELECT doc_id, text, lang FROM '{src}') TO '{tmp_path}/docs.csv' (FORMAT csv, HEADER)")

    want = read_documents(src, columns=["doc_id", "text", "lang"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for fmt, path in (("jsonl", f"{tmp_path}/docs.jsonl"), ("csv", f"{tmp_path}/docs.csv")):
        got = read_documents(path, fmt=fmt, columns=["doc_id", "text", "lang"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        assert got.equals(want), fmt


def test_pages_jsonl_roundtrip(ray_session, tmp_path):
    from textpipe_ray.sources.io import read_pages_any, write_pages_jsonl
    from textpipe_ray.sources.pages import generate_pages

    t = generate_pages(40, seed=7).select(["url", "warc_ts", "html", "text", "lang"])
    write_pages_jsonl(t, tmp_path / "pages.jsonl")
    got = read_pages_any(str(tmp_path / "pages.jsonl"), fmt="jsonl").to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["html"]) == list(want["html"])  # binary survives base64
    assert [x.isoformat() for x in got["warc_ts"]] == [x.isoformat() for x in want["warc_ts"]]


def test_pages_jsonl_drives_flagship(ray_session, tmp_path):
    """A jsonl-sourced pages table flows through the full flagship
    pipeline unchanged (format-agnostic schema contract)."""
    from textpipe_ray.pipelines.flagship import build_pages_pipeline
    from textpipe_ray.sources.io import read_pages_any, write_pages_jsonl
    from textpipe_ray.sources.pages import generate_pages

    t = generate_pages(60, seed=11).select(["url", "warc_ts", "html", "text", "lang"])
    write_pages_jsonl(t, tmp_path / "p.jsonl")
    ds = read_pages_any(str(tmp_path / "p.jsonl"), fmt="jsonl", columns=["url", "warc_ts", "html", "lang"])
    out = build_pages_pipeline(ds).to_pandas()
    assert len(out) == 60
    assert {"clean", "keep", "drop_reason", "perplexity"}.issubset(out.columns)


def test_warc_roundtrip_and_flagship(ray_session, tmp_path):
    """Pages → WARC file(s) → read_warc → byte-identical html; the
    resulting Dataset drives the full flagship pipeline."""
    from textpipe_ray.pipelines.flagship import build_pages_pipeline
    from textpipe_ray.sources.pages import generate_pages
    from textpipe_ray.sources.warc import read_warc, write_warc

    t = generate_pages(50, seed=31).select(["url", "warc_ts", "html"])
    write_warc(t, tmp_path / "a.warc")
    write_warc(t, tmp_path / "b.warc.gz", compress=True)

    got = read_warc(str(tmp_path / "a.warc")).to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["html"]) == list(want["html"])
    assert [x.isoformat() for x in got["warc_ts"]] == [x.isoformat() for x in want["warc_ts"]]

    gz = read_warc(str(tmp_path / "b.warc.gz")).to_pandas()
    assert len(gz) == 50

    out = build_pages_pipeline(read_warc(str(tmp_path / "a.warc"))).to_pandas()
    assert len(out) == 50 and {"clean", "keep"}.issubset(out.columns)


def test_wet_roundtrip_and_record_type_isolation(ray_session, tmp_path):
    """Pages text → WET (conversion records) → read_wet → identical
    text; a mixed WARC+WET stream routes records by type (read_wet
    ignores response records and read_warc ignores conversions)."""
    from textpipe_ray.sources.pages import generate_pages
    from textpipe_ray.sources.warc import read_warc, read_wet, write_warc, write_wet

    t = generate_pages(40, seed=13).select(["url", "warc_ts", "html", "text"])
    write_wet(t, tmp_path / "a.wet")
    write_wet(t, tmp_path / "b.wet.gz", compress=True)

    got = read_wet(str(tmp_path / "a.wet")).to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
    assert [x.isoformat() for x in got["warc_ts"]] == [x.isoformat() for x in want["warc_ts"]]
    assert len(read_wet(str(tmp_path / "b.wet.gz")).to_pandas()) == 40

    # mixed stream: concatenate a WARC and a WET file into one blob
    write_warc(t.select(["url", "warc_ts", "html"]), tmp_path / "c.warc")
    mixed = (tmp_path / "c.warc").read_bytes() + (tmp_path / "a.wet").read_bytes()
    (tmp_path / "mixed.warc").write_bytes(mixed)
    assert read_wet(str(tmp_path / "mixed.warc")).count() == 40
    assert read_warc(str(tmp_path / "mixed.warc")).count() == 40


def test_wet_export_rerun_into_same_dir_is_clean(ray_session, tmp_path):
    """Re-exporting into a user-provided out_dir must not read back
    stale shards from the previous run (shard names differ when the
    batching differs, so leftovers would silently duplicate rows)."""
    from textpipe_ray.pipelines.queries import q_wet_export

    out = str(tmp_path / "wet")
    a = q_wet_export("/root/testdata/sf0.001", out_dir=out).to_pandas()
    # plant a stale shard that a second run must NOT pick up: a valid
    # prior-run artifact under a name the new batching won't reuse
    import gzip
    import os

    first = sorted(f for f in os.listdir(out) if f.startswith("wet-"))[0]
    stale = os.path.join(out, "wet-999999999999.warc.wet.gz")
    with open(os.path.join(out, first), "rb") as f:
        blob = f.read()
    with open(stale, "wb") as f:
        f.write(blob)
    b = q_wet_export("/root/testdata/sf0.001", out_dir=out).to_pandas()
    assert len(b) == len(a)  # stale shard removed, not re-read
    assert sorted(b["doc_id"]) == sorted(a["doc_id"])


def test_pages_jsonl_roundtrip_non_utc_tz(ray_session, tmp_path):
    """warc_ts must survive the JSONL roundtrip regardless of host
    timezone (naive-datetime .timestamp() regression)."""
    import os
    import time

    from textpipe_ray.sources.io import read_pages_any, write_pages_jsonl
    from textpipe_ray.sources.pages import generate_pages

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        t = generate_pages(10, seed=77).select(["url", "warc_ts", "html", "text", "lang"])
        write_pages_jsonl(t, tmp_path / "tz.jsonl")
        got = read_pages_any(str(tmp_path / "tz.jsonl"), fmt="jsonl").to_pandas().sort_values("url")
        want = t.to_pandas().sort_values("url")
        assert [x.isoformat() for x in got["warc_ts"]] == [x.isoformat() for x in want["warc_ts"]]
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_cli_main_runs_and_resumes(ray_session, tmp_path):
    """python -m textpipe_ray.cli (the `ray job submit` entry): runs the
    flagship job, prints a JSON summary, and a rerun skips committed
    partitions."""
    from textpipe_ray.cli import main
    from textpipe_ray.sources.pages import write_pages

    src = tmp_path / "pages"
    out = tmp_path / "out"
    write_pages(str(src), 120, num_files=2)
    s1 = main([
        "--input", f"{src}/pages-*.parquet",
        "--output", str(out),
        "--num-partitions", "2",
    ])
    assert sorted(s1["partitions_ran"]) == [0, 1] and s1["partitions_skipped"] == []
    s2 = main([
        "--input", f"{src}/pages-*.parquet",
        "--output", str(out),
        "--num-partitions", "2",
    ])
    assert s2["partitions_ran"] == [] and sorted(s2["partitions_skipped"]) == [0, 1]
