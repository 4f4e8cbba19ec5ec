"""End-to-end flagship pipeline tests on the synthetic pages table:
keep/drop F1, byte-identical extraction, resume semantics (SURVEY.md §5)."""

import glob

import duckdb
import pytest


@pytest.fixture(scope="module")
def job_out(ray_session, pages_dir, tmp_path_factory):
    from textpipe_ray.pipelines.runner import run_pages_job

    out = tmp_path_factory.mktemp("job")
    summary = run_pages_job(f"{pages_dir}/pages-*.parquet", out, num_partitions=4)
    return str(out), summary, pages_dir


def test_row_conservation(job_out):
    out, summary, pages = job_out
    assert summary["totals"]["rows"] == 300
    assert summary["totals"]["kept"] + summary["totals"]["dropped"] == 300


def test_keep_drop_f1(job_out):
    out, _, pages = job_out
    r = duckdb.sql(
        f"""SELECT e.expected_keep, o.keep, count(*) c FROM '{out}/part-*/*.parquet' o
        JOIN '{pages}/expected.parquet' e USING (url) GROUP BY 1,2"""
    ).fetchall()
    tp = sum(c for ek, k, c in r if ek and k)
    fp = sum(c for ek, k, c in r if not ek and k)
    fn = sum(c for ek, k, c in r if ek and not k)
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, (f1, r)


def test_byte_identical_clean(job_out):
    out, _, pages = job_out
    n = duckdb.sql(
        f"""SELECT count(*) FROM '{out}/part-*/*.parquet' o
        JOIN (SELECT url, text FROM '{pages}/pages-*.parquet') p USING (url)
        WHERE o.clean <> p.text"""
    ).fetchone()[0]
    assert n == 0


def test_lineage_records(job_out):
    out, summary, _ = job_out
    recs = sorted(glob.glob(f"{out}/_lineage/part-*.json"))
    assert len(recs) == 4
    import json

    rec = json.load(open(recs[0]))
    assert rec["metrics"]["rows"] > 0
    assert "thresholds_sha" in rec["rule_versions"]
    assert rec["input_files"]


def test_resume_skips_and_matches(ray_session, pages_dir, tmp_path_factory):
    from textpipe_ray.pipelines.runner import run_pages_job

    out = tmp_path_factory.mktemp("resume")
    s1 = run_pages_job(f"{pages_dir}/pages-*.parquet", out, num_partitions=4, max_partitions=2)
    assert len(s1["partitions_ran"]) == 2
    s2 = run_pages_job(f"{pages_dir}/pages-*.parquet", out, num_partitions=4)
    assert s2["partitions_skipped"] == s1["partitions_ran"]
    assert s2["totals"]["rows"] == 300


def test_scrub_removes_pii(job_out):
    out, _, pages = job_out
    # kept PII rows must contain replacement tokens, and no raw emails
    n_bad = duckdb.sql(
        f"""SELECT count(*) FROM '{out}/part-*/*.parquet'
        WHERE scrub_email > 0 AND scrubbed_text LIKE '%@%'"""
    ).fetchone()[0]
    assert n_bad == 0


def test_stats_readable(ray_session, pages_dir):
    """ds.stats() exposes per-stage breakdown (perf feedback loop)."""
    from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages

    files = sorted(glob.glob(f"{pages_dir}/pages-*.parquet"))
    ds = build_pages_pipeline(read_pages(files))
    ds.take(5)
    assert "ScoringStage" in ds.stats()


def test_wave_size_bounds_commits(ray_session, pages_dir, tmp_path_factory, job_out):
    """wave_size=2 runs two streaming jobs of two partitions each, and
    the final output is identical to the single-wave run's content."""
    out, _, _ = job_out
    wout = tmp_path_factory.mktemp("waves")
    from textpipe_ray.pipelines.runner import run_pages_job

    s = run_pages_job(f"{pages_dir}/pages-*.parquet", wout, num_partitions=4, wave_size=2)
    assert s["partitions_ran"] == [0, 1, 2, 3]
    import json

    rec = json.load(open(f"{wout}/_lineage/part-00000.json"))
    assert rec["wave"] == [0, 1]
    h1 = duckdb.sql(
        f"SELECT md5(string_agg(url || clean || keep, '|' ORDER BY url)) FROM '{out}/part-*/*.parquet'"
    ).fetchone()[0]
    h2 = duckdb.sql(
        f"SELECT md5(string_agg(url || clean || keep, '|' ORDER BY url)) FROM '{wout}/part-*/*.parquet'"
    ).fetchone()[0]
    assert h1 == h2


def test_block_size_invariance(ray_session, pages_dir):
    """The flagship result is identical whether the executor streams
    default-sized blocks or many tiny 32 KiB blocks — the guarantee
    that lets `DataContext.target_max_block_size` be tuned per cluster
    (memory headroom vs scheduling overhead) at corpus scale without a
    correctness audit.  Catches any stage that accidentally depends on
    batch/block boundaries (cross-row state, per-block aggregation)."""
    import ray.data
    from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages

    files = sorted(glob.glob(f"{pages_dir}/pages-*.parquet"))

    def run():
        df = build_pages_pipeline(read_pages(files)).to_pandas()
        return df.sort_values("url").reset_index(drop=True)

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 32 * 1024  # html rows ≫ this → many tiny blocks
        tiny = run()
    finally:
        ctx.target_max_block_size = saved
    default = run()
    assert len(tiny) == len(default) == 300
    import pandas.testing as pdt

    pdt.assert_frame_equal(tiny, default)


def test_parquet_rows_files_dirs_and_empty_dir(tmp_path):
    """parquet_rows accepts files AND directories (recursive), and an
    existing-but-empty directory RAISES instead of silently sizing the
    pipeline from 0 rows (round-5 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from textpipe_ray.pipelines.flagship import parquet_rows

    f1 = tmp_path / "a.parquet"
    pq.write_table(pa.table({"x": list(range(7))}), f1)
    sub = tmp_path / "nested" / "deep"
    sub.mkdir(parents=True)
    f2 = sub / "b.parquet"
    pq.write_table(pa.table({"x": list(range(5))}), f2)

    assert parquet_rows([str(f1)]) == 7
    assert parquet_rows([str(tmp_path)]) == 12  # recursive over both
    assert parquet_rows([str(f1), str(tmp_path / "nested")]) == 12

    empty = tmp_path / "not_yet_written"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no \\*.parquet"):
        parquet_rows([str(empty)])
