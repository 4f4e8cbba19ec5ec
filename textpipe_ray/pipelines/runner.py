"""Resumable partitioned job runner for the flagship pipeline.

The unit of work (and of resume) is a *partition* = a deterministic
group of input parquet files.  ALL uncommitted partitions run in ONE
streaming Dataset job (each row tagged with its partition id by source
file), written as partition-keyed output and committed per partition
with the same atomic ledger semantics (output dir rename, then lineage
record — see state/lineage.py).  Committed partitions are skipped on
restart; the kernels are deterministic, so a re-run of a crashed
partition is byte-stable.

One job instead of one-job-per-partition matters for throughput: the
scoring actor pool spins up once per job (~2 s at 32 CPUs), which a
per-partition loop pays once per partition — measured 18.4k vs 43.3k
docs/s on the 1M-page runner.  ``wave_size`` bounds how many partitions
commit together (a crash loses at most one wave's work); the default
commits everything in one wave, matching the natural case where
partitions are sized large enough that a wave IS the remaining job.

At 100 TB scale the file groups map 1:1 onto the Common-Crawl dump's
natural sharding; partitions are sized large (many files) so each wave
saturates the cluster, while their count bounds lost work on failure.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from pathlib import Path

import pyarrow as pa

from textpipe_ray.functions.quality import load_thresholds
from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages
from textpipe_ray.state.lineage import PartitionLedger, file_sha256
from textpipe_ray.state.metrics import merge_metrics, partition_metrics

JOB_PART = "job_part"


def group_files(files: list[str], num_partitions: int) -> list[list[str]]:
    files = sorted(files)
    groups: list[list[str]] = [[] for _ in range(min(num_partitions, len(files)) or 1)]
    for i, f in enumerate(files):
        groups[i % len(groups)].append(f)
    return groups


def _rule_versions() -> dict:
    root = Path(__file__).resolve().parents[2] / "models"
    return {
        "thresholds_sha": file_sha256(root / "quality_thresholds.json"),
        "scrub_sha": file_sha256(root / "scrub_rules.json"),
        "langid_sha": file_sha256(root / "langid.json"),
        "lm_sha": file_sha256(root / "lm.json"),
    }


def run_pages_job(
    input_glob: str,
    out_dir: str | Path,
    num_partitions: int = 4,
    hint_language: str = "en",
    max_partitions: int | None = None,  # fault-injection / test hook
    wave_size: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the flagship job.  Returns a summary dict."""
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    ledger = PartitionLedger(out_dir)
    thresholds = load_thresholds()
    rules_version = _rule_versions()

    groups = group_files(files, num_partitions)
    skipped = [pid for pid in range(len(groups)) if ledger.is_committed(pid)]
    todo = [pid for pid in range(len(groups)) if not ledger.is_committed(pid)]
    if max_partitions is not None:
        todo = todo[:max_partitions]

    waves = (
        [todo]
        if wave_size is None
        else [todo[i : i + wave_size] for i in range(0, len(todo), wave_size)]
    )
    ran: list[int] = []
    run_tmp = Path(out_dir) / ".tmp-run"
    for wave in waves:
        if not wave:
            continue
        t0 = time.time()
        wave_files = [f for pid in wave for f in groups[pid]]
        # source file → partition id; ray reports resolved paths, so key
        # by absolute path
        part_of = {os.path.abspath(f): pid for pid in wave for f in groups[pid]}

        def tag(batch: pa.Table) -> pa.Table:
            pids = [part_of[os.path.abspath(p)] for p in batch.column("path").to_pylist()]
            batch = batch.drop_columns(["path"])
            return batch.append_column(JOB_PART, pa.array(pids, pa.int32()))

        ds = read_pages(wave_files, include_paths=True).map_batches(
            tag, batch_format="pyarrow"
        )
        # per-WAVE batch sizing (a local, not a pipeline_kwargs mutation:
        # that would freeze wave 1's row count into every later wave)
        wave_kwargs = pipeline_kwargs
        if "approx_rows" not in wave_kwargs:
            from textpipe_ray.pipelines.flagship import parquet_rows

            wave_kwargs = dict(wave_kwargs, approx_rows=parquet_rows(wave_files))
        ds = build_pages_pipeline(
            ds, hint_language=hint_language, thresholds=thresholds, **wave_kwargs
        )
        if run_tmp.exists():  # stale crash debris
            shutil.rmtree(run_tmp)
        # ONE streaming write for the whole wave, keyed by partition
        ds.write_parquet(str(run_tmp), partition_cols=[JOB_PART])
        wall = round(time.time() - t0, 3)
        for pid in wave:
            src = run_tmp / f"{JOB_PART}={pid}"
            tmp = ledger.begin(pid)
            if src.exists():  # a partition with zero rows leaves no dir
                shutil.rmtree(tmp)
                os.rename(src, tmp)
            metrics = partition_metrics(tmp) if any(tmp.iterdir()) else {"rows": 0}
            ledger.commit(
                pid,
                {
                    "input_files": groups[pid],
                    "metrics": metrics,
                    "rule_versions": rules_version,
                    "wave": wave,
                    "wave_wall_sec": wall,
                },
            )
            ran.append(pid)
        shutil.rmtree(run_tmp, ignore_errors=True)

    records = [ledger.read_record(p) for p in ledger.committed_parts()]
    summary = {
        "out_dir": str(out_dir),
        "partitions_total": len(groups),
        "partitions_ran": ran,
        "partitions_skipped": skipped,
        "totals": merge_metrics(records),
    }
    with open(Path(out_dir) / "_summary.json", "w", encoding="utf8") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
