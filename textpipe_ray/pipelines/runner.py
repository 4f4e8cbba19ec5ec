"""Resumable partitioned job runner for the flagship pipeline.

The unit of work (and of resume) is a *partition* = a deterministic
group of input parquet files.  Each uncommitted partition runs one
streaming Dataset pipeline over its files with full-cluster
parallelism, writes to a temp dir, and commits atomically (output dir
rename, then lineage record — see state/lineage.py).  Committed
partitions are skipped on restart; the kernels are deterministic, so a
re-run of a crashed partition is byte-stable.

At 100 TB scale the file groups map 1:1 onto the Common-Crawl dump's
natural sharding; partitions are sized large (many files) so each one
saturates the cluster, while their count bounds lost work on failure.
"""

from __future__ import annotations

import glob
import json
import os
import time
from pathlib import Path

from textpipe_ray.functions.quality import load_thresholds
from textpipe_ray.functions.scrub import load_rules
from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages
from textpipe_ray.state.lineage import PartitionLedger, file_sha256
from textpipe_ray.state.metrics import merge_metrics, partition_metrics


def group_files(files: list[str], num_partitions: int) -> list[list[str]]:
    files = sorted(files)
    groups: list[list[str]] = [[] for _ in range(min(num_partitions, len(files)) or 1)]
    for i, f in enumerate(files):
        groups[i % len(groups)].append(f)
    return groups


def run_pages_job(
    input_glob: str,
    out_dir: str | Path,
    num_partitions: int = 4,
    hint_language: str = "en",
    max_partitions: int | None = None,  # fault-injection / test hook
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the flagship job.  Returns a summary dict."""
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    ledger = PartitionLedger(out_dir)
    thresholds = load_thresholds()
    rules_version = {
        "thresholds_sha": file_sha256(
            Path(__file__).resolve().parents[2] / "models" / "quality_thresholds.json"
        ),
        "scrub_sha": file_sha256(
            Path(__file__).resolve().parents[2] / "models" / "scrub_rules.json"
        ),
        "langid_sha": file_sha256(
            Path(__file__).resolve().parents[2] / "models" / "langid.json"
        ),
        "lm_sha": file_sha256(Path(__file__).resolve().parents[2] / "models" / "lm.json"),
    }

    groups = group_files(files, num_partitions)
    ran, skipped = [], []
    for pid, group in enumerate(groups):
        if ledger.is_committed(pid):
            skipped.append(pid)
            continue
        if max_partitions is not None and len(ran) >= max_partitions:
            break
        t0 = time.time()
        tmp = ledger.begin(pid)
        ds = read_pages(group)
        ds = build_pages_pipeline(ds, hint_language=hint_language, thresholds=thresholds, **pipeline_kwargs)
        ds.write_parquet(str(tmp))
        # metrics from the just-written files (pre-rename, same bytes)
        metrics = partition_metrics(tmp)
        ledger.commit(
            pid,
            {
                "input_files": group,
                "metrics": metrics,
                "rule_versions": rules_version,
                "wall_sec": round(time.time() - t0, 3),
            },
        )
        ran.append(pid)

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
