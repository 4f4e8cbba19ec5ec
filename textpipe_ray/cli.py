"""Job entry point for ``ray job submit`` (the north rule's submission
path):

    ray job submit --working-dir . -- \
        python -m textpipe_ray.cli --input 'pages-*.parquet' --output out/ \
            --num-partitions 4096

Runs (or RESUMES — committed partitions are skipped via the lineage
ledger) the flagship quality-filter job.  This module is one of the
three Ray-session owners in the repo (with bench.py and the test
fixture); library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="textpipe_ray",
        description="Flagship quality-filter job over Common-Crawl-style pages parquet.",
    )
    p.add_argument("--input", required=True, help="input glob, e.g. 'pages-*.parquet'")
    p.add_argument("--output", required=True, help="output directory (partitioned parquet + lineage)")
    p.add_argument("--num-partitions", type=int, default=64, help="url-partition count (≈ one per input shard group)")
    p.add_argument("--hint-language", default="en")
    p.add_argument("--wave-size", type=int, default=None, help="partitions per streaming wave (default: all uncommitted in one wave)")
    p.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (default: let Ray autodetect / cluster mode)")
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():  # under `ray job submit` the cluster owns the session
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus is not None:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from textpipe_ray.pipelines.runner import run_pages_job

    summary = run_pages_job(
        args.input,
        args.output,
        num_partitions=args.num_partitions,
        hint_language=args.hint_language,
        wave_size=args.wave_size,
    )
    print(json.dumps(summary, default=str))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
