"""Full driver replica: run EVERY queries() entry against its
oracle_sql() pair with the driver's own compare (rows + schema +
order-insensitive value hash) at a given scale, and write the result
artifact.

    python scripts/oracle_sweep.py [sf_dir] [out_json] [--sql-only]

Defaults: sf_dir=/root/testdata/sf0.01 (the driver's check scale),
out_json=bench_out/oracle_sweep_sf001_r4.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = Path(
        args[1] if len(args) > 1 else REPO / "bench_out" / "oracle_sweep_sf001_r4.json"
    )

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib

    entry = importlib.import_module("__ray_entry__")
    from textpipe_ray.pipelines.compare import compare, run_oracle

    qs = entry.queries()
    sqls = entry.oracle_sql()
    if "--sql-only" in sys.argv:
        # golden-parquet oracles are committed only for the driver's
        # test scales (sf0.001 / sf0.01); at any other scale their
        # discriminator matches nothing, so a sweep there is meaningful
        # only for the TRUE DuckDB-SQL subset
        from textpipe_ray.pipelines.oracle import build_oracle_sql

        sql_names = set(build_oracle_sql())
        qs = {k: v for k, v in qs.items() if k in sql_names}
    results: dict = {}
    n_fail = 0
    t_start = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            c = compare(fn(sf_dir), run_oracle(sf_dir, sqls[name]))
            ok = bool(c["rows_match"] and c["cols_match"] and c["values_match"])
            results[name] = {
                "ok": ok,
                "rows": c["rows"],
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # a crash is a failure, not a skip
            ok = False
            results[name] = {"ok": False, "error": repr(e)[:300]}
        if not ok:
            n_fail += 1
        print(("PASS" if ok else "FAIL"), name, flush=True)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_fail": n_fail,
        "total_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary))
    results["_summary"] = summary
    out.parent.mkdir(exist_ok=True)
    with open(out, "w", encoding="utf8") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
