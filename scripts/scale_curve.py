"""Input-scale curve: the same representative pipelines at sf0.001 /
sf0.01 / sf0.1 (10x input per step), one FRESH bench.py process per
scale (fresh ray session), min-of-2 per leg — the committed evidence
that exchange-heavy pipelines grow sub-linearly at these scales
(BASELINE.md "Input-scale curve").

    python scripts/scale_curve.py [out_json]

Reuses bench.py's env contract (GRAFT_SF_DIR / RAY_GRAFT_ONLY /
RAY_GRAFT_BENCH_REPS) so the measurement path is identical to the
per-round board sessions.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

QUERIES = [
    "q_pages_flagship",
    "q_exact_dedup",
    "q_pages_neardup",
    "q_substring_dedup",
    "q_token_freq",
    "q_ann_topk",
    "q_corpus_release",
    "q_bloom_dedup",
    "q_distinct_sketch",
    "q_incremental_dedup",
    # round-4 verdict: evidence the bounded-exchange claims of the
    # iterative/lifecycle pipelines at a 10x step too
    "q_pagerank",
    "q_snapshot_loop",
]
SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def probe_ms() -> float:
    import numpy as np

    a = np.random.rand(9_000_000)
    b = np.random.rand(9_000_000)
    t0 = time.time()
    for _ in range(5):
        _ = a + b
        _ = a * b
    return round((time.time() - t0) / 5 * 1000, 1)


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "bench_out" / "scale_curve_r5.json"
    legs: dict[str, dict] = {q: {} for q in QUERIES}
    probes = {}
    result = {
        "metric": "wall time vs input scale (10x per step), min-of-2 per leg, fresh session per scale",
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        "host_probe_ms": probes,
        "legs": legs,
    }
    for sf in SCALES:
        probes[sf] = probe_ms()
        env = dict(
            os.environ,
            GRAFT_SF_DIR=f"/root/testdata/{sf}",
            RAY_GRAFT_ONLY=",".join(QUERIES),
            RAY_GRAFT_BENCH_REPS="2",
        )
        raw = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        timings = json.loads(raw.strip().splitlines()[-1])["queries"]
        for q, t in timings.items():
            legs[q][sf] = t
        # persist after every leg: a later leg erroring (or a query
        # dropped from one leg's timings) must not lose the
        # measurements already taken
        out_path.write_text(json.dumps(result, indent=1))
    for q in QUERIES:
        for lo, hi in zip(SCALES, SCALES[1:]):
            a, b = legs[q].get(lo), legs[q].get(hi)
            if a and b:  # skip missing legs and zero-rounded times
                legs[q][f"ratio_{lo[2:]}_to_{hi[2:]}"] = round(b / a, 2)
    out_path.write_text(json.dumps(result, indent=1))
    print(json.dumps({"out": str(out_path), "probes_ms": probes}))
    ratios = [
        v for q in QUERIES for k, v in legs[q].items() if k.startswith("ratio")
    ]
    print("worst step ratio:", max(ratios) if ratios else "n/a")


if __name__ == "__main__":
    main()
