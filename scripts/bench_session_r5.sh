#!/bin/bash
# One full-board bench session for round 5: writes
# bench_out/bench_r5_session<N>.json plus a host-noise probe reading, and
# refreshes the min-of-all-sessions aggregate bench_out/bench_r5.json.
# Per the repo's noise methodology (BASELINE.md): co-tenant host, stalls
# only ever add time -> per-query minima across sessions estimate the
# noise floor; never conclude regressions from a single session.
set -e
cd /root/repo
N=$(ls bench_out/bench_r5_session*.json 2>/dev/null | wc -l)
N=$((N+1))
PROBE=$(python -c "
import numpy as np, time
a = np.random.rand(9_000_000); b = np.random.rand(9_000_000)
t0=time.time()
for _ in range(5): c=a+b; d=a*b
print(round((time.time()-t0)/5*1000,1))")
echo "session $N, probe ${PROBE}ms (quiet ~30)"
python bench.py 2>/dev/null | tail -1 > /tmp/bench_r5_raw.json
python - <<PY
import json
d = json.load(open("/tmp/bench_r5_raw.json"))
d["host_probe_ms"] = $PROBE
with open("bench_out/bench_r5_session$N.json", "w") as f:
    json.dump(d, f, indent=1)
# min-of-all-sessions aggregate
import glob, re
paths = sorted(
    glob.glob("bench_out/bench_r5_session*.json"),
    key=lambda p: int(re.search(r"session(\d+)", p).group(1)),
)
sessions = [json.load(open(p)) for p in paths]
agg = dict(sessions[-1])
qmin = {}
for s in sessions:
    for q, t in s["queries"].items():
        qmin[q] = min(qmin.get(q, 1e9), t)
agg["queries"] = qmin
agg["value"] = qmin.get("q_pages_flagship")
# docs_per_sec must track the aggregated (min) flagship time, not the
# latest session's — sessions[-1] may be a degraded-host run.  The row
# count comes from any session that ran the flagship (it is determined
# by the input, not the session); a RAY_GRAFT_ONLY subset session must
# not KeyError the refresh or silently keep a stale reading.
frows = next(
    (s["rows"]["q_pages_flagship"] for s in reversed(sessions)
     if "q_pages_flagship" in s.get("rows", {})),
    None,
)
if agg["value"] and frows:
    agg["docs_per_sec"] = round(frows / agg["value"], 1)
else:
    agg.pop("docs_per_sec", None)
agg.pop("host_probe_ms", None)  # per-session reading; probes_ms has them all
agg["sessions"] = len(sessions)
agg["probes_ms"] = [s.get("host_probe_ms") for s in sessions]
with open("bench_out/bench_r5.json", "w") as f:
    json.dump(agg, f, indent=1)
print("aggregate over", len(sessions), "sessions; flagship:", agg["value"])
PY
