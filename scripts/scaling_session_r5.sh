#!/bin/bash
# One pre-registered round-5 scaling session (BASELINE.md "Round-5
# scaling protocol"): python bench.py --scaling (4 vs 16 CPUs, fresh
# processes, min-of-2 per leg), host probe stamped, appended to
# bench_out/scaling_r5.json. Report = median of session efficiencies.
set -e
cd /root/repo
PROBE=$(python -c "
import numpy as np, time
a = np.random.rand(9_000_000); b = np.random.rand(9_000_000)
t0=time.time()
for _ in range(5): c=a+b; d=a*b
print(round((time.time()-t0)/5*1000,1))")
echo "probe ${PROBE}ms (quiet ~30)"
python bench.py --scaling 2>/dev/null | tail -1 > /tmp/scaling_r5_raw.json
python - <<PY
import json, os, statistics
s = json.load(open("/tmp/scaling_r5_raw.json"))
s["host_probe_ms"] = $PROBE
path = "bench_out/scaling_r5.json"
doc = {"protocol": "pre-registered in BASELINE.md before measurement: 3 sessions, min-of-2 per leg, median of session efficiencies, no session dropped", "sessions": []}
if os.path.exists(path):
    doc = json.load(open(path))
doc["sessions"].append(s)
effs = [x["scaling_efficiency"] for x in doc["sessions"]]
doc["session_efficiencies"] = effs
doc["median_efficiency"] = round(statistics.median(effs), 3)
with open(path, "w") as f:
    json.dump(doc, f, indent=1)
print("session", len(doc["sessions"]), "eff:", s["scaling_efficiency"], "| median so far:", doc["median_efficiency"])
PY
