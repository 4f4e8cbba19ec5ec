"""Per-partition counter metrics.

Counters are derived from the partition's already-written parquet by a
cheap columnar scan of the small label columns (keep / drop_reason /
resolved_lang / scrub_*) — no shared mutable counter actor in the hot
path (SURVEY.md §4.3), and the metrics are exactly consistent with the
committed output by construction.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pyarrow.dataset as pads

METRIC_COLUMNS = ["keep", "drop_reason", "resolved_lang"]


def partition_metrics(part_dir: str | Path) -> dict:
    dset = pads.dataset(str(part_dir), format="parquet")
    names = dset.schema.names
    cols = [c for c in METRIC_COLUMNS if c in names]
    scrub_cols = [c for c in names if c.startswith("scrub_")]
    table = dset.to_table(columns=cols + scrub_cols)
    n = table.num_rows
    out: dict = {"rows": n}
    if "keep" in cols:
        kept = table.column("keep").to_pylist()
        out["kept"] = sum(1 for k in kept if k)
        out["dropped"] = n - out["kept"]
    if "drop_reason" in cols:
        reasons = Counter(r for r in table.column("drop_reason").to_pylist() if r)
        out["drop_reasons"] = dict(sorted(reasons.items()))
    if "resolved_lang" in cols:
        out["langs"] = dict(sorted(Counter(table.column("resolved_lang").to_pylist()).items()))
    for c in scrub_cols:
        s = sum(v or 0 for v in table.column(c).to_pylist())
        if s:
            out.setdefault("scrub_hits", {})[c] = s
    return out


def merge_metrics(records: list[dict]) -> dict:
    total: dict = {"rows": 0, "kept": 0, "dropped": 0, "drop_reasons": Counter(), "langs": Counter(), "scrub_hits": Counter()}
    for r in records:
        m = r.get("metrics", r)
        total["rows"] += m.get("rows", 0)
        total["kept"] += m.get("kept", 0)
        total["dropped"] += m.get("dropped", 0)
        total["drop_reasons"].update(m.get("drop_reasons", {}))
        total["langs"].update(m.get("langs", {}))
        total["scrub_hits"].update(m.get("scrub_hits", {}))
    return {
        **total,
        "drop_reasons": dict(sorted(total["drop_reasons"].items())),
        "langs": dict(sorted(total["langs"].items())),
        "scrub_hits": dict(sorted(total["scrub_hits"].items())),
    }
