"""Per-partition lineage records + committed-partition ledger (resume).

Ray Data has no job-level checkpointing, so the engine defines its own
(SURVEY.md §4.3): a job's output directory holds one subdirectory per
url-hash partition plus ``_lineage/part-NNNNN.json`` records.  A
partition commits atomically — outputs land in a temp dir that is
renamed into place, THEN the lineage record is written (temp + rename
as well).  On restart, partitions with a lineage record are skipped;
a partition that crashed mid-write leaves only an uncommitted temp dir
which is discarded and re-run (all kernels are deterministic, so the
re-run is byte-stable).

The record carries enough to audit the run: input files, row counters,
model/rule version hashes, wall time.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path

LINEAGE_DIR = "_lineage"


def file_sha256(path: str | Path, limit: int | None = None) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read() if limit is None else f.read(limit))
    return h.hexdigest()


class PartitionLedger:
    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.lineage_dir = self.out_dir / LINEAGE_DIR
        self.lineage_dir.mkdir(parents=True, exist_ok=True)

    def record_path(self, part_id: int) -> Path:
        return self.lineage_dir / f"part-{part_id:05d}.json"

    def part_dir(self, part_id: int) -> Path:
        return self.out_dir / f"part-{part_id:05d}"

    def tmp_dir(self, part_id: int) -> Path:
        return self.out_dir / f".tmp-part-{part_id:05d}"

    def is_committed(self, part_id: int) -> bool:
        return self.record_path(part_id).exists()

    def committed_parts(self) -> list[int]:
        return sorted(
            int(p.stem.split("-")[1]) for p in self.lineage_dir.glob("part-*.json")
        )

    def begin(self, part_id: int) -> Path:
        """Fresh temp dir for the partition's output (drops stale crash debris)."""
        tmp = self.tmp_dir(part_id)
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        return tmp

    def commit(self, part_id: int, record: dict) -> None:
        """Atomically publish output dir, then the lineage record."""
        tmp, final = self.tmp_dir(part_id), self.part_dir(part_id)
        if final.exists():
            shutil.rmtree(final)
        os.rename(tmp, final)
        record = dict(record, part_id=part_id, committed_at_unix=time.time())
        rec_tmp = self.record_path(part_id).with_suffix(".json.tmp")
        with open(rec_tmp, "w", encoding="utf8") as f:
            json.dump(record, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(rec_tmp, self.record_path(part_id))

    def read_record(self, part_id: int) -> dict:
        with open(self.record_path(part_id), "r", encoding="utf8") as f:
            return json.load(f)
