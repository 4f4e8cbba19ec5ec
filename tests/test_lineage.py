"""Partition ledger unit tests (no Ray needed)."""

import json
import os

from textpipe_ray.state.lineage import PartitionLedger


def test_commit_cycle(tmp_path):
    led = PartitionLedger(tmp_path / "out")
    assert not led.is_committed(0)
    tmp = led.begin(0)
    (tmp / "data.parquet").write_bytes(b"x")
    led.commit(0, {"metrics": {"rows": 1}})
    assert led.is_committed(0)
    assert (led.part_dir(0) / "data.parquet").read_bytes() == b"x"
    rec = led.read_record(0)
    assert rec["part_id"] == 0 and rec["metrics"]["rows"] == 1
    assert led.committed_parts() == [0]


def test_begin_discards_stale_tmp(tmp_path):
    led = PartitionLedger(tmp_path / "out")
    t1 = led.begin(3)
    (t1 / "stale").write_text("crash debris")
    t2 = led.begin(3)
    assert not (t2 / "stale").exists()


def test_record_is_atomic_json(tmp_path):
    led = PartitionLedger(tmp_path / "out")
    led.begin(1)
    led.commit(1, {"input_files": ["a"], "metrics": {}})
    # no tmp file left behind
    assert not list(led.lineage_dir.glob("*.tmp"))
    with open(led.record_path(1)) as f:
        json.load(f)
