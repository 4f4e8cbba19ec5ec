"""Ray-level fault tolerance: a map task whose worker process dies
mid-batch must be retried from lineage and the Dataset must still
produce the complete, correct result (SURVEY.md §4.2 "task retries +
lineage reconstruction" — here made an executable guarantee instead of
a claim).  Job-level crash-resume is covered separately by the runner's
lineage ledger (tests/test_lineage.py)."""

import os
import tempfile

import numpy as np
import pyarrow as pa


def test_map_task_survives_worker_crash(ray_session):
    import ray.data

    marker = os.path.join(tempfile.gettempdir(), "textpipe_ray_crash_once")
    if os.path.exists(marker):
        os.remove(marker)

    def crash_once(batch: pa.Table) -> pa.Table:
        # first attempt(s) kill the WORKER PROCESS mid-task (not a UDF
        # exception — a real process death, the cluster-failure mode);
        # the marker survives on disk so every retry takes the good path
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            os._exit(1)
        ids = np.asarray(batch.column("id"), dtype=np.int64)
        return pa.table({"id": batch.column("id"), "twice": pa.array(ids * 2, pa.int64())})

    ds = (
        ray.data.range(1000, override_num_blocks=4)
        .map_batches(crash_once, batch_format="pyarrow")
    )
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 1000                      # nothing lost to the crash
    assert (out["twice"] == out["id"] * 2).all()  # retried blocks are correct
    os.remove(marker)


def test_actor_pool_stage_survives_actor_death(ray_session):
    """The stateful-stage failure mode: an ACTOR in a map_batches actor
    pool (the engine's langid/perplexity/multimodal backbone) dies
    mid-stream — a real process exit, not an exception.  Ray Data must
    replace the actor, redo its in-flight batch, and the stage's
    expensive __init__ state must be rebuilt in the replacement (the
    production claim behind "setup once per actor" at SURVEY.md §4.2)."""
    import ray.data

    marker = os.path.join(tempfile.gettempdir(), "textpipe_ray_actor_crash_once")
    if os.path.exists(marker):
        os.remove(marker)

    class CrashOnceStage:
        def __init__(self):
            # stand-in for model load: the replacement actor must
            # re-run this and get a working state
            self.scale = 3

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                with open(marker, "w"):
                    pass
                os._exit(1)  # kill THIS actor process mid-task
            ids = np.asarray(batch.column("id"), dtype=np.int64)
            return pa.table(
                {"id": batch.column("id"), "tripled": pa.array(ids * self.scale, pa.int64())}
            )

    ds = ray.data.range(1000, override_num_blocks=4).map_batches(
        CrashOnceStage, batch_format="pyarrow", concurrency=2
    )
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 1000                        # the dead actor's batch was redone
    assert (out["tripled"] == out["id"] * 3).all()  # by a replacement with fresh __init__ state
    os.remove(marker)
