"""The flagship pages pipeline: extract → langid → perplexity → quality
rules → PII/toxicity scrub → keep/drop.

Dataset-native (SURVEY.md §3/§7): every stage is a ``map_batches`` over
Arrow batches; langid/perplexity are actor pools (models loaded once
per actor); the whole thing streams with backpressure — nothing
materializes the full input.

Scale notes (designed for ~100 TB on a multi-node cluster):
* ``text`` is pruned at the read — the pipeline re-extracts from
  ``html``, the byte-identity invariant makes ``text`` redundant.
* ``html`` is dropped right after extraction, BEFORE the optional
  skew-breaking shuffle, so the all-to-all exchange moves clean text
  (~5-10× smaller than raw html), not page bytes.
* The url-hash ``part_id`` column is the one partitioning key reused
  everywhere: skew spreading, output layout, downstream dedup
  bucketing.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from textpipe_ray import schema as S
from textpipe_ray.functions.quality import load_thresholds
from textpipe_ray.functions.scrub import load_rules
from textpipe_ray.functions.strhash import part_ids
from textpipe_ray.stages.actors import ScoringStage
from textpipe_ray.stages.text import (
    clean_batch,
    complexity_batch,
    content_hash_batch,
    quality_batch,
    scrub_batch,
    stopword_counts_by_lang,
)

DEFAULT_NUM_PARTS = 64


def add_part_id(batch: pa.Table, num_parts: int = DEFAULT_NUM_PARTS) -> pa.Table:
    """Stable url-hash partition id (process-independent).

    Round 3: vectorized polynomial hash over the Arrow UTF-8 buffer
    (functions/strhash.py, ~2.5× the per-row blake2b loop) — this and
    content_hash are the two hashes every byte of the corpus passes
    through, so no per-row Python here."""
    return batch.append_column(
        S.PART_ID, pa.array(part_ids(batch.column(S.URL), num_parts), pa.int32())
    )


def extract_stage(batch: pa.Table, num_parts: int = DEFAULT_NUM_PARTS) -> pa.Table:
    """clean + content_hash + part_id, then DROP html (shrink the stream
    before any shuffle)."""
    batch = clean_batch(batch)
    batch = content_hash_batch(batch)
    batch = add_part_id(batch, num_parts)
    keep_cols = [c for c in batch.column_names if c != S.HTML]
    return batch.select(keep_cols)


def finalize_stage(batch: pa.Table, thresholds: dict) -> pa.Table:
    """Text-rule features + lang/perplexity/toxicity conjuncts →
    final ``keep`` + first-failure ``drop_reason``."""
    t = thresholds
    stop = stopword_counts_by_lang(batch)
    batch = quality_batch(batch, thresholds=t, stopword_counts=stop)
    batch = complexity_batch(batch)
    batch = scrub_batch(batch)

    keep = np.asarray(batch.column(S.KEEP))
    reason = np.asarray(batch.column(S.DROP_REASON)).astype(object)

    model_rules = []
    if t.get("require_reliable_lang", True):
        model_rules.append(
            ("lang_unreliable", ~np.asarray(batch.column(S.LANG_RELIABLE)))
        )
    allowed = set(t.get("allowed_langs", []))
    if allowed:
        resolved = np.asarray(batch.column(S.RESOLVED_LANG))
        model_rules.append(
            ("lang_not_allowed", ~np.isin(resolved, list(allowed)))
        )
    model_rules.append(
        ("high_perplexity", np.asarray(batch.column(S.PERPLEXITY)) > t["max_perplexity"])
    )
    model_rules.append(
        ("toxic", np.asarray(batch.column("scrub_toxic")) > t["max_toxic_hits"])
    )
    for name, violated in model_rules:
        newly = violated & keep
        reason[newly] = name
        keep = keep & ~violated

    batch = batch.set_column(
        batch.column_names.index(S.KEEP), S.KEEP, pa.array(keep.tolist(), pa.bool_())
    )
    batch = batch.set_column(
        batch.column_names.index(S.DROP_REASON),
        S.DROP_REASON,
        pa.array([str(r) for r in reason], pa.string()),
    )
    return batch


def build_pages_pipeline(
    ds: "ray.data.Dataset",
    hint_language: str = "en",
    num_parts: int = DEFAULT_NUM_PARTS,
    batch_size: int = 512,
    # FIXED pool size: an autoscaling (min,max) pool ramps too slowly to
    # matter within a partition's lifetime — start the whole pool at
    # once, sized to ~0.72 of the cluster CPUs (measured optimum; env
    # TEXTPIPE_POOL_FRACTION overrides), the rest feed read/finalize
    langid_concurrency: int | tuple | None = None,
    ppl_concurrency=None,  # kept for API compat; scoring pool is fused
    shuffle_before_scoring: bool = False,
    shuffle_blocks: int | None = None,
    thresholds: dict | None = None,
    approx_rows: int | None = None,
) -> "ray.data.Dataset":
    """Assemble the lazy Dataset pipeline (call .write_parquet / iterate
    to execute).

    ``approx_rows`` (free from parquet metadata at every call site)
    sizes the scoring/finalize batches: per-batch fixed cost (python
    wrappers, to_pylist, column appends, Ray block accounting) is
    ~1.6 ms, so steady-state jobs want LARGE batches — measured
    +20% end-to-end at 2.4M pages going 512/1024 → 4096/8192 — while
    small jobs must keep ≥4 batches in flight PER ACTOR or the pool
    starves.  Row-local stages ⇒ batch size never changes output
    (tests/test_pipeline_e2e.py::test_block_size_invariance)."""
    t = thresholds if thresholds is not None else load_thresholds()
    if langid_concurrency is None:
        import os as _os

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # measured per-core rates: extract+scoring ~1.4k rows/s,
        # finalize ~8.9k, read ~70k → the scoring pool gets the bulk of
        # the CPUs, the rest feed the read + finalize task pools
        # (actors spin up in ~0.1s, so a large fixed pool is cheap)
        frac = float(_os.environ.get("TEXTPIPE_POOL_FRACTION", "0.72"))
        langid_concurrency = max(2, int(cpus * frac))
    pool = (
        max(langid_concurrency)
        if isinstance(langid_concurrency, tuple)
        else int(langid_concurrency)
    )
    if approx_rows is not None:
        scoring_batch = int(min(4096, max(512, approx_rows // (pool * 4))))
        finalize_batch = 2 * scoring_batch
    else:
        scoring_batch, finalize_batch = 512, 1024
    # stateless extraction; html-heavy input → moderate batch size
    ds = ds.map_batches(
        extract_stage,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_kwargs={"num_parts": num_parts},
    )
    if shuffle_before_scoring:
        # break host-domain skew before the actor pools; the stream at
        # this point is clean text (html already dropped)
        ds = ds.repartition(shuffle_blocks or num_parts, shuffle=True)
    ds = ds.map_batches(
        ScoringStage,
        batch_format="pyarrow",
        batch_size=scoring_batch,
        concurrency=langid_concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"hint_language": hint_language},
    )
    ds = ds.map_batches(
        finalize_stage,
        batch_format="pyarrow",
        batch_size=finalize_batch,
        fn_kwargs={"thresholds": t},
    )
    return ds


def parquet_rows(paths) -> int:
    """Total row count from parquet FILE METADATA (no data read) — the
    ``approx_rows`` hint for :func:`build_pages_pipeline`.  Accepts
    files or directories (a directory counts every ``*.parquet``
    inside, the multi-file-table shape of real corpora)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    total = 0
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            files = sorted(
                _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            )
            if not files:
                # a mistyped / not-yet-written directory must surface,
                # not silently size the pipeline from 0 rows
                raise FileNotFoundError(f"no *.parquet files under directory {p!r}")
        else:
            files = [p]
        total += sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return total


def read_pages(
    paths, columns=(S.URL, S.WARC_TS, S.HTML, S.LANG), include_paths: bool = False
) -> "ray.data.Dataset":
    """Column-pruned read: ``text`` is never loaded (north-rule invariant
    makes it redundant with the extraction output).  ``include_paths``
    adds the source file as a ``path`` column (the runner uses it to tag
    rows with their resume partition)."""
    return ray.data.read_parquet(
        [str(p) for p in (paths if isinstance(paths, (list, tuple)) else [paths])],
        columns=list(columns),
        include_paths=include_paths,
    )
