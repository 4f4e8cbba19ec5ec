"""Oracle-checked Ray Data queries (the driver contract's ``queries()``).

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table.
The paired DuckDB SQL lives in :mod:`textpipe_ray.pipelines.oracle`;
both sides are generated from the same constants, so row counts,
schemas and value hashes must match exactly.

Scale discipline: per-batch work is vectorized Arrow; aggregations
pre-reduce inside map_batches where useful; small sides (the customer
dimension, the ANN query matrix) are broadcast via ``ray.put``, never
shuffled; reads prune columns.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from textpipe_ray.functions.quality import FEATURE_ORDER, load_thresholds
from textpipe_ray.functions.scrub import load_rules
from textpipe_ray.functions.strhash import part_ids as strhash_part_ids
from textpipe_ray.stages.text import (
    complexity_batch,
    normalize_batch,
    quality_batch,
    scrub_batch,
)

_I64 = pa.int64()
_F64 = pa.float64()


def _url_tail_ids(batch: pa.Table, col: str = "url") -> pa.Array:
    """Synthetic-pages url → int64 doc id (the path tail after the last
    '/'): one RE2 kernel + cast, batch-wide — never per-row Python."""
    tail = pc.replace_substring_regex(batch.column(col), pattern=r".*/", replacement="")
    return pc.cast(tail, _I64)

COUNT_COLS = ["n_chars"] + FEATURE_ORDER
RATIO_COLS = [
    "alpha_ratio",
    "digit_ratio",
    "upper_ratio",
    "symbol_ratio",
    "stopword_ratio",
    "mean_word_len",
]


def _read(
    sf_dir: str, table: str, columns: list[str] | None = None, min_blocks: int = 8
):
    """Pruned parquet read with size-proportional block count.

    Ray's default parallelism targets ≥2×CPUs blocks regardless of input
    size; on small tables that yields dozens of tiny blocks whose
    per-block shuffle coordination dominates wall time (measured 4-6×
    end-to-end overhead at sf0.1).  Below 256 MB we size blocks at
    ~4 MB with a floor of ``min_blocks`` for map parallelism; at real
    scale the override is off and Ray's own splitting governs.

    ``min_blocks`` is for map-compute-heavy, shuffle-light callers
    only: A/B at sf0.1 showed ``min_blocks=cpus`` HURTS shuffle-bound
    queries (q_ngram_jaccard 1.7→2.2 s, q_chunk_dedup 2.9→3.5 s warm)
    while the same cpu-count block floor on the pages MinHash path
    (map-dominated) wins 6.3→3.7 s — so only the pages read uses it."""
    import os as _os

    path = f"{sf_dir}/{table}.parquet"
    kw: dict = {}
    try:
        size = _os.path.getsize(path)
        if size < 256 * 2**20:
            kw["override_num_blocks"] = int(max(min_blocks, size // (4 * 2**20)))
    except OSError:
        pass
    return ray.data.read_parquet(path, columns=columns, **kw)


def _cpus() -> int:
    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def _cast_counts(batch: pa.Table) -> pa.Table:
    for name in COUNT_COLS:
        if name in batch.column_names:
            i = batch.column_names.index(name)
            batch = batch.set_column(i, name, pc.cast(batch.column(name), _I64))
    return batch


# ---------------------------------------------------------------------------
# text kernels over `documents`
# ---------------------------------------------------------------------------


def q_clean(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(normalize_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "clean"]
    )


def q_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        batch = quality_batch(batch, text_col="text")
        batch = _cast_counts(batch)
        return batch.select(["doc_id"] + COUNT_COLS + RATIO_COLS + ["keep", "drop_reason"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_complexity(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: complexity_batch(b, text_col="text").select(["doc_id", "complexity"]),
        batch_format="pyarrow",
    )


def q_scrub(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rules = load_rules()
    cols = ["doc_id"] + [f"scrub_{r['name']}" for r in rules["rules"]] + ["scrubbed_text"]

    def f(batch: pa.Table) -> pa.Table:
        return scrub_batch(batch, text_col="text", rules=rules).select(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fp = [hashlib.md5((t or "").encode("utf8")).hexdigest() for t in texts]
        return batch.select(["doc_id"]).append_column("fingerprint", pa.array(fp, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dedup / distributed ops
# ---------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    """Exact dedup on a 40-char-prefix hash: hash-partition groupby, min
    doc_id survives per group (SURVEY.md §2.7)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        k = [hashlib.md5((t or "")[:40].encode("utf8")).hexdigest() for t in texts]
        return batch.select(["doc_id"]).append_column("dedup_key", pa.array(k, pa.string()))

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("dedup_key")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
    )


def q_token_freq(sf_dir: str, top_n: int = 100):
    """Corpus token frequency: explode → partial pre-aggregate per batch
    → small groupby → top-N.  The pre-aggregate shrinks the shuffle from
    one row per token occurrence to one row per distinct token per batch."""
    from textpipe_ray.functions.quality import RE2_PATTERNS

    pat = RE2_PATTERNS["nwords"]
    ds = _read(sf_dir, "documents", ["text"])

    import regex as _re

    creg = _re.compile(pat)

    def explode(batch: pa.Table) -> pa.Table:
        # partial count within the batch (combiner before the shuffle),
        # in two C passes: one findall over the '\n'-joined batch (no
        # token can span '\n' — the word pattern excludes it), then one
        # np.unique for the counts.  No per-row python loop.
        lowered = pc.utf8_lower(batch.column("text")).to_pylist()
        toks = creg.findall("\n".join(t or "" for t in lowered))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "partial": pa.array([], _I64)}
            )
        uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq.tolist(), pa.string()),
                "partial": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    # single-key Sum uses Ray's native vectorized aggregate path (fast
    # even with vocab-sized group counts — unlike the multi-key
    # near-unique-groups case in stages/dedup.shingle_jaccard_pairs,
    # which needed a hash-partitioned combine)
    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(top_n)


def q_lang_metrics(sf_dir: str):
    """Grouped corpus metrics per (lang, source): docs, kept, chars."""
    ds = _read(sf_dir, "documents", ["text", "lang", "source"])
    t = load_thresholds()

    def f(batch: pa.Table) -> pa.Table:
        batch = quality_batch(batch, text_col="text", thresholds=t)
        keep_i = pc.cast(batch.column("keep"), _I64)
        n_chars = pc.cast(batch.column("n_chars"), _I64)
        return (
            batch.select(["lang", "source"])
            .append_column("n_chars", n_chars)
            .append_column("keep_i", keep_i)
        )

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("keep_i", alias_name="n_kept"),
        )
    )

    def post(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_docs"), _F64)
        s = pc.cast(batch.column("sum_chars"), _F64)
        batch = batch.append_column("avg_chars", pc.divide(s, n))
        for c in ("n_docs", "sum_chars", "n_kept"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow")


def q_topk_docs(sf_dir: str, k: int = 20):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# relational / events
# ---------------------------------------------------------------------------


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windows per event_type (streaming-shaped op on a
    batch engine: group on a derived window key)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def f(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), _I64)  # µs since epoch
        hour = pc.cast(pc.floor(pc.divide(pc.cast(us, _F64), 3600000000.0)), _I64)
        vmilli = pc.cast(pc.floor(pc.multiply(batch.column("value"), 1000.0)), _I64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_hour": hour,
                "vmilli": vmilli,
            }
        )

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["event_type", "window_hour"])
        .aggregate(Count(alias_name="n_events"), Sum("vmilli", alias_name="sum_value_milli"))
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in ("n_events", "sum_value_milli"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    """Sliding (hopping) window aggregate: 1-hour windows hopping every
    30 minutes — each event lands in exactly 2 windows (the flat-map +
    groupby expression of overlapping windows; complements the tumbling
    ``q_events_window``).  ``window_start`` is the window's start index
    in half-hours since epoch; integer-exact math keeps the DuckDB
    oracle bit-identical."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def f(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), _I64)
        hh = np.asarray(
            pc.cast(pc.floor(pc.divide(pc.cast(us, _F64), 1800000000.0)), _I64)
        )
        vmilli = np.asarray(
            pc.cast(pc.floor(pc.multiply(batch.column("value"), 1000.0)), _I64)
        )
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # a window covers 2 half-hour slots → slot h belongs to the
        # windows starting at h and h-1
        return pa.table(
            {
                "event_type": pa.concat_arrays([et, et]),
                "window_start": pa.array(np.concatenate([hh, hh - 1]), _I64),
                "vmilli": pa.array(np.concatenate([vmilli, vmilli]), _I64),
            }
        )

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("vmilli", alias_name="sum_value_milli"))
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in ("n_events", "sum_value_milli"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow")


ROLLING_WINDOW = 3


def q_rolling_sum(sf_dir: str):
    """Per-user rolling sum over the last 3 events (ordered by ts) —
    the bounded-window aggregate, computed for a whole hash partition
    of users in one vectorized cumsum pass.  Integer cents keep the
    oracle (SUM OVER ROWS 2 PRECEDING) bit-exact."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    num_parts = 32

    def pre(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), _I64)
        p = (
            (np.asarray(uid).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(num_parts)
        ).astype(np.int32)
        return pa.table(
            {
                "user_id": uid,
                "event_id": pc.cast(batch.column("event_id"), _I64),
                "ts_us": pc.cast(batch.column("ts"), _I64),
                "vcents": pc.cast(pc.floor(pc.multiply(batch.column("value"), 100.0)), _I64),
                "__p": pa.array(p, pa.int32()),
            }
        )

    def roll(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        v = g["vcents"].to_numpy()
        csum = np.concatenate(([0], np.cumsum(v)))
        n = len(g)
        idx = np.arange(n)
        # first index of each user's run
        first = np.zeros(n, dtype=np.int64)
        if n:
            new = np.ones(n, dtype=bool)
            new[1:] = uid[1:] != uid[:-1]
            first = idx[new][np.cumsum(new) - 1]
        lo = np.maximum(idx - (ROLLING_WINDOW - 1), first)
        rolling = csum[idx + 1] - csum[lo]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "rolling_cents": rolling.astype("int64"),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(roll, batch_format="pandas")
    )


SAMPLE_PCT = 10


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample: keep a fixed
    content-hash bucket range within every language stratum — the
    reproducible, engine-independent way to sample a training corpus
    (same rows selected on any cluster size or shard layout)."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        keep = np.array(
            [
                int(_hl.md5((t or "").encode("utf8")).hexdigest()[:8], 16) % 100 < SAMPLE_PCT
                for t in batch.column("text").to_pylist()
            ],
            dtype=bool,
        )
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(out.column("doc_id"), _I64),
                "lang": out.column("lang"),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow")


SPLIT_TRAIN_PCT = 90


def q_train_split(sf_dir: str):
    """Deterministic content-hash train/val split (the standard
    leakage-safe way to split a training corpus: the SAME document
    always lands in the same split, across runs, engines and shard
    layouts).  Pure per-batch map; md5-prefix arithmetic matches the
    DuckDB oracle exactly."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(batch: pa.Table) -> pa.Table:
        buckets = np.array(
            [
                int(_hl.md5((t or "").encode("utf8")).hexdigest()[:8], 16) % 100
                for t in batch.column("text").to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "split": pa.array(
                    np.where(buckets < SPLIT_TRAIN_PCT, "train", "val"), pa.string()
                ),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")


def q_asof_join(sf_dir: str):
    """AS-OF join — an operator Ray Data lacks natively: each event
    matches the latest order of the same customer at-or-before the
    event time.  Built as a co-group: both sides tagged + unioned,
    hash-partitioned on the key (ALL rows of a key land in one
    partition — the partitioning assumption this operator relies on),
    then one C-speed ``pandas.merge_asof(by=key)`` per partition.
    Oracle: DuckDB's native ``ASOF JOIN``."""
    import pandas as pd

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    num_parts = 32

    def tag_events(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch.column("user_id"), _I64)
        return pa.table(
            {
                "key": key,
                "ts_us": pc.cast(batch.column("ts"), _I64),
                "event_id": pc.cast(batch.column("event_id"), _I64),
                "is_event": pa.array([True] * len(batch), pa.bool_()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        col = batch.column("o_orderdate")
        if pa.types.is_date(col.type):
            us = pc.multiply(pc.cast(pc.cast(col, pa.int32()), _I64), 86_400_000_000)
        else:  # timestamp storage
            us = pc.cast(pc.cast(col, pa.timestamp("us")), _I64)
        return pa.table(
            {
                "key": pc.cast(batch.column("o_custkey"), _I64),
                "ts_us": us,
                "event_id": pa.array([-1] * len(batch), _I64),
                "is_event": pa.array([False] * len(batch), pa.bool_()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("key"), dtype=np.int64)
        p = ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)).astype(
            np.int32
        )
        return batch.append_column("__p", pa.array(p, pa.int32()))

    both = (
        ev.map_batches(tag_events, batch_format="pyarrow")
        .union(od.map_batches(tag_orders, batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
    )

    def asof_partition(part: pd.DataFrame) -> pd.DataFrame:
        e = part[part["is_event"]].sort_values("ts_us", kind="mergesort")
        o = part[~part["is_event"]].sort_values("ts_us", kind="mergesort")
        if e.empty or o.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "last_order_days": []}
            ).astype("int64")
        m = pd.merge_asof(
            e[["ts_us", "key", "event_id"]],
            o[["ts_us", "key"]].assign(order_us=o["ts_us"]),
            on="ts_us",
            by="key",
            direction="backward",
        ).dropna(subset=["order_us"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["key"].astype("int64"),
                "last_order_days": (m["order_us"] // 86_400_000_000).astype("int64"),
            }
        )

    return both.groupby("__p").map_groups(asof_partition, batch_format="pandas")


def q_native_join(sf_dir: str):
    """Distributed hash join via ``Dataset.join`` (Ray ≥2.46) — the
    big-⋈-big strategy, complementing the broadcast map-side join in
    ``q_segment_orders`` (small side shipped via ``ray.put``).  Use
    this shape when BOTH sides are too large to broadcast; the shuffle
    exchanges each side hash-partitioned on the key."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = o.join(
        c, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",)
    )

    def post(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(batch.column("o_orderkey"), _I64),
                "o_custkey": pc.cast(batch.column("o_custkey"), _I64),
                "c_mktsegment": batch.column("c_mktsegment"),
                "price_cents": pc.cast(
                    pc.floor(pc.multiply(batch.column("o_totalprice"), 100.0)), _I64
                ),
            }
        )

    return j.map_batches(post, batch_format="pyarrow")


def q_repetition(sf_dir: str):
    """Gopher-style repetition signals per document: duplicate word
    3-gram fraction and most-common-bigram fraction — the classic
    boilerplate/spam detectors for webtext quality filtering.  Pure
    per-batch map (no shuffle); fractions are int/int divisions so the
    DuckDB oracle matches bit-for-bit."""
    import re as _re

    tok_re = _re.compile(TFIDF_TOKEN_RE)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        tot3, dis3, top2, tot2 = [], [], [], []
        for t in batch.column("text").to_pylist():
            ws = tok_re.findall((t or "").lower())
            tri = [" ".join(ws[i : i + 3]) for i in range(max(0, len(ws) - 2))]
            bi = [" ".join(ws[i : i + 2]) for i in range(max(0, len(ws) - 1))]
            tot3.append(len(tri))
            dis3.append(len(set(tri)))
            tot2.append(len(bi))
            if bi:
                _, c = np.unique(bi, return_counts=True)
                top2.append(int(c.max()))
            else:
                top2.append(0)
        tot3a = np.asarray(tot3, dtype=np.float64)
        dis3a = np.asarray(dis3, dtype=np.float64)
        tot2a = np.asarray(tot2, dtype=np.float64)
        top2a = np.asarray(top2, dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "n_trigrams": pa.array(np.asarray(tot3, dtype=np.int64), _I64),
                "dup_trigram_frac": pa.array(
                    np.where(tot3a > 0, (tot3a - dis3a) / np.maximum(tot3a, 1), 0.0), _F64
                ),
                "top_bigram_frac": pa.array(
                    np.where(tot2a > 0, top2a / np.maximum(tot2a, 1), 0.0), _F64
                ),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


TFIDF_K = 5
TFIDF_TOKEN_RE = r"[0-9a-z_]+"


def q_tfidf_topk(sf_dir: str):
    """Corpus TF-IDF, top-5 terms per document — FULLY distributed:

    (1) one pass emits per-doc distinct (doc_id, term, tf) rows; (2)
    document frequencies are one ``groupby(term).count`` over those
    rows (the df exchange); (3) df attaches back to the tf rows by a
    hash-co-partitioned merge on the term STRING
    (:func:`textpipe_ray.stages.joins.copartition_merge_str`) — web
    vocabularies are billions of terms, so the df side is never
    collected or broadcast; (4) top-5 per doc via a doc-hash partition
    + one vectorized sort/cumcount per partition.

    Scores are quantized to ``floor(score * 1e9)`` before ranking on
    BOTH engines (the oracle SQL applies the same floor): numpy and
    DuckDB may disagree by an ulp on ``ln``, which would otherwise flip
    the rank of two near-equal non-tied scores; after quantization the
    deterministic ``term`` tie-break decides those cases identically."""
    import re as _re

    from textpipe_ray.stages.joins import copartition_merge_str

    tok_re = _re.compile(TFIDF_TOKEN_RE)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def tf_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_term, out_tf = [], [], []
        for did, t in zip(
            np.asarray(batch.column("doc_id"), dtype=np.int64),
            batch.column("text").to_pylist(),
        ):
            toks = tok_re.findall((t or "").lower())
            if not toks:
                continue
            uniq, tf = np.unique(toks, return_counts=True)
            out_doc.append(np.full(len(uniq), did, dtype=np.int64))
            out_term.append(uniq)
            out_tf.append(tf.astype(np.int64))
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), _I64),
                "term": pa.array(np.concatenate(out_term).tolist(), pa.string()),
                "tf": pa.array(np.concatenate(out_tf), _I64),
            }
        )

    # materialized once (distributed blocks): both the df aggregate and
    # the join consume the same tokenization pass
    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    df_ds = tf_ds.groupby("term").aggregate(Count(alias_name="df"))

    joined = copartition_merge_str(
        tf_ds,
        "term",
        {"doc_id": pa.int64(), "term": pa.string(), "tf": pa.int64()},
        df_ds,
        "term",
        {"df": pa.int64()},
    )

    num_parts = 64

    def add_doc_part(batch: pa.Table) -> pa.Table:
        did = np.asarray(batch.column("doc_id"), dtype=np.int64)
        p = (
            (did.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)
        ).astype(np.int32)
        return batch.append_column("__dp", pa.array(p, pa.int32()))

    def topk_part(part) -> "pa.Table":
        import pandas as pd

        if len(part) == 0:
            return pd.DataFrame({"doc_id": [], "term": [], "rank": []})
        tf = part["tf"].to_numpy().astype(np.float64)
        df = part["df"].to_numpy().astype(np.float64)
        score_q = np.floor(tf * np.log(float(n_docs) / df) * 1e9).astype(np.int64)
        g = part.assign(__sq=score_q).sort_values(
            ["doc_id", "__sq", "term"], ascending=[True, False, True], kind="mergesort"
        )
        g = g.assign(rank=g.groupby("doc_id").cumcount() + 1)
        g = g[g["rank"] <= TFIDF_K]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "term": g["term"],
                "rank": g["rank"].astype("int64"),
            }
        )

    return (
        joined.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("__dp")
        .map_groups(topk_part, batch_format="pandas")
    )


CONTAM_K = 5  # word-shingle size for the decontamination check
CONTAM_BENCH_DOCS = 5  # doc_id < 5 play the "benchmark set"


def q_contamination(sf_dir: str):
    """Benchmark decontamination check — the step every training corpus
    runs before release: flag documents sharing any word ``k``-gram with
    a benchmark set.  The benchmark side (here: docs with ``doc_id <
    5``) is a SMALL FIXED set, so its distinct shingles broadcast once
    via ``ray.put`` and the scan is a pure per-batch ``np.isin`` — no
    shuffle at all, the right plan at any corpus size.  String shingles
    (not hashes) on both engines keep the DuckDB oracle bit-exact."""
    import re as _re

    import pyarrow.parquet as pq

    tok_re = _re.compile(TFIDF_TOKEN_RE)

    def shingles_of(text: str) -> set:
        ws = tok_re.findall((text or "").lower())
        return {" ".join(ws[i : i + CONTAM_K]) for i in range(len(ws) - CONTAM_K + 1)}

    bench_t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bench_t = bench_t.filter(pc.less(bench_t.column("doc_id"), CONTAM_BENCH_DOCS))
    bench = sorted(set().union(*(shingles_of(t) for t in bench_t.column("text").to_pylist())))
    bench_ref = ray.put(np.asarray(bench, dtype=object))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def check(batch: pa.Table) -> pa.Table:
        bench_arr = ray.get(bench_ref)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        keep = ids >= CONTAM_BENCH_DOCS
        out_id, out_n, out_ov = [], [], []
        for did, t in zip(ids[keep], np.asarray(batch.column("text").to_pylist(), dtype=object)[keep]):
            sh = np.asarray(sorted(shingles_of(t)), dtype=object)
            out_id.append(did)
            out_n.append(len(sh))
            out_ov.append(int(np.isin(sh, bench_arr).sum()) if len(sh) else 0)
        n_ov = np.asarray(out_ov, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, _I64),
                "n_shingles": pa.array(out_n, _I64),
                "n_overlap": pa.array(n_ov, _I64),
                "contaminated": pa.array(n_ov > 0, pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


PACK_BUDGET = 2048  # tokens per bin
PACK_RANGE = 256  # doc ids per prefix-sum range


def q_pack_sequences(sf_dir: str):
    """Token-budget sequence sharding — packing a corpus into
    fixed-token-budget bins for training: documents in ``doc_id`` order
    are assigned ``bin_id = floor(preceding_token_total / budget)``.

    A global prefix sum on a distributed engine: (1) per-batch token
    counts; (2) doc-id-range partitions compute LOCAL prefix sums + one
    per-range total; (3) the per-range totals (one int per ~256 docs —
    metadata-scale, like the lineage ledger) come to the driver for a
    tiny cumsum and broadcast back; (4) the final map adds range offset
    + local prefix.  Exact integer arithmetic end to end; oracle is a
    SUM ... OVER window."""
    import re as _re

    import pandas as pd

    tok_re = _re.compile(TFIDF_TOKEN_RE)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n = np.asarray(
            [len(tok_re.findall((t or "").lower())) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "n_tokens": pa.array(n, _I64),
                "__rg": pa.array((ids // PACK_RANGE).astype(np.int32), pa.int32()),
            }
        )

    def local_prefix(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy()
        prev = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "local_prev": prev,
                "rg": g["__rg"].to_numpy().astype("int64"),
            }
        )

    counted = ds.map_batches(counts, batch_format="pyarrow").materialize()
    local = counted.groupby("__rg").map_groups(local_prefix, batch_format="pandas")

    # per-range totals: one row per PACK_RANGE docs — metadata-sized
    totals = (
        counted.groupby("__rg")
        .aggregate(Sum("n_tokens", alias_name="total"))
        .to_pandas()
        .sort_values("__rg")
    )
    rgs = totals["__rg"].to_numpy().astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(totals["total"].to_numpy())[:-1])).astype(np.int64)
    off_ref = ray.put((rgs, offs))

    def assign(batch: pa.Table) -> pa.Table:
        s_rg, s_off = ray.get(off_ref)
        rg = np.asarray(batch.column("rg"), dtype=np.int64)
        prev = np.asarray(batch.column("local_prev"), dtype=np.int64) + s_off[
            np.searchsorted(s_rg, rg)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(_I64),
                "n_tokens": batch.column("n_tokens").cast(_I64),
                "bin_id": pa.array(prev // PACK_BUDGET, _I64),
            }
        )

    return local.map_batches(assign, batch_format="pyarrow")


QUANTILES = ((25, 100), (50, 100), (90, 100), (99, 100))  # exact rationals


def q_len_quantiles(sf_dir: str):
    """EXACT per-language quantiles of document length, computed as a
    distributed value histogram: per-batch partial (lang, n_chars)
    counts → one small groupby → per-lang cumulative pick on the
    driver.  No global sort — the exchange carries one row per distinct
    (lang, value), not per document, so it stays tiny at any corpus
    size.  Index rule matches DuckDB ``quantile_disc``:
    ``sorted[max(0, ceil(q*n)-1)]``, computed in EXACT integer
    arithmetic with q held as a rational (``ceil(num*n/den)`` via
    negated floor division) — float ``q*n`` could land an ulp across an
    integer boundary at some corpus size and silently disagree with the
    oracle's internal index rule."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pylist(),
                "n_chars": np.asarray(batch.column("n_chars"), dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "n_chars"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_chars": pa.array(g["n_chars"], _I64),
                "cnt": pa.array(g["cnt"].astype("int64"), _I64),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # tiny: one row per distinct (lang, value)
    )
    rows = {"lang": [], **{f"p{num * 100 // den}": [] for num, den in QUANTILES}}
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        cnts = g["cnt"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows["lang"].append(lang)
        for num, den in QUANTILES:
            idx = max(0, -(-(num * n) // den) - 1)  # quantile_disc: ceil(q*n)-1, exact
            rows[f"p{num * 100 // den}"].append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            **{k: pa.array(rows[k], _I64) for k in rows if k != "lang"},
        }
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (the classic streaming operator on a
    batch engine): hash-partition by user, order each user's events by
    (ts, event_id), break sessions at >30 min inactivity, emit one row
    per session.  Exact parity with a lag()/running-sum window-function
    oracle in DuckDB."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), _I64),
                "event_id": pc.cast(batch.column("event_id"), _I64),
                "ts_us": pc.cast(batch.column("ts"), _I64),
                "vcents": pc.cast(
                    pc.floor(pc.multiply(batch.column("value"), 100.0)), _I64
                ),
            }
        )

    # one group per USER would pay Ray's per-group dispatch for every
    # user (millions at real scale) — instead co-locate each user's
    # events via a coarse hash partition and sessionize ALL of a
    # partition's users in one vectorized pass
    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), dtype=np.int64)
        p = (
            (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        ).astype(np.int32)
        return batch.append_column("__p", pa.array(p, pa.int32()))

    def sessionize_partition(part):  # many users' events (pandas)
        g = part.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user = uid[1:] == uid[:-1]
            brk[1:] = (~same_user | (ts[1:] - ts[:-1] > SESSION_GAP_US)).astype(np.int64)
        g = g.assign(__s=np.cumsum(brk))  # globally increasing session key
        out = (
            g.groupby(["user_id", "__s"], sort=True)
            .agg(
                n_events=("event_id", "size"),
                start_us=("ts_us", "min"),
                end_us=("ts_us", "max"),
                sum_value_cents=("vcents", "sum"),
            )
            .reset_index()
        )
        # per-user 1-based session index (groups arrive (user, __s)-sorted)
        out["session_id"] = out.groupby("user_id").cumcount() + 1
        return out[
            ["user_id", "session_id", "n_events", "start_us", "end_us", "sum_value_cents"]
        ].astype("int64")

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(sessionize_partition, batch_format="pandas")
    )


CUTOFF = datetime(1998, 9, 3)


def q_agg_lineitem(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with integer-exact money math
    (floor to centi-units so the double-summation order can't matter)."""
    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def f(batch: pa.Table) -> pa.Table:
        # filter + integer-quantize + PARTIAL aggregate (combiner): the
        # handful of (returnflag, linestatus) groups collapse inside the
        # batch, so the exchange carries ~6 rows per block instead of
        # every line item (int64 sums are exact and associative, so the
        # two-level sum is identical to the one-level one)
        mask = pc.less(batch.column("l_shipdate"), pa.scalar(CUTOFF))
        batch = batch.filter(mask)
        qty = pc.cast(pc.floor(batch.column("l_quantity")), _I64)
        cents = pc.cast(pc.floor(pc.multiply(batch.column("l_extendedprice"), 100.0)), _I64)
        disc4 = pc.cast(pc.floor(pc.multiply(batch.column("l_discount"), 10000.0)), _I64)
        local = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "price_cents": cents,
                "disc_e4": disc4,
            }
        )
        part = local.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("disc_e4", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "l_returnflag": part.column("l_returnflag"),
                "l_linestatus": part.column("l_linestatus"),
                "qty": part.column("qty_sum"),
                "price_cents": part.column("price_cents_sum"),
                "disc_e4": part.column("disc_e4_sum"),
                "partial_n": pc.cast(part.column("count_all"), _I64),
            }
        )

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Sum("disc_e4", alias_name="sum_disc_e4"),
            Sum("partial_n", alias_name="n"),
        )
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_price_cents", "sum_disc_e4", "n"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow")


def q_segment_orders(sf_dir: str):
    """Broadcast hash join: the small customer dimension is shipped once
    via ``ray.put`` as two SORTED parallel arrays and looked up per
    batch with one vectorized ``np.searchsorted`` — no shuffle of
    orders, no per-row python dict lookup."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ckeys = np.asarray(cust.column("c_custkey"), dtype=np.int64)
    csegs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)
    order = np.argsort(ckeys)
    lookup_ref = ray.put((ckeys[order], csegs[order]))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def f(batch: pa.Table) -> pa.Table:
        sk, sv = ray.get(lookup_ref)
        k = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, k), len(sk) - 1)
            seg = np.where(sk[pos] == k, sv[pos], "UNKNOWN")
        else:
            seg = np.full(len(k), "UNKNOWN", dtype=object)
        cents = pc.cast(pc.floor(pc.multiply(batch.column("o_totalprice"), 100.0)), _I64)
        return pa.table(
            {"c_mktsegment": pa.array(seg.tolist(), pa.string()), "price_cents": cents}
        )

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("price_cents", alias_name="sum_price_cents"))
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in ("n_orders", "sum_price_cents"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

ANN_NUM_QUERIES = 5
ANN_K = 10


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: query matrix broadcast once, per-batch
    float64 matmul, then a per-batch PARTIAL top-k (≤ k rows per query
    per batch leave the scoring stage — stages/ann.ann_brute_scores),
    merged by a groupby that sees k·num_blocks rows per query instead
    of every scored candidate.  Ranks on floor(cos·1e9): numpy's matmul
    and DuckDB's list_cosine_similarity sum in different orders, so raw
    doubles can differ by ~1 ulp and flip near-equal ranks; after
    quantization the neighbor_id tie-break decides those identically on
    both engines (the oracle SQL applies the same floor)."""
    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import ann_brute_topk

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), ANN_NUM_QUERIES))
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    qmat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_brute_topk(ds, qids, qmat, k=ANN_K).select_columns(
        ["query_id", "neighbor_id", "rank"]
    )


# ---------------------------------------------------------------------------
# model-scored / non-SQL-expressible queries (rows-only driver check)
# ---------------------------------------------------------------------------


def q_langid(sf_dir: str):
    """Language-ID over documents.text (model op — no SQL oracle)."""
    from textpipe_ray.stages.actors import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pre(batch: pa.Table) -> pa.Table:
        return batch.append_column("clean", batch.column("text"))

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .map_batches(LangIdStage, batch_format="pyarrow", batch_size=1024, concurrency=2)
        .select_columns(["doc_id", "pred_lang", "lang_reliable", "lang_margin"])
    )


def q_perplexity(sf_dir: str):
    """Char-LM perplexity over documents.text (model op — no SQL oracle)."""
    from textpipe_ray.stages.actors import PerplexityStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pre(batch: pa.Table) -> pa.Table:
        return batch.append_column("clean", batch.column("text"))

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .map_batches(PerplexityStage, batch_format="pyarrow", batch_size=1024, concurrency=2)
        .select_columns(["doc_id", "perplexity"])
    )


def q_minhash(sf_dir: str):
    """MinHash signatures, emitted as VALUE-CHECKABLE scalars: an md5
    digest of the full 128×uint64 signature plus its first/last
    components (the raw ``list<uint64>`` signature stays available via
    ``stages.dedup.minhash_batch`` / the ``MinHash`` op — scalar columns
    let the driver hash-compare this query against a committed golden
    table, list columns would not survive the compare canonically)."""
    from textpipe_ray.stages.dedup import minhash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def digest(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "sig_md5": pa.array([], pa.string()),
                    "sig_first": pa.array([], _I64),
                    "sig_last": pa.array([], _I64),
                }
            )
        sigs = np.asarray(
            batch.column("minhash").combine_chunks().flatten(), dtype=np.uint64
        ).reshape(n, -1)
        md5s = [hashlib.md5(row.tobytes()).hexdigest() for row in sigs]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig_md5": pa.array(md5s, pa.string()),
                "sig_first": pa.array(sigs[:, 0].astype(np.int64), _I64),
                "sig_last": pa.array(sigs[:, -1].astype(np.int64), _I64),
            }
        )

    return ds.map_batches(minhash_batch, batch_format="pyarrow").map_batches(
        digest, batch_format="pyarrow"
    )


def q_simhash(sf_dir: str):
    from textpipe_ray.stages.dedup import simhash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"]
    )


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs: band-bucket groupby + in-group hamming
    verify; recall 1.0 within the hamming ball by pigeonhole."""
    from textpipe_ray.stages.dedup import near_dup_simhash

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return near_dup_simhash(ds, max_hamming=3)


def q_ngram_jaccard(sf_dir: str, k: int = 3, threshold: float = 0.8):
    """EXACT word-3-gram Jaccard pairs (inverted-index plan) — full
    DuckDB oracle parity, unlike the sketch-based dedup queries."""
    from textpipe_ray.stages.dedup import shingle_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return shingle_jaccard_pairs(ds, k=k, threshold=threshold)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed cosine top-k (the brute-force q_ann_topk's scale
    path: queries probe nprobe of num_centroids cells)."""
    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import ann_ivf_topk

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), ANN_NUM_QUERIES))
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    qmat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_ivf_topk(ds, qids, qmat, k=ANN_K, num_centroids=32, nprobe=8)


def q_textpipe_ops(sf_dir: str):
    """The textpipe operation registry run as one fused batch stage over
    documents (Pipeline-spec path; nested Arrow output → rows-only check)."""
    from textpipe_ray.pipelines.spec import Pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    p = Pipeline(
        [
            "CleanText",
            "Language",
            "NWords",
            "NSentences",
            "Complexity",
            "Keyterms",
            "MinHash",
            "LeadSentences",
        ]
    )
    return p.transform(ds).select_columns(
        ["doc_id", "Language", "NWords", "NSentences", "Complexity"]
    )


def q_doc_vectors(sf_dir: str):
    """The vector/textcat operation family through the registry path —
    ``WordVectors`` / ``DocumentVector`` / ``GensimDocumentEmbedding``
    (reference operation.py:293-358) and ``Categories``
    (operation.py:430-448) — with the keyed-vectors table loaded from a
    committed model file (``Pipeline(models=[(name, lang, path)])``,
    the reference's custom-model mechanism, pipeline.py:54-60).

    The SAME vector table is additionally served from
    ``state/vecstore.ShardedVectorStore`` (the reference's
    Redis-KeyedVectors analog, wrappers.py:20-125): the finisher
    recomputes every DocumentVector via batched per-shard actor lookups
    (one RPC per touched shard per batch) with the identical per-doc
    fold order, and emits ``store_match`` — bit-equality of the two
    paths per document, all-true in the committed golden.  This is the
    >node-RAM vector story exercised end-to-end under a driver row.

    Output is all scalars (digests + micro-quantized norms) so the
    driver value-checks it against a committed golden parquet."""
    from pathlib import Path as _Path

    from textpipe_ray.functions.vectors import _WORD_RE, _hash_vector
    from textpipe_ray.pipelines.spec import Pipeline
    from textpipe_ray.state.vecstore import ShardedVectorStore

    models_dir = _Path(__file__).resolve().parents[2] / "models" / "custom"
    vec_path = str(models_dir / "doc_vectors.json")
    p = Pipeline(
        [
            "CleanText",
            ("WordVectors", {}),
            ("DocumentVector", {"aggregation": "mean"}),
            ("GensimDocumentEmbedding", {"idf_weighting": "log"}),
            ("Categories", {"model_name": "news"}),
        ],
        models=[
            ("docvec", "*", vec_path),
            ("news", "*", str(models_dir / "news_textcat.json")),
        ],
    )

    import json as _json

    obj = _json.loads(_Path(vec_path).read_text())
    dim = int(obj["dim"])
    store = ShardedVectorStore.from_items(obj["vectors"], dim, num_shards=4)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def digest(batch: pa.Table) -> pa.Table:
        n = len(batch)
        wv = batch.column("WordVectors").to_pylist()
        dv = batch.column("DocumentVector").to_pylist()
        ge = batch.column("GensimDocumentEmbedding").to_pylist()
        cats = batch.column("Categories").to_pylist()
        texts = batch.column("clean").to_pylist()

        # ---- sharded-store path: ONE batched lookup for the batch's
        # distinct lowercased tokens (≤ num_shards RPCs), then per-doc
        # reassembly with the same np.stack(...).mean(axis=0) fold as
        # aggregate_word_vectors → bit-identical when both paths agree
        doc_toks = [[m.group().lower() for m in _WORD_RE.finditer(t or "")] for t in texts]
        uniq = sorted({tok for toks in doc_toks for tok in toks})
        mat, hit = store.lookup(uniq)
        vec_by_tok = {}
        for i, tok in enumerate(uniq):
            vec_by_tok[tok] = mat[i] if hit[i] else _hash_vector(tok, dim)

        out = {
            "doc_id": pc.cast(batch.column("doc_id"), _I64),
            "n_tokens": [],
            "n_vocab": [],
            "docvec_md5": [],
            "docvec_norm_micro": [],
            "gensim_md5": [],
            "gensim_n": [],
            "top_cat": [],
            "top_cat_micro": [],
            "store_match": [],
        }
        for i in range(n):
            pairs = wv[i] or []
            out["n_tokens"].append(len(pairs))
            out["n_vocab"].append(sum(1 for _, rec in pairs if rec["has_vector"]))
            v = np.asarray(dv[i] or [], dtype=np.float64)
            out["docvec_md5"].append(hashlib.md5(v.tobytes()).hexdigest() if len(v) else "")
            out["docvec_norm_micro"].append(
                int(np.floor(np.sqrt((v * v).sum()) * 1e6)) if len(v) else 0
            )
            g = np.asarray(ge[i] or [], dtype=np.float64)
            out["gensim_md5"].append(hashlib.md5(g.tobytes()).hexdigest() if len(g) else "")
            out["gensim_n"].append(len(g))
            cd = cats[i] or []
            if cd:
                # max score, label asc tie-break — deterministic
                top = sorted(cd, key=lambda kv: (-kv[1], kv[0]))[0]
                out["top_cat"].append(top[0])
                out["top_cat_micro"].append(int(np.floor(top[1] * 1e6)))
            else:
                out["top_cat"].append("")
                out["top_cat_micro"].append(0)
            toks = doc_toks[i]
            if toks:
                sv = np.stack([vec_by_tok[t] for t in toks]).mean(axis=0)
                out["store_match"].append(bool(len(v) == dim and (sv == v).all()))
            else:
                out["store_match"].append(len(v) == 0)
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "n_tokens": pa.array(out["n_tokens"], _I64),
                "n_vocab": pa.array(out["n_vocab"], _I64),
                "docvec_md5": pa.array(out["docvec_md5"], pa.string()),
                "docvec_norm_micro": pa.array(out["docvec_norm_micro"], _I64),
                "gensim_md5": pa.array(out["gensim_md5"], pa.string()),
                "gensim_n": pa.array(out["gensim_n"], _I64),
                "top_cat": pa.array(out["top_cat"], pa.string()),
                "top_cat_micro": pa.array(out["top_cat_micro"], _I64),
                "store_match": pa.array(out["store_match"], pa.bool_()),
            }
        )

    return p.transform(ds).map_batches(digest, batch_format="pyarrow")


def _video_summary(batch: pa.Table) -> pa.Table:
    n = [len(ts) if ts is not None else 0 for ts in batch.column("frame_ts_ms").to_pylist()]
    return batch.append_column("n_frames", pa.array(n, _I64))


def _media_digests(batch: pa.Table) -> pa.Table:
    """Scalar digests of the list-valued feature columns (bit-exact md5
    over the float64 bytes) so the driver can value-check this query
    against a committed golden table."""

    def col_digest(colname: str) -> pa.Array:
        out = []
        for v in batch.column(colname).to_pylist():
            if v is None:
                out.append(None)
            else:
                out.append(hashlib.md5(np.asarray(v, dtype=np.float64).tobytes()).hexdigest())
        return pa.array(out, pa.string())

    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "decoded_ok": batch.column("decoded_ok"),
            "image_feat_md5": col_digest("image_features"),
            "rms_md5": col_digest("rms_envelope"),
            "n_frames": batch.column("n_frames"),
        }
    )


def q_media_features(sf_dir: str):
    """Multimodal actor-pool stages over the synthetic media table
    (decode stubbed deterministically; Ray plumbing real)."""
    import ray.data

    from textpipe_ray.stages.multimodal import (
        AudioFeatureStage,
        ImageFeatureStage,
        VideoFrameSampleStage,
        generate_media,
    )

    rows = {"0.001": 200, "0.01": 500, "0.1": 2000}
    import re as _re

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    n = rows.get(m.group(1) if m else "0.001", 200)
    ds = ray.data.from_arrow(generate_media(n)).repartition(8)
    return (
        ds.map_batches(ImageFeatureStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 4))
        .map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 4))
        .map_batches(
            VideoFrameSampleStage, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
        )
        # frame_ts_ms is a UNIFORM-length list — Ray's pandas conversion
        # tries a tensor-extension cast and fails on the null (non-video)
        # rows — and list feature columns don't canonicalize in the
        # value compare, so the driver-facing output is all scalars
        # (digests for the feature vectors)
        .map_batches(_video_summary, batch_format="pyarrow")
        .map_batches(_media_digests, batch_format="pyarrow")
    )


def _doc_tf_embed(batch: pa.Table) -> pa.Table:
    """Hashed tf document embeddings of ``documents.text`` → (vec_id,
    embedding).  Planted near-dup texts produce genuinely similar
    vectors, so embedding-dedup recall is observable on this column.
    (The ``embeddings`` table is uniform random — max pairwise cosine
    ~0.51 — so no near-dup threshold is meaningful there; it serves the
    ANN top-k queries instead.)"""
    import re as _re

    from textpipe_ray.functions.vectors import DIM, _hash_vector

    tok_re = _re.compile(TFIDF_TOKEN_RE)
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    vecs = []
    for t in batch.column("text").to_pylist():
        toks = tok_re.findall((t or "").lower())
        if not toks:
            vecs.append(np.zeros(DIM))
            continue
        uniq, tf = np.unique(toks, return_counts=True)
        m = np.stack([_hash_vector(w) for w in uniq])
        vecs.append((tf[:, None] * m).sum(axis=0) / len(toks))
    return pa.table(
        {
            "vec_id": pa.array(ids, _I64),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(_F64)),
        }
    )


def q_embedding_neardup(sf_dir: str):
    """Cosine near-duplicate pairs via hyperplane LSH over the hashed-tf
    document embeddings (:func:`_doc_tf_embed`)."""
    from textpipe_ray.functions.vectors import DIM
    from textpipe_ray.stages.dedup import near_dup_embeddings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = ds.map_batches(_doc_tf_embed, batch_format="pyarrow")
    return near_dup_embeddings(emb, threshold=0.9, dim=DIM)


SEMDEDUP_K = 16  # clusters; scales with the corpus (SemDeDup used ~10^5)
SEMDEDUP_COS_Q = int(0.92 * 1e9)  # quantized within-cluster cosine threshold
SEMDEDUP_CHUNK = 2048  # cosine-block edge: memory ≤ CHUNK² doubles per task
SEMDEDUP_CELL_CAP = 4096  # max rows per cell before recursive sub-split


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic dedup: k-means-cluster the
    document embeddings, then deduplicate WITHIN each cluster by
    pairwise cosine — keep the min-id representative of every similar
    group (greedy in id order: a doc is kept iff it is not within
    threshold of any already-kept lower id; deterministic and
    engine-independent after the floor(cos·1e9) quantization).

    Physical plan: centroids fit on the hash-uniform bounded sample
    (stages/ann._uniform_sample — survives cluster-sorted corpora) and
    broadcast once; assignment is one row-local pass; the ONLY
    corpus-sized exchange is the ``groupby(cell)``, which turns the
    O(n²) all-pairs comparison into per-cell O(m²) in-task jobs.  The
    classic SemDeDup failure mode — one skewed mega-cluster making a
    single task quadratic — is closed by
    :func:`stages.ann.refine_hot_cells`: any cell over
    ``SEMDEDUP_CELL_CAP`` rows is recursively re-clustered into
    sub-cells BEFORE the shuffle, so per-task work is bounded at
    ~cap² regardless of corpus skew (sub-split is semantic k-means, so
    near-dup neighbourhoods stay co-located; the
    identical-vector blob it cannot split is exactly the case where
    the chunked greedy is linear, not quadratic).  Mega-cells are
    additionally memory-safe (the greedy verify evaluates cosine in
    ``SEMDEDUP_CHUNK``-square blocks against the kept set, never an
    n×n matrix).  Golden-oracle value-checked (k-means is not
    SQL-expressible)."""
    import pandas as pd

    from textpipe_ray.stages.ann import (
        _kmeans,
        _uniform_sample,
        assign_cells,
        refine_hot_cells,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # materialized because BOTH the centroid sample and the assignment
    # pass consume it (object-store blocks, spillable — never driver
    # memory); in production the embeddings are a precomputed parquet
    # column (like the `embeddings` table) and this pass disappears
    emb = ds.map_batches(_doc_tf_embed, batch_format="pyarrow").materialize()
    sample = _uniform_sample(emb, 2048, "vec_id", "embedding")
    cents = _kmeans(sample, SEMDEDUP_K, iters=8, seed=13)

    def dedup_cluster(group: pd.DataFrame) -> pa.Table:
        # Greedy min-id keep with CHUNKED evaluation: cosine blocks are
        # (CHUNK × CHUNK) matmuls against the already-kept rows, never a
        # full n×n matrix — a skewed mega-cluster is memory-SAFE (the
        # quadratic COMPUTE within a cluster is inherent to SemDeDup;
        # K must still scale with the corpus to bound it).
        CH = SEMDEDUP_CHUNK
        ids = group["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(group["embedding"].tolist(), dtype=np.float64)[order]
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0  # zero vectors: cosine 0 with everything
        n = len(ids)
        keep = np.zeros(n, dtype=bool)
        kept: list[int] = []  # indices of kept rows, ascending id order
        for c0 in range(0, n, CH):
            c1 = min(c0 + CH, n)
            chunk, cn = mat[c0:c1], norms[c0:c1]
            blocked = np.zeros(c1 - c0, dtype=bool)
            for k0 in range(0, len(kept), CH):
                ks = kept[k0 : k0 + CH]
                sims = (chunk @ mat[ks].T) / (cn[:, None] * norms[ks][None, :])
                blocked |= (
                    np.floor(sims * 1e9).astype(np.int64) >= SEMDEDUP_COS_Q
                ).any(axis=1)
            local: list[int] = []
            for j in range(c1 - c0):  # python loop bounded by CHUNK size
                if blocked[j]:
                    continue
                if local:
                    s = (chunk[local] @ chunk[j]) / (cn[local] * cn[j])
                    if (np.floor(s * 1e9).astype(np.int64) >= SEMDEDUP_COS_Q).any():
                        continue
                local.append(j)
            for j in local:
                keep[c0 + j] = True
                kept.append(c0 + j)
        return pa.table(
            {
                "vec_id": pa.array(ids, _I64),
                "cell": pa.array(group["cell"].to_numpy(dtype=np.int64)[order], _I64),
                "keep": pa.array(keep),
            }
        )

    assigned = refine_hot_cells(
        assign_cells(emb, ray.put(cents)), cap=SEMDEDUP_CELL_CAP
    )
    return assigned.groupby("cell").map_groups(dedup_cluster, batch_format="pandas")


# ---------------------------------------------------------------------------
# flagship pages pipeline (synthetic north-rule input; rows-only check)
# ---------------------------------------------------------------------------

_PAGES_ROWS = {"0.001": 500, "0.01": 2000, "0.1": 20000}


def pages_dir_for(sf_dir: str) -> str:
    """Deterministic synthetic pages table scaled to the sf dir.
    ``TEXTPIPE_PAGES_ROWS`` overrides the row count (bench --scaling
    uses a larger table so fixed overheads don't mask scaling)."""
    import os as _os
    import re as _re

    from textpipe_ray.sources.pages import write_pages

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    sf = m.group(1) if m else "0.001"
    rows = int(_os.environ.get("TEXTPIPE_PAGES_ROWS", _PAGES_ROWS.get(sf, 500)))
    num_files = 8 if rows <= 20000 else (32 if rows <= 600000 else 64)
    out = f"/tmp/textpipe_ray_pages/sf{sf}-{rows}"
    write_pages(out, rows, num_files=num_files)
    return out


def q_pages_flagship(sf_dir: str):
    """The full quality-filter pipeline over the synthetic pages table
    (extract → langid → perplexity → rules → scrub → keep/drop).
    ``warc_ts`` is emitted as epoch microseconds so the driver's
    value-hash compares primitive int64s on both sides (datetime dtype
    normalization differs between engines)."""
    from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))
    ds = read_pages(files)

    def ts_to_us(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("warc_ts")
        return batch.set_column(
            i, "warc_ts_us", pc.cast(pc.cast(batch.column("warc_ts"), pa.timestamp("us")), _I64)
        )

    from textpipe_ray.pipelines.flagship import parquet_rows

    return build_pages_pipeline(ds, approx_rows=parquet_rows(files)).map_batches(
        ts_to_us, batch_format="pyarrow"
    )


def q_pages_neardup(sf_dir: str):
    """MinHash-LSH near-dup pairs over the cleaned pages (planted
    dup_near rows are the expected hits; byte-identical templates are
    collapsed by the exact-dedup pre-pass)."""
    from textpipe_ray.stages.dedup import near_dup_after_exact
    from textpipe_ray.stages.text import clean_batch

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    # compute-heavy path (html extract + 128-perm MinHash): block count
    # = CPU count — enough for full map parallelism without the 2×CPU
    # over-split that doubles every all-to-all's coordination cost
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")),
        columns=["url", "html"],
        override_num_blocks=_cpus(),
    )

    def pre(batch: pa.Table) -> pa.Table:
        batch = clean_batch(batch)
        # stable int id from the url tail — one RE2 kernel + cast, no
        # per-row Python (round-4 advice)
        return pa.table(
            {"doc_id": _url_tail_ids(batch), "text": batch.column("clean")}
        )

    # 16 bands × 8 rows: fire probability ≈1 at J≥0.85, ≈2% at the
    # corpus's J≈0.5 same-language background — bands/rows must be tuned
    # to the threshold or candidates explode quadratically
    return near_dup_after_exact(
        ds.map_batches(pre, batch_format="pyarrow"),
        threshold=0.85,
        shingle_size=5,
        num_bands=16,
    )


def q_pages_dedup(sf_dir: str):
    """The dedup FINISHER over pages: exact collapse → LSH pairs →
    union-find clusters → min-id survivor per cluster → deduplicated
    dataset (one row per surviving doc)."""
    import glob as _glob

    from textpipe_ray.stages.dedup import drop_near_dups
    from textpipe_ray.stages.text import clean_batch

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        batch = clean_batch(batch)
        return pa.table(
            {"doc_id": _url_tail_ids(batch), "text": batch.column("clean")}
        )

    out = drop_near_dups(
        ds.map_batches(pre, batch_format="pyarrow"),
        threshold=0.85,
        shingle_size=5,
        num_bands=16,
    )
    return out.select_columns(["doc_id"])


def q_host_stats(sf_dir: str):
    """Per-host quality rollup of the flagship output (the CCNet /
    RefinedWeb domain-filtering primitive: hosts are kept or dropped by
    their aggregate keep-rate, so the per-host table IS the filter
    input).  Scale shape: host is extracted vectorized from ``url``,
    each batch pre-aggregates to one row per host seen (combiner), and
    only the tiny per-batch partials hit the ``groupby`` exchange —
    the shuffle moves O(hosts × blocks) rows, never O(pages).

    Deterministic outputs only (int64 counts/sums + a basis-point
    rate), so the golden-parquet oracle value-checks exactly.  nwords
    is integral (a count stored as float64 upstream), so the int64
    cast is lossless and the sum order-independent."""
    from textpipe_ray.pipelines.flagship import build_pages_pipeline, read_pages

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    from textpipe_ray.pipelines.flagship import parquet_rows

    _files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))
    ds = build_pages_pipeline(read_pages(_files), approx_rows=parquet_rows(_files))

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.extract_regex(batch.column("url"), r"^[a-z]+://(?P<host>[^/]+)")
        host = pc.struct_field(host, "host")
        keep = pc.cast(batch.column("keep"), _I64)
        nwords = pc.cast(batch.column("nwords"), _I64)
        t = pa.table({"host": host, "n_keep": keep, "sum_nwords": nwords})
        g = t.group_by("host").aggregate(
            [("n_keep", "sum"), ("sum_nwords", "sum"), ("n_keep", "count")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "n_pages": pc.cast(g.column("n_keep_count"), _I64),
                "n_keep": g.column("n_keep_sum"),
                "sum_nwords": g.column("sum_nwords_sum"),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_pages"), Sum("n_keep"), Sum("sum_nwords"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_pages)")
        k = batch.column("sum(n_keep)")
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": n,
                "n_keep": k,
                "sum_nwords": batch.column("sum(sum_nwords)"),
                # basis points, exact integer arithmetic on both sides
                "keep_bp": pc.divide(pc.multiply(k, 10000), n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("host")


# C4-style paragraph rules (Raffel et al. 2020, §2.2 heuristics): a
# paragraph survives iff it has ≥ MIN_WORDS words, ends in terminal
# punctuation, and contains no curly brace (code indicator).
PARA_MIN_WORDS = 5
PARA_TERMINAL_RE = r"[.!?]['\"]?$"


def q_paragraph_filter(sf_dir: str):
    """C4-style paragraph-level filtering over the pages table: extract
    text PER PARAGRAPH (block-tag boundaries — a separate extraction
    mode from the byte-identity ``clean`` kernel, which deliberately
    flattens whitespace), drop paragraphs failing the C4 line rules,
    and reassemble each page from its surviving paragraphs.

    Scale shape: entirely row-local (no shuffle) — the HTML parse is
    per-row python (inherent to parsing), but every rule runs as one
    Arrow kernel over the batch's flattened paragraph list, and
    reassembly is one ragged join per page."""
    from textpipe_ray.functions.clean import html_paragraphs_flat

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html"]
    )

    def filt(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        paras, offsets = html_paragraphs_flat(batch.column("html").to_pylist())
        arr = pa.array(paras, pa.string())
        nw = pc.count_substring_regex(arr, r"\S+")
        ok = pc.and_(
            pc.and_(
                pc.greater_equal(nw, PARA_MIN_WORDS),
                pc.match_substring_regex(arr, PARA_TERMINAL_RE),
            ),
            pc.invert(pc.match_substring(arr, "{")),
        )
        okv = ok.to_numpy(zero_copy_only=False)
        n_kept, filtered = [], []
        for i in range(len(urls)):
            lo, hi = offsets[i], offsets[i + 1]
            kept = [paras[j] for j in range(lo, hi) if okv[j]]
            n_kept.append(len(kept))
            filtered.append("\n".join(kept))
        return pa.table(
            {
                "url": batch.column("url"),
                "n_paras": pa.array(
                    [offsets[i + 1] - offsets[i] for i in range(len(urls))], _I64
                ),
                "n_kept_paras": pa.array(n_kept, _I64),
                "filtered_text": pa.array(filtered, pa.string()),
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-span dedup / relational extensions (all oracle-checked)
# ---------------------------------------------------------------------------

_POS_SHIFT = 20  # chunk_idx packs into the low 20 bits of pos
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _part_col(keys: np.ndarray, num_parts: int) -> pa.Array:
    p = ((keys.astype(np.uint64) * _GOLDEN) % np.uint64(num_parts)).astype(np.int32)
    return pa.array(p, pa.int32())


def q_chunk_dedup(sf_dir: str, chunk_words: int = 4):
    """Corpus-level exact duplicated-span removal (the C4 / Lee-et-al
    line-dedup pattern at fixed token-chunk granularity): split every
    document into consecutive ``chunk_words``-token chunks, keep only
    the FIRST occurrence of each distinct chunk corpus-wide (first =
    min (doc_id, chunk_idx)), and reassemble documents from their kept
    chunks.  A document whose every chunk first appeared elsewhere
    disappears entirely.

    Scale shape — ONE explode pass and two exchanges, no driver state
    (round 3: the previous plan consumed the exploded stage from two
    branches, which re-ran the tokenize/explode over the whole corpus
    twice and needed a third union exchange):
      1. winner-keep: exploded chunks hash-partition on the CHUNK text
         (``pos = doc_id·2^20 + chunk_idx`` packs the global order);
         within a partition every occurrence of a given chunk is
         present, so ``pos == min(pos) per chunk`` marks keepers with
         one vectorized group-min — no separate winners table, no
         semi-join back.
      2. reassembly: kept chunks hash-partition on ``doc_id``, sorted
         and joined per partition.
    Tokenization is RE2 ``\\s+`` (ASCII whitespace class) to match the
    DuckDB oracle's ``regexp_extract_all('\\S+')`` exactly — Arrow's
    ``utf8_split_whitespace`` splits on Unicode whitespace (NBSP,
    U+2028) and would tokenize such text differently across engines.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    num_parts = 32

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        empty = pa.table(
            {
                "chunk": pa.array([], pa.string()),
                "pos": pa.array([], _I64),
                "doc_id": pa.array([], _I64),
                "chunk_idx": pa.array([], _I64),
                "__p": pa.array([], pa.int32()),
            }
        )
        if n == 0:
            return empty
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        lists = pc.split_pattern_regex(
            pc.cast(batch.column("text"), pa.string()), pattern=r"\s+"
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        counts = np.asarray(lists.value_lengths(), dtype=np.int64)
        row_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        # regex split emits empty edge tokens ('' for leading /
        # trailing space) that regexp_extract_all('\\S+') never does —
        # drop them so both engines see the same token stream
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        keep &= ~np.asarray(pc.is_null(flat).to_numpy(zero_copy_only=False))
        row_rep = row_rep[keep]
        if len(row_rep) == 0:
            return empty
        toks = flat.filter(pa.array(keep)).to_pylist()
        per_row = np.bincount(row_rep, minlength=n)
        starts = np.concatenate(([0], np.cumsum(per_row)))[:-1]
        tok_idx = np.arange(len(row_rep), dtype=np.int64) - np.repeat(starts, per_row)
        chunk_idx = tok_idx // chunk_words
        chg = np.ones(len(row_rep), dtype=bool)
        chg[1:] = (row_rep[1:] != row_rep[:-1]) | (chunk_idx[1:] != chunk_idx[:-1])
        cstart = np.flatnonzero(chg)
        cend = np.append(cstart[1:], len(row_rep))
        # one python join per CHUNK (≈ n_tokens/chunk_words) — same
        # object-level cost class as the findall in q_token_freq
        chunks = [" ".join(toks[s:e]) for s, e in zip(cstart, cend)]
        cdoc = doc[row_rep[cstart]]
        cidx = chunk_idx[cstart]
        if cidx.max() >= (1 << _POS_SHIFT):
            raise ValueError("chunk_idx overflows the 2^20 pos packing")
        pos = (cdoc << _POS_SHIFT) + cidx
        carr = pa.array(chunks, pa.string())
        # partition on a vectorized 64-bit hash of the chunk TEXT so
        # every occurrence of a chunk lands in the same partition;
        # keeping is then a partition-local group-min (hash collisions
        # only co-locate extra rows — the group key is still the string)
        return pa.table(
            {
                "chunk": carr,
                "pos": pa.array(pos, _I64),
                "doc_id": pa.array(cdoc, _I64),
                "chunk_idx": pa.array(cidx, _I64),
                "__p": pa.array(strhash_part_ids(carr, num_parts), pa.int32()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    import pandas as pd

    def mark(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "chunk_idx": pd.Series(dtype="int64"),
                 "chunk": pd.Series(dtype="object")}
            )
        kept = part[part["pos"] == part.groupby("chunk")["pos"].transform("min")]
        return kept[["doc_id", "chunk_idx", "chunk"]]

    kept = exploded.groupby("__p").map_groups(mark, batch_format="pandas")

    def add_doc_part(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("doc_id"), dtype=np.int64)
        return b.append_column("__p", _part_col(d, num_parts))

    def reassemble(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["doc_id", "chunk_idx"], kind="mergesort")
        out = (
            g.groupby("doc_id", sort=True)
            .agg(dedup_text=("chunk", " ".join), n_kept=("chunk", "size"))
            .reset_index()
        )
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_kept"] = out["n_kept"].astype("int64")
        return out[["doc_id", "dedup_text", "n_kept"]]

    return (
        kept.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(reassemble, batch_format="pandas")
    )


def q_anti_join(sf_dir: str):
    """Distributed anti-join: customers with NO urgent-priority order.
    Scale shape: the order side is filtered + key-deduped per batch
    (combiner), both sides tagged and unioned, hash-partitioned on the
    key, and differenced with one vectorized ``np.isin`` per partition
    — a shuffle anti-join whose build side never funnels through the
    driver (contrast broadcast ``q_segment_orders``, which is the
    small-dimension case)."""
    import pandas as pd

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    num_parts = 32

    def tag_cust(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": pc.cast(b.column("c_custkey"), _I64),
                "c_name": b.column("c_name"),
                "c_acctbal": pc.cast(b.column("c_acctbal"), _F64),
                "is_cust": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        k = pc.unique(pc.cast(pc.filter(b.column("o_custkey"), m), _I64))
        n = len(k)
        return pa.table(
            {
                "key": k,
                "c_name": pa.nulls(n, pa.string()),
                "c_acctbal": pa.nulls(n, _F64),
                "is_cust": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("key"), dtype=np.int64)
        return b.append_column("__p", _part_col(k, num_parts))

    both = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
    )

    def anti(part: pd.DataFrame) -> pd.DataFrame:
        c = part[part["is_cust"]]
        have = part.loc[~part["is_cust"], "key"].to_numpy()
        out = c[~np.isin(c["key"].to_numpy(), have)]
        return pd.DataFrame(
            {
                "c_custkey": out["key"].astype("int64"),
                "c_name": out["c_name"].astype(str),
                "c_acctbal": out["c_acctbal"].astype("float64"),
            }
        )

    return both.groupby("__p").map_groups(anti, batch_format="pandas").sort("c_custkey")


RANGE_JOIN_WINDOW_US = 86_400_000_000  # 24 h


def q_range_join(sf_dir: str):
    """Banded time-range join (an operator Ray Data lacks natively):
    for every 'click' event, count the same user's 'view' events inside
    the 24 h window ``[ts - W, ts]`` — zeros included (LEFT-join
    semantics).

    Scale shape: probes replicate into the (exactly two) W-wide time
    bands their window overlaps; builds land in their own band; each
    (user, band) group co-locates via a coarse hash partition, where
    counts resolve as a difference of two vectorized ``merge_asof``
    cumcount lookups (#builds ≤ t minus #builds ≤ t−W−1µs).  A final
    small ``groupby(event_id).Sum`` collapses the two replicas.  No
    all-pairs expansion, no driver state; skew is bounded by the
    hottest (user, band), not by user volume."""
    import pandas as pd

    W = RANGE_JOIN_WINDOW_US
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    num_parts = 32

    def band(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        ts = np.asarray(pc.cast(batch.column("ts"), _I64), dtype=np.int64)
        uid = np.asarray(pc.cast(batch.column("user_id"), _I64), dtype=np.int64)
        eid = np.asarray(pc.cast(batch.column("event_id"), _I64), dtype=np.int64)
        is_probe = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        is_build = pc.equal(et, "view").to_numpy(zero_copy_only=False)
        bucket = ts // W
        # builds: own band once; probes: bands b-1 and b (window spans 2)
        b_u, b_t, b_b = uid[is_build], ts[is_build], bucket[is_build]
        p_u, p_t, p_b, p_e = uid[is_probe], ts[is_probe], bucket[is_probe], eid[is_probe]
        out_u = np.concatenate([b_u, p_u, p_u])
        out_t = np.concatenate([b_t, p_t, p_t])
        out_b = np.concatenate([b_b, p_b - 1, p_b])
        out_e = np.concatenate([np.full(len(b_u), -1, dtype=np.int64), p_e, p_e])
        out_p = np.concatenate(
            [np.zeros(len(b_u), dtype=bool), np.ones(2 * len(p_u), dtype=bool)]
        )
        mixed = out_u.astype(np.uint64) * _GOLDEN + out_b.astype(np.uint64)
        return pa.table(
            {
                "user_id": pa.array(out_u, _I64),
                "ts_us": pa.array(out_t, _I64),
                "bucket": pa.array(out_b, _I64),
                "event_id": pa.array(out_e, _I64),
                "is_probe": pa.array(out_p),
                "__p": _part_col(mixed.astype(np.int64), num_parts),
            }
        )

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part[part["is_probe"]]
        if p.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "partial": pd.Series([], dtype="int64"),
                }
            )
        b = part[~part["is_probe"]]
        if b.empty:
            return pd.DataFrame(
                {
                    "event_id": p["event_id"].astype("int64"),
                    "partial": np.zeros(len(p), dtype=np.int64),
                }
            )
        b = b.sort_values(["user_id", "bucket", "ts_us"], kind="mergesort")
        b = b.assign(cc=b.groupby(["user_id", "bucket"]).cumcount() + 1)
        bb = b[["ts_us", "user_id", "bucket", "cc"]].sort_values(
            "ts_us", kind="mergesort"
        )
        ps = p[["ts_us", "user_id", "bucket", "event_id"]].sort_values(
            "ts_us", kind="mergesort"
        )
        hi = pd.merge_asof(
            ps, bb, on="ts_us", by=["user_id", "bucket"], direction="backward"
        )["cc"].fillna(0)
        # ts−W−1 preserves the probes' ts sort order (monotone shift),
        # so one sorted frame serves both lookups
        lo = pd.merge_asof(
            ps.assign(ts_us=ps["ts_us"] - W - 1),
            bb,
            on="ts_us",
            by=["user_id", "bucket"],
            direction="backward",
        )["cc"].fillna(0)
        return pd.DataFrame(
            {
                "event_id": ps["event_id"].astype("int64").to_numpy(),
                "partial": (hi - lo).astype("int64").to_numpy(),
            }
        )

    counted = (
        ev.map_batches(band, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(count_part, batch_format="pandas")
    )

    # collapse the two replicas: coarse hash partition on event_id +
    # one vectorized pandas groupby-sum per partition.  (A native
    # .aggregate(Sum) here measured 80s of remote wall for 40k rows at
    # sf0.1 — the sort-aggregate's per-reducer overhead dwarfs the work;
    # this shape is the same cheap Sort+map_groups the first exchange
    # uses.)
    def add_p2(batch: pa.Table) -> pa.Table:
        e = np.asarray(batch.column("event_id"), dtype=np.int64)
        return batch.append_column("__p2", _part_col(e, 16))

    def sum_partials(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("event_id", sort=False)["partial"].sum().reset_index(name="n_views")
        return g[["event_id", "n_views"]].astype("int64")

    return (
        counted.map_batches(add_p2, batch_format="pyarrow")
        .groupby("__p2")
        .map_groups(sum_partials, batch_format="pandas")
    )


def q_token_count(sf_dir: str):
    """BPE-ish token budget per document: one RE2 scan with a
    GPT-2-style pretokenizer pattern (contractions / letter runs /
    digit runs / symbol runs with optional leading space) — the pattern
    is lookahead-free, so Arrow's ``count_substring_regex`` and
    DuckDB's ``regexp_extract_all`` count identically."""
    from textpipe_ray.functions.tokenize import BPE_PATTERN

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch.column("text"), pattern=BPE_PATTERN), _I64
        )
        return pa.table(
            {"doc_id": pc.cast(batch.column("doc_id"), _I64), "n_tokens": n}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_distinct_tokens(sf_dir: str):
    """Per-language EXACT distinct-token and total-occurrence counts:
    per-batch partial ``np.unique`` combiner (one findall over the
    '\\n'-joined texts per language present in the batch) →
    ``groupby(lang, token).Sum`` → per-lang ``Sum`` over ones/counts.
    Both exchanges carry pre-reduced (lang, token) rows, never one row
    per occurrence."""
    from textpipe_ray.functions.quality import RE2_PATTERNS

    import regex as _re

    creg = _re.compile(RE2_PATTERNS["nwords"])
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        texts = np.asarray(
            pc.utf8_lower(batch.column("text")).to_pylist(), dtype=object
        )
        uniq_langs, inv = np.unique(langs, return_inverse=True)
        out_lang: list[str] = []
        out_tok: list[str] = []
        out_cnt: list[np.ndarray] = []
        for li, lang in enumerate(uniq_langs):
            joined = "\n".join(t or "" for t in texts[inv == li])
            toks = creg.findall(joined)
            if not toks:
                continue
            u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            out_lang.extend([str(lang)] * len(u))
            out_tok.extend(u.tolist())
            out_cnt.append(c.astype(np.int64))
        cnt = np.concatenate(out_cnt) if out_cnt else np.array([], dtype=np.int64)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "token": pa.array(out_tok, pa.string()),
                "partial": pa.array(cnt, _I64),
            }
        )

    per_token = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("partial", alias_name="cnt"))
    )

    def shrink(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b.column("lang"),
                "one": pa.array(np.ones(len(b), dtype=np.int64), _I64),
                "cnt": b.column("cnt"),
            }
        )

    return (
        per_token.map_batches(shrink, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one", alias_name="n_distinct"), Sum("cnt", alias_name="n_total")
        )
        .sort("lang")
    )


def q_quality_score(sf_dir: str):
    """Learned quality classifier (models/quality_weights.json): one
    linear dot product over the vectorized quality features — the
    fasttext-style scale path for quality filtering (one model score
    per doc instead of N rule comparisons).  Because the model is
    linear and both engines fold the SAME left-nested float64 chain
    (functions/quality_score.py), the score doubles are bit-identical
    to the DuckDB oracle — a fully value-checked model-inference op."""
    from textpipe_ray.functions.quality_score import load_weights, score_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    weights = load_weights()

    def f(batch: pa.Table) -> pa.Table:
        b = quality_batch(batch, text_col="text")
        score = score_batch(b, weights)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "score": score,
                "quality_label": pc.greater(score, pa.scalar(0.0, _F64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# fixed micro-score threshold grid for the classifier PR sweep
PR_THR_MIN_MICRO = -2_000_000
PR_THR_MAX_MICRO = 2_000_001
PR_THR_STEP_MICRO = 250_000

# bottom-k quantile sketch: sample size and reported quantiles
SKETCH_SAMPLE_K = 256
SKETCH_QUANTILES = ((25, 100), (50, 100), (75, 100), (90, 100))


def _quality_micro(batch: pa.Table, weights) -> np.ndarray:
    """floor(quality_score · 1e6) as int64 — the ONE quantization the
    SQL oracles mirror as ``CAST(floor((score) * 1e6) AS BIGINT)``.
    Shared by q_quantile_sketch / q_quality_percentile /
    q_lang_quantile_norm so the three quantile-family queries cannot
    drift apart from the oracle expression one copy at a time."""
    from textpipe_ray.functions.quality_score import score_batch

    b = quality_batch(batch, text_col="text")
    s = score_batch(b, weights)
    return np.floor(np.asarray(s, dtype=np.float64) * 1e6).astype(np.int64)


def q_quantile_sketch(sf_dir: str):
    """Per-language quantiles of the learned quality score via a
    DETERMINISTIC bottom-k sample sketch — the scale path for
    distribution stats over HIGH-CARDINALITY values, where the exact
    value-histogram idiom (q_len_quantiles) degenerates to one exchange
    row per document: each batch keeps the ≤K rows whose
    ``md5(doc_id)`` keys are smallest per language (constant-size
    partial, the HLL exchange idiom), the per-lang merge keeps the K
    smallest overall — an order-independent, mergeable uniform sample
    of exactly the same K documents on any engine — and quantiles are
    read off the sample with the exact-rational ``quantile_disc`` index
    rule.  Keying the sample on document IDENTITY (never the value)
    keeps it unbiased for the score distribution; md5 as the key means
    DuckDB's own ``md5()`` replays the identical sample, so the sketch
    is fully SQL-value-checkable (a KLL-style sketch is not — its
    compaction depends on merge order).  Rank error ~1/sqrt(K); a
    language with ≤K documents samples the whole population and the
    quantiles are EXACT (asserted in tests)."""
    from textpipe_ray.functions.quality_score import load_weights
    from textpipe_ray.functions.strhash import md5_hex

    weights = load_weights()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    K = SKETCH_SAMPLE_K

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        micro = _quality_micro(batch, weights)
        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pylist(),
                "key": md5_hex(pc.cast(batch.column("doc_id"), pa.string())),
                "doc_id": np.asarray(batch.column("doc_id"), dtype=np.int64),
                "score_micro": micro,
            }
        )
        df = df.sort_values(["lang", "key", "doc_id"]).groupby("lang", sort=False).head(K)
        return pa.table(
            {
                "lang": pa.array(df["lang"], pa.string()),
                "key": pa.array(df["key"], pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), _I64),
                "score_micro": pa.array(df["score_micro"].to_numpy(), _I64),
            }
        )

    def merge(g):
        import pandas as pd

        g = g.sort_values(["key", "doc_id"]).head(K)
        v = np.sort(g["score_micro"].to_numpy())
        n = len(v)
        out = {"lang": [g["lang"].iloc[0]], "n_sample": [np.int64(n)]}
        for num, den in SKETCH_QUANTILES:
            idx = max(0, -(-(num * n) // den) - 1)  # quantile_disc: ceil(q*n)-1
            out[f"p{num * 100 // den}"] = [np.int64(v[idx])]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


def q_filter_pr_curve(sf_dir: str):
    """Threshold-sweep confusion table for the learned quality
    classifier against the rule-set teacher labels — the calibration
    operator that picks the production keep-threshold (FineWeb / DCLM
    tune their classifier cut exactly this way).  For every threshold
    on a fixed micro grid: tp/fp/fn/tn of ``score_micro >= thr`` vs the
    rule ``keep``.

    Scale shape: row-local scoring (the ``q_quality_score`` kernel) +
    one vectorized (T × batch) confusion partial per batch — the
    exchange moves n_thresholds × blocks int rows, never documents;
    one tiny groupby sum finishes.  Counts stay int64 so the DuckDB
    oracle is bit-exact; precision/recall floats are consumer-side."""
    from textpipe_ray.functions.quality_score import load_weights, score_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    weights = load_weights()
    thrs = np.arange(
        PR_THR_MIN_MICRO, PR_THR_MAX_MICRO, PR_THR_STEP_MICRO, dtype=np.int64
    )

    def partial(batch: pa.Table) -> pa.Table:
        b = quality_batch(batch, text_col="text")
        score = np.asarray(score_batch(b, weights), dtype=np.float64)
        sm = np.floor(score * 1e6).astype(np.int64)
        y = np.asarray(b.column("keep"), dtype=bool)
        pred = sm[None, :] >= thrs[:, None]  # (T, n)
        return pa.table(
            {
                "thr_micro": pa.array(thrs, _I64),
                "tp": pa.array((pred & y[None, :]).sum(axis=1).astype(np.int64), _I64),
                "fp": pa.array((pred & ~y[None, :]).sum(axis=1).astype(np.int64), _I64),
                "fn": pa.array((~pred & y[None, :]).sum(axis=1).astype(np.int64), _I64),
                "tn": pa.array((~pred & ~y[None, :]).sum(axis=1).astype(np.int64), _I64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("thr_micro")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
            Sum("tn", alias_name="tn"),
        )
    )


def q_dup_stats(sf_dir: str):
    """Per-source duplication profile (corpus-health dashboard query):
    exact distinct-content counts via two pre-reduced exchanges —
    per-batch (source, md5) partial dedup, ``groupby(source, hash)``
    to finish the distinct, then a per-source count/sum.  No row ever
    carries text past the first map; no driver state."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        src = batch.column("source").to_pylist()
        hashes = [
            hashlib.md5((t or "").encode("utf8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        df = pd.DataFrame({"source": src, "h": hashes})
        g = df.groupby(["source", "h"], sort=False).size().reset_index(name="partial")
        return pa.Table.from_pandas(g, preserve_index=False)

    per_hash = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Sum("partial", alias_name="cnt"))
    )

    def shrink(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("source"),
                "one": pa.array(np.ones(len(b), dtype=np.int64), _I64),
                "cnt": pc.cast(b.column("cnt"), _I64),
            }
        )

    return (
        per_hash.map_batches(shrink, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("one", alias_name="n_unique"), Sum("cnt", alias_name="n_docs"))
        .sort("source")
    )


def q_embedding_centroid(sf_dir: str):
    """Per-label centroids in fixed-point: each element is quantized to
    int64 micros BEFORE aggregation, so the distributed sum is exact
    and order-independent (float sums are not associative; integer sums
    are) — the same trick q_events_window uses for values.  Per-batch
    partial sums pre-reduce to (labels × dims) rows, then one small
    groupby finishes.  The mean is an exact int/int double division,
    identical on both engines."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "label": pa.array([], _I64),
                    "dim": pa.array([], _I64),
                    "sum_q": pa.array([], _I64),
                    "n": pa.array([], _I64),
                }
            )
        labels = np.asarray(batch.column("label"), dtype=np.int64)
        lst = batch.column("embedding").combine_chunks()
        emb = np.asarray(lst.values, dtype=np.float64).reshape(len(batch), -1)
        q = np.floor(emb * 1e6).astype(np.int64)
        dims = q.shape[1]
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dims), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dims), _I64),
                "dim": pa.array(np.tile(np.arange(1, dims + 1, dtype=np.int64), len(uniq)), _I64),
                "sum_q": pa.array(sums.ravel(), _I64),
                "n": pa.array(np.repeat(counts, dims), _I64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        sum_q = pc.cast(b.column("sum_q"), _I64)
        n = pc.cast(b.column("n"), _I64)
        return pa.table(
            {
                "label": pc.cast(b.column("label"), _I64),
                "dim": pc.cast(b.column("dim"), _I64),
                "n": n,
                "sum_q": sum_q,
                "centroid_micro": pc.divide(pc.cast(sum_q, _F64), pc.cast(n, _F64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["label", "dim"])


DOMAIN_MIX_CAP = 30


def q_domain_mix(sf_dir: str):
    """Deterministic mixture rebalancing: cap every source (domain) at
    ~DOMAIN_MIX_CAP docs by hash-thresholding — two passes: a tiny
    ``groupby(source).count()`` whose result is broadcast via
    ``ray.put`` (sorted-key + searchsorted lookup, no shuffle of the
    big side), then a pure per-batch filter ``md5_bucket < rate``.
    Integer-millis rate arithmetic matches the oracle exactly.  At
    web scale (millions of domains) the broadcast side becomes a
    co-partitioned join on source — stages/joins.py — but domain
    counts up to ~10M rows are comfortably one object-store put."""
    import hashlib as _hl

    rows = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    src = np.asarray([r["source"] for r in rows], dtype=object)
    n = np.asarray([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(src)
    src_sorted, n_sorted = src[order], n[order]
    rate_millis = np.minimum(1000, (DOMAIN_MIX_CAP * 1000) // n_sorted)
    ref = ray.put((src_sorted, rate_millis))

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        src_s, rates = ray.get(ref)
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        idx = np.searchsorted(src_s, s)
        buckets = np.array(
            [
                int(_hl.md5((t or "").encode("utf8")).hexdigest()[:8], 16) % 1000
                for t in batch.column("text").to_pylist()
            ],
            dtype=np.int64,
        )
        keep = buckets < rates[idx]
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(out.column("doc_id"), _I64),
                "source": out.column("source"),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def q_topk_per_group(sf_dir: str, k: int = 3):
    """Top-k documents per language by (n_chars DESC, doc_id ASC):
    per-batch partial top-k (combiner — at most k rows per language
    leave any batch), then a final per-language top-k.  The final
    ``map_groups`` dispatch is bounded by the number of languages, not
    by corpus size."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["lang", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("lang", sort=False).head(k)

    return (
        ds.map_batches(topk, batch_format="pandas")
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# training-mix shaping / corpus-level boilerplate removal (round-2 additions)
# ---------------------------------------------------------------------------

LANG_TEMPERATURE_T = 2.0  # mT5-style temperature; T=2 → keep-rate = sqrt


def q_lang_temperature(sf_dir: str):
    """Temperature-based language-mix rebalancing (mT5 §3.1 idea):
    downsample each language toward p_l ∝ n_l^(1/T) by keeping every
    document with probability ``q_l = (n_min / n_l)^(1 - 1/T)``; with
    the default T=2 that is ``sqrt(n_min / n_l)``.

    ``sqrt`` (unlike ``pow``) is CORRECTLY ROUNDED under IEEE-754, so
    numpy and DuckDB compute bit-identical doubles for
    ``floor(1000 * sqrt(n_min/n_l))`` — the integer-millis rate cannot
    straddle engines the way a ``pow``-based rate could.

    Scale shape: one tiny ``groupby(lang).count()`` (rows = #languages)
    broadcast via ``ray.put``; selection is then a pure per-batch
    deterministic hash-threshold filter (md5 bucket of the text), the
    same idiom as :func:`q_domain_mix` — no shuffle of the corpus."""
    rows = (
        _read(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    langs = np.asarray([r["lang"] for r in rows], dtype=object)
    n = np.asarray([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(langs)
    langs_sorted, n_sorted = langs[order], n[order]
    n_min = int(n_sorted.min())
    # floor(1000 * sqrt(n_min/n_l)) in exactly the op order the SQL uses
    rate_millis = np.minimum(
        1000,
        np.floor(1000.0 * np.sqrt(np.float64(n_min) / n_sorted.astype(np.float64))).astype(
            np.int64
        ),
    )
    ref = ray.put((langs_sorted, rate_millis))

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        lang_s, rates = ray.get(ref)
        lg = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        idx = np.searchsorted(lang_s, lg)
        buckets = np.array(
            [
                int(hashlib.md5((t or "").encode("utf8")).hexdigest()[:8], 16) % 1000
                for t in batch.column("text").to_pylist()
            ],
            dtype=np.int64,
        )
        out = batch.filter(pa.array(buckets < rates[idx]))
        return pa.table(
            {
                "doc_id": pc.cast(out.column("doc_id"), _I64),
                "lang": out.column("lang"),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


BOILER_MAX_OCCURRENCES = 1  # paragraphs occurring more often are removed everywhere
BOILER_MIN_WORDS = 5  # shorter fragments never count as boilerplate (C4-style guard)


def boiler_word_counts(paras: list[str]) -> np.ndarray:
    """The ONE word-count definition for paragraph eligibility, shared
    by q_boilerplate_dedup / q_paragraph_filter and their tests: RE2
    ``\\S+`` (ASCII whitespace class). Python ``str.split()`` splits on
    Unicode whitespace too (NBSP, U+2028), so a test recomputing
    eligibility with it would flake against the pipeline on such text —
    both sides must call this."""
    if not paras:
        return np.zeros(0, dtype=np.int64)
    return np.asarray(
        pc.count_substring_regex(pa.array(paras, pa.string()), r"\S+"),
        dtype=np.int64,
    )


def q_boilerplate_dedup(sf_dir: str):
    """Corpus-wide duplicate-paragraph removal over the pages table
    (RefinedWeb/C4-style boilerplate scrub): any paragraph whose exact
    text occurs more than ``BOILER_MAX_OCCURRENCES`` times ANYWHERE in
    the corpus is dropped from every page, and pages are reassembled
    from their surviving paragraphs.  Fragments shorter than
    ``BOILER_MIN_WORDS`` words (stray list items, language names,
    symbols) are exempt — without the guard they dominate the banned
    set and gut nearly every page.

    Scale shape — two streaming passes over pages, no O(corpus)
    driver state:

    1. count pass: paragraphs hash to 64-bit ``blake2b`` keys, counts
       pre-reduce per batch (combiner), one small ``groupby(hash)`` sum
       whose exchange carries one row per DISTINCT paragraph per block.
       The banned set (hashes with count > threshold) is bounded by
       corpus_paragraphs / threshold and in practice by the boilerplate
       vocabulary — ~10^6-10^8 hashes at web scale, a few hundred MB of
       int64s: broadcast once via ``ray.put`` as a sorted array (the
       :func:`q_contamination` idiom).  Past that bound the filter
       becomes a co-partitioned join on the hash (stages/joins.py).
    2. scrub pass: re-extract paragraphs (recompute beats shuffling
       paragraph text), drop members of the banned set with a
       vectorized ``np.isin`` against the sorted array, reassemble
       per page.  Entirely row-local.
    """
    from textpipe_ray.functions.clean import html_paragraphs_flat

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))

    def _para_hashes(htmls: list) -> tuple[np.ndarray, np.ndarray, list[int], list[str]]:
        paras, offsets = html_paragraphs_flat(htmls)
        hashes = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(p.encode("utf8"), digest_size=8).digest(), "big"
                )
                >> 1  # keep int64-positive; 63 bits is ample
                for p in paras
            ],
            dtype=np.int64,
        )
        eligible = boiler_word_counts(paras) >= BOILER_MIN_WORDS
        return hashes, eligible, offsets, paras

    def count_partial(batch: pa.Table) -> pa.Table:
        hashes, eligible, _, _ = _para_hashes(batch.column("html").to_pylist())
        uniq, cnt = np.unique(hashes[eligible], return_counts=True)
        return pa.table(
            {"h": pa.array(uniq, _I64), "cnt": pa.array(cnt.astype(np.int64), _I64)}
        )

    banned_rows = (
        ray.data.read_parquet(files, columns=["html"], override_num_blocks=_cpus())
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr=f"cnt > {BOILER_MAX_OCCURRENCES}")
        .take_all()
    )
    banned = np.sort(np.asarray([r["h"] for r in banned_rows], dtype=np.int64))
    ref = ray.put(banned)

    def scrub(batch: pa.Table) -> pa.Table:
        banned_sorted = ray.get(ref)
        urls = batch.column("url").to_pylist()
        hashes, eligible, offsets, paras = _para_hashes(batch.column("html").to_pylist())
        bad = (
            np.isin(hashes, banned_sorted) & eligible
            if len(hashes)
            else np.zeros(0, dtype=bool)
        )
        n_kept, out_text = [], []
        for i in range(len(urls)):
            lo, hi = offsets[i], offsets[i + 1]
            kept = [paras[j] for j in range(lo, hi) if not bad[j]]
            n_kept.append(len(kept))
            out_text.append("\n".join(kept))
        return pa.table(
            {
                "url": batch.column("url"),
                "n_paras": pa.array(
                    [offsets[i + 1] - offsets[i] for i in range(len(urls))], _I64
                ),
                "n_kept_paras": pa.array(n_kept, _I64),
                "boiler_free_text": pa.array(out_text, pa.string()),
            }
        )

    return ray.data.read_parquet(
        files, columns=["url", "html"], override_num_blocks=_cpus()
    ).map_batches(scrub, batch_format="pyarrow")


PPL_BUCKET_QUANTILES = [(1, 3), (2, 3)]  # CCNet head/middle/tail tertiles


def q_ppl_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (head / middle / tail) of the
    documents table, per language: score every document with the
    char-LM perplexity stage, quantize to integer CENTI-perplexity
    (``floor(ppl * 100)``), compute per-language tertile thresholds,
    and label each document's bucket.

    Scale shape: the threshold pass is the :func:`q_len_quantiles`
    value-histogram idiom — the exchange carries one row per distinct
    ``(lang, ppl_centi)``, and the centi quantization BOUNDS that
    cardinality by the perplexity range × 100 (a few thousand values)
    regardless of corpus size, so no global sort and no O(docs)
    driver state ever appears.  Thresholds (rows = #langs) broadcast
    via ``ray.put``; bucket assignment is a pure integer per-batch
    compare.  All arithmetic is integer (quantile index via exact
    rational ``ceil(q*n)-1``), so output is deterministic and
    golden-checkable."""
    from textpipe_ray.stages.actors import PerplexityStage

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def pre(batch: pa.Table) -> pa.Table:
        return batch.append_column("clean", batch.column("text"))

    scored = (
        ds.map_batches(pre, batch_format="pyarrow")
        .map_batches(PerplexityStage, batch_format="pyarrow", batch_size=1024, concurrency=2)
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b.column("doc_id"), _I64),
                    "lang": b.column("lang"),
                    "ppl_centi": pa.array(
                        np.floor(
                            np.asarray(b.column("perplexity"), dtype=np.float64) * 100.0
                        ).astype(np.int64),
                        _I64,
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # scored once, read twice (thresholds + labels)
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pylist(),
                "ppl_centi": np.asarray(batch.column("ppl_centi"), dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "ppl_centi"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "ppl_centi": pa.array(g["ppl_centi"].astype("int64"), _I64),
                "cnt": pa.array(g["cnt"].astype("int64"), _I64),
            }
        )

    hist = (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "ppl_centi"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # tiny: one row per distinct (lang, centi value)
    )
    lang_list, t_lo, t_hi = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("ppl_centi")
        vals = g["ppl_centi"].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy())
        n = int(cum[-1])
        ts = []
        for num, den in PPL_BUCKET_QUANTILES:
            idx = max(0, -(-(num * n) // den) - 1)  # exact ceil(q*n)-1
            ts.append(int(vals[np.searchsorted(cum, idx + 1)]))
        lang_list.append(lang)
        t_lo.append(ts[0])
        t_hi.append(ts[1])
    lang_arr = np.asarray(lang_list, dtype=object)
    order = np.argsort(lang_arr)
    ref = ray.put(
        (
            lang_arr[order],
            np.asarray(t_lo, dtype=np.int64)[order],
            np.asarray(t_hi, dtype=np.int64)[order],
        )
    )

    def label(batch: pa.Table) -> pa.Table:
        lang_s, lo, hi = ray.get(ref)
        lg = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        idx = np.searchsorted(lang_s, lg)
        v = np.asarray(batch.column("ppl_centi"), dtype=np.int64)
        bucket = np.where(v <= lo[idx], "head", np.where(v <= hi[idx], "middle", "tail"))
        return batch.append_column("bucket", pa.array(bucket.tolist(), pa.string()))

    return scored.map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# semi-structured (JSON) extraction
# ---------------------------------------------------------------------------


def q_json_extract(sf_dir: str):
    """Semi-structured field extraction: pull the integer field ``$.k``
    out of the events table's JSON ``props`` column and roll it up per
    event type (the Spark ``get_json_object`` / ``json_tuple`` analog;
    the reference has no JSON surface — web-pipeline metadata sidecars
    motivate it).

    Scale shape: the parse is polars' Rust JSON-path kernel over the
    whole column (no per-row Python), and the per-batch ``group_by`` is
    the partial-aggregate combiner — the shuffle moves
    O(event_types x blocks) partial rows, never O(events).  Missing or
    non-integer ``k`` becomes null: counted out of ``n_with_k`` and
    ignored by the null-skipping Sum/Min/Max on both engines."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        part = (
            df.with_columns(
                pl.col("props")
                .str.json_path_match("$.k")
                .cast(pl.Int64, strict=False)
                .alias("k")
            )
            .group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("k").count().cast(pl.Int64).alias("n_with_k"),
                pl.col("k").sum().cast(pl.Int64).alias("sum_k"),
                pl.col("k").min().cast(pl.Int64).alias("min_k"),
                pl.col("k").max().cast(pl.Int64).alias("max_k"),
            )
        )
        out = part.to_arrow()
        return out.cast(
            pa.schema(
                [("event_type", pa.string())]
                + [(c, pa.int64()) for c in ("n_events", "n_with_k", "sum_k", "min_k", "max_k")]
            )
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_with_k", alias_name="n_with_k"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in ("n_events", "n_with_k", "sum_k", "min_k", "max_k"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow").sort("event_type")


# ---------------------------------------------------------------------------
# deterministic training-shard shuffle
# ---------------------------------------------------------------------------

N_SHUFFLE_SHARDS = 8


def q_shuffle_shards(sf_dir: str):
    """Deterministic global shuffle into training shards: every document
    gets a seed-stable shard (``md5('shard:'||doc_id) % N``) and a
    position inside that shard (rank of ``md5('pos:'||doc_id)``), so
    the training-data order is a pure function of the corpus — fully
    reproducible across reruns and resumable mid-epoch, unlike
    ``random_shuffle``.

    Scale shape: shard assignment is a row-local map; the only exchange
    is the per-shard grouping, and within-shard ranking is one sort per
    shard — with shards sized to ~1 block (thousands of shards at real
    scale, not 8) the per-group sort is embarrassingly parallel and no
    global sort exists.  md5 keys keep DuckDB parity; at 100 TB the
    same plan runs with any salted 64-bit vectorized hash."""
    import hashlib as _hl

    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        shard = [
            int(_hl.md5(f"shard:{i}".encode("utf8")).hexdigest()[:8], 16)
            % N_SHUFFLE_SHARDS
            for i in ids
        ]
        posk = [_hl.md5(f"pos:{i}".encode("utf8")).hexdigest() for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "shard_id": pa.array(shard, _I64),
                "pos_key": pa.array(posk, pa.string()),
            }
        )

    def enumerate_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["pos_key", "doc_id"], kind="mergesort").reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g[["shard_id", "pos", "doc_id"]]

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(enumerate_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# URL / host blocklist filtering
# ---------------------------------------------------------------------------


def q_url_filter(sf_dir: str):
    """UT1-style URL blocklist filtering over the pages table (the
    CCNet / RefinedWeb pre-filter that runs BEFORE any content is
    parsed: block by host, block by url pattern).  The blocklist is a
    committed data artifact (``models/url_blocklist.json``) so a real
    list (e.g. the UT1 categories) drops in without code changes.

    Scale shape: the blocklist is tiny and broadcast once via
    ``ray.put``; every check is row-local and vectorized (Arrow regex
    host extraction, sorted-array ``searchsorted`` host membership,
    one RE2 pattern scan) — no shuffle anywhere, and only ``url``
    is ever read (a pre-filter must not pay for ``html``)."""
    import glob as _glob

    blocked_hosts, pattern = load_url_blocklist()
    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url"]
    )
    ref = ray.put((blocked_hosts, pattern))

    def flag(batch: pa.Table) -> pa.Table:
        bh, pat = ray.get(ref)
        host, blocked_host, blocked_pat = url_block_parts(batch, bh, pat)
        keep = ~(blocked_host | blocked_pat)
        return pa.table(
            {
                "url": batch.column("url"),
                "host": host,
                "blocked_host": pa.array(blocked_host.tolist(), pa.bool_()),
                "blocked_pattern": pa.array(blocked_pat.tolist(), pa.bool_()),
                "keep": pa.array(keep.tolist(), pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def load_robots_rules() -> dict:
    """→ {host_or_star: {"allow": [prefixes], "disallow": [prefixes]}}
    from the committed artifact ``models/robots_rules.json`` (in
    production: rules parsed from per-host robots.txt fetches)."""
    import json as _json
    from pathlib import Path as _Path

    spec = _json.loads(
        (_Path(__file__).resolve().parents[2] / "models" / "robots_rules.json").read_text()
    )
    return spec["groups"]


def _robots_rule_matcher(pattern: str):
    """RFC 9309 rule pattern → ``("prefix", pattern)`` for plain
    octet prefixes or ``("regex", anchored_re)`` for patterns using
    ``*`` wildcards / a trailing ``$`` end anchor (RFC 9309 §2.2.3).
    Returns ``None`` for the empty pattern: an empty ``Disallow:``
    means allow-all per the RFC and an empty ``Allow:`` is a no-op,
    so the rule must be SKIPPED, never treated as a length-0 match."""
    if pattern == "":
        return None
    if "*" not in pattern and not pattern.endswith("$"):
        return ("prefix", pattern)
    import re as _re

    body, anchor = (pattern[:-1], "$") if pattern.endswith("$") else (pattern, "")
    return ("regex", "^" + ".*".join(_re.escape(seg) for seg in body.split("*")) + anchor)


def q_robots_filter(sf_dir: str):
    """robots.txt crawl-compliance filter (RFC 9309) — the stage a
    lawful web pipeline runs before even the URL blocklist: each page's
    path is resolved against its host's robots rule group (or the
    ``*`` default group when the host has none) and the MOST SPECIFIC
    matching rule wins — specificity is the raw pattern's octet length
    (the Google robotstxt priority), with allow winning length ties
    (the RFC 9309 / Google resolution order).  The full RFC pattern
    grammar is supported: plain prefixes, ``*`` wildcards, a trailing
    ``$`` end anchor, and empty rules (allow-all no-ops, skipped).
    Rules come from the committed ``models/robots_rules.json`` so
    per-host rules parsed from real robots.txt fetches drop in without
    code changes.

    Scale shape: the ruleset is host-count-sized and broadcast once
    (``ray.put``); every check is row-local and vectorized — one Arrow
    regex splits host/path, then one ``pc.starts_with`` (prefix rules)
    or anchored RE2 ``pc.match_substring_regex`` (wildcard/anchor
    rules) per rule over the group's rows (groups × rules is tiny) —
    no shuffle anywhere, and only ``url`` is ever read.

    Output per page: ``(url, host, allowed, rule)`` where ``rule`` is
    the winning directive (``allow:<pattern>`` / ``disallow:<pattern>``)
    or ``""`` when no rule matched (allowed by default)."""
    import glob as _glob

    groups = load_robots_rules()
    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url"]
    )
    ref = ray.put(groups)

    def flag(batch: pa.Table) -> pa.Table:
        rules = ray.get(ref)
        parts = pc.extract_regex(
            batch.column("url"), r"^[a-z]+://(?P<host>[^/]+)(?P<path>/.*)?$"
        )
        host = pc.fill_null(pc.struct_field(parts, "host"), "")
        path = pc.fill_null(pc.struct_field(parts, "path"), "/")
        n = len(batch)
        best_a = np.full(n, -1, dtype=np.int64)  # longest matching allow len
        best_d = np.full(n, -1, dtype=np.int64)
        rule_a = np.full(n, "", dtype=object)
        rule_d = np.full(n, "", dtype=object)
        listed = np.zeros(n, dtype=bool)

        def apply_group(m_g: np.ndarray, spec: dict) -> None:
            for typ, best, rule in (("allow", best_a, rule_a), ("disallow", best_d, rule_d)):
                for pat in spec.get(typ, []):
                    matcher = _robots_rule_matcher(pat)
                    if matcher is None:  # empty rule: allow-all no-op
                        continue
                    kind, payload = matcher
                    if kind == "prefix":
                        hit = np.asarray(pc.starts_with(path, pattern=payload))
                    else:
                        hit = np.asarray(pc.match_substring_regex(path, payload))
                    m = m_g & hit & (len(pat) > best)
                    best[m] = len(pat)
                    rule[m] = pat

        for g, spec in rules.items():
            if g == "*":
                continue
            m_g = np.asarray(pc.equal(host, g))
            listed |= m_g
            apply_group(m_g, spec)
        apply_group(~listed, rules.get("*", {}))
        allowed = best_a >= best_d  # ties -> allow; no match: -1 >= -1 -> allowed
        rule = np.where(
            allowed,
            np.where(best_a >= 0, np.char.add("allow:", rule_a.astype(str)), ""),
            np.char.add("disallow:", rule_d.astype(str)),
        )
        return pa.table(
            {
                "url": batch.column("url"),
                "host": host,
                "allowed": pa.array(allowed.tolist(), pa.bool_()),
                "rule": pa.array(rule.tolist(), pa.string()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


NFC_DIRTY_MOD = 3  # doc_id % 3 == 0 rows get a decomposed suffix planted


def q_nfc_normalize(sf_dir: str):
    """Unicode NFC normalization — the canonicalization pass multilingual
    corpus pipelines (mC4, OSCAR) run before tokenization so that
    composed and decomposed encodings of the same text dedup and count
    as one: NFC-normalize each document, report whether it changed and
    the normalized length/digest.  The shipped corpus is already NFC,
    so a decomposed suffix (``' cafe' + U+0301``) is PLANTED row-locally
    on every ``doc_id % NFC_DIRTY_MOD == 0`` row — the q_cdc_diff
    perturbation idiom — making ``changed`` a live signal the TRUE
    DuckDB oracle (``nfc_normalize``) reproduces exactly.

    Kernel note: CPython ``unicodedata.normalize`` (C implementation)
    matches DuckDB's ``nfc_normalize`` on every case tested; this
    build's ``pc.utf8_normalize`` does NOT compose, so the Python
    kernel is the portable choice.  Scale shape: strictly row-local
    per-doc string work (the inherent cost class of the ops registry),
    vectorized md5 digest, no exchange anywhere."""
    import unicodedata as _ud

    from textpipe_ray.functions.strhash import md5_hex

    def norm(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        texts = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "").to_pylist()
        # explicitly DECOMPOSED suffix: 'e' + combining acute (U+0301)
        dirty = [
            t + " cafe\u0301" if i % NFC_DIRTY_MOD == 0 else t
            for i, t in zip(ids, texts)
        ]
        normed = [_ud.normalize("NFC", t) for t in dirty]
        changed = [n != d for n, d in zip(normed, dirty)]
        normed_arr = pa.array(normed, pa.string())
        md5_8 = pc.utf8_slice_codeunits(pa.array(md5_hex(normed_arr), pa.string()), 0, 8)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "changed": pa.array(changed, pa.bool_()),
                "n_chars_norm": pa.array([len(n) for n in normed], _I64),
                "norm_md5": md5_8,
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow"
    )


def load_url_blocklist() -> tuple[np.ndarray, str]:
    """→ (sorted blocked-host array, url-pattern alternation) from the
    committed artifact models/url_blocklist.json."""
    import json as _json
    from pathlib import Path as _Path

    spec = _json.loads(
        (_Path(__file__).resolve().parents[2] / "models" / "url_blocklist.json").read_text()
    )
    # an empty alternation would be the empty regex, which matches EVERY
    # url and silently blocks the whole corpus — substitute a
    # never-matching class instead
    pattern = "|".join(spec["url_patterns"]) or r"[^\s\S]"
    return np.sort(np.asarray(spec["hosts"], dtype=object)), pattern


def url_block_parts(
    batch: pa.Table, blocked_hosts: np.ndarray, pattern: str
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Shared blocklist check (q_url_filter + q_corpus_release):
    → (host Arrow array, blocked_host mask, blocked_pattern mask).
    Unparseable URLs get host '' for the membership test (never a
    searchsorted TypeError on None)."""
    host = pc.struct_field(
        pc.extract_regex(batch.column("url"), r"^[a-z]+://(?P<host>[^/]+)"), "host"
    )
    h = np.asarray(
        [x if x is not None else "" for x in host.to_pylist()], dtype=object
    )
    if len(blocked_hosts):
        idx = np.clip(np.searchsorted(blocked_hosts, h), 0, len(blocked_hosts) - 1)
        blocked_host = blocked_hosts[idx] == h
    else:
        blocked_host = np.zeros(len(h), dtype=bool)
    blocked_pat = np.asarray(pc.match_substring_regex(batch.column("url"), pattern))
    return host, blocked_host, blocked_pat


# ---------------------------------------------------------------------------
# end-to-end corpus release (the full quality_filter production chain)
# ---------------------------------------------------------------------------

RELEASE_SHARDS = 8


def q_corpus_release(sf_dir: str):
    """The full production chain as ONE lazy streaming pipeline — what a
    corpus release actually runs, composed from the same stages the
    individual queries exercise:

      1. URL blocklist pre-filter (broadcast tiny list, row-local, runs
         BEFORE any html is parsed);
      2. flagship scoring (extract → fused langid+perplexity actor pool
         → quality rules + scrub + keep/drop);
      3. keep-only exact content dedup (hash-partitioned, min-url wins);
      4. deterministic shard assignment + in-shard position (the
         reproducible training-order shuffle of q_shuffle_shards).

    Everything streams: no stage materializes the corpus, the only
    exchanges are the dedup hash partition and the per-shard rank, and
    the output is a training-ready manifest (shard_id, pos, url, lang).
    Deterministic end-to-end → golden-oracle value-checked.
    Partitioning assumption: one shard's manifest rows fit a partition —
    ``RELEASE_SHARDS`` is 8 for the test tables and scales with the
    corpus (thousands of block-sized shards at 100 TB, same as
    q_shuffle_shards)."""
    import glob as _glob

    import pandas as pd

    from textpipe_ray.functions.strhash import md5_hex
    from textpipe_ray.pipelines.flagship import (
        build_pages_pipeline,
        parquet_rows,
        read_pages,
    )
    from textpipe_ray.stages.dedup import dedup_exact

    pages = pages_dir_for(sf_dir)
    _files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))
    ds = read_pages(_files)

    block_ref = ray.put(load_url_blocklist())

    def url_keep(batch: pa.Table) -> pa.Table:
        bh, pat = ray.get(block_ref)
        _, blocked_host, blocked_pat = url_block_parts(batch, bh, pat)
        return batch.filter(pa.array(~(blocked_host | blocked_pat)))

    scored = build_pages_pipeline(
        ds.map_batches(url_keep, batch_format="pyarrow"),
        approx_rows=parquet_rows(_files),
    )

    def kept_keys(batch: pa.Table) -> pa.Table:
        # batched md5 over the Arrow buffers (functions/strhash.md5_hex
        # — md5 itself is contractual for the dedup key / training
        # order, so keep md5 but drop the per-row encode round-trips);
        # shard_id is derived from the SAME pos digest (top 32 bits),
        # so each kept row costs exactly two digests: content + url
        out = batch.filter(batch.column("keep"))
        urls = pc.cast(out.column("url"), pa.string())
        content = md5_hex(out.column("clean"))
        posk = md5_hex(pc.binary_join_element_wise(pa.scalar("pos:"), urls, pa.scalar("")))
        shard = np.fromiter(
            (int(h[:8], 16) for h in posk), dtype=np.int64, count=len(posk)
        ) % RELEASE_SHARDS
        return pa.table(
            {
                "url": urls,
                "lang": out.column("lang").cast(pa.string()),
                "content_hash": pa.array(content, pa.string()),
                "shard_id": pa.array(shard, _I64),
                "pos_key": pa.array(posk, pa.string()),
            }
        )

    survivors = dedup_exact(
        scored.map_batches(kept_keys, batch_format="pyarrow"), "content_hash", "url"
    )

    def enumerate_shard(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["pos_key", "url"], kind="mergesort").reset_index(drop=True)
        return pa.table(
            {
                "shard_id": pa.array(g["shard_id"].to_numpy(dtype=np.int64), _I64),
                "pos": pa.array(np.arange(len(g), dtype=np.int64), _I64),
                "url": pa.array(g["url"], pa.string()),
                "lang": pa.array(g["lang"], pa.string()),
            }
        )

    return (
        survivors.groupby("shard_id")
        .map_groups(enumerate_shard, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup (crawl-level first-pass dedup)
# ---------------------------------------------------------------------------

# applied in order, all RE2-safe (shared with any SQL engine)
_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid|ref)"
URL_CANON_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),                                   # drop fragment
    # tracking param followed by another param: drop it, KEEP the
    # leading separator ('?utm=x&id=2' → '?id=2', never '&id=2').
    # one global pass consumes non-overlapping matches, so a run of k
    # consecutive tracking params needs the rule repeated — four passes
    # cover any realistic run (documented cap; extras fall to the
    # trailing rule below)
    *[(rf"([?&]){_TRACKING}=[^&#]*&", r"\1")] * 4,
    (rf"[?&]{_TRACKING}=[^&#]*$", ""),               # tracking param at end
    (r"[?&]$", ""),                                  # dangling separator
    (r"^([a-z]+://)www\.", r"\1"),                   # strip www.
    (r"/$", ""),                                     # trailing slash
]


def q_url_dedup(sf_dir: str):
    """Crawl-level URL dedup — the FIRST dedup pass of a CC-style
    pipeline (before any content is fetched twice or parsed): URLs are
    canonicalized (fragment + tracking params stripped, ``www.`` and
    trailing-slash normalized, lowercased) and exactly deduped on the
    canonical form, keeping the earliest capture (min ``warc_ts``,
    tie-break url).

    The synthetic pages table has clean unique URLs, so ground truth is
    planted the same way the flagship plants keep/drop labels: each page
    deterministically expands into 1-4 capture variants (utm params,
    ``www.``, trailing slash, fragment — selected by a hash of the url),
    and the dedup must collapse every variant group back to exactly the
    original URL set (asserted by the paired test).

    Scale shape: canonicalization is a chain of vectorized RE2
    replaces — row-local, reads only ``url``/``warc_ts``; the dedup is
    one ``groupby(canonical)`` over pre-reduced per-batch partials
    (each batch first collapses its own duplicates), so the exchange
    moves at most one row per distinct canonical url per block."""
    import glob as _glob
    import hashlib as _hl

    import pandas as pd

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "warc_ts"]
    )

    def canon_partial(batch: pa.Table) -> pa.Table:
        base = batch.column("url").to_pylist()
        ts0 = np.asarray(
            pc.cast(batch.column("warc_ts"), pa.timestamp("us")).cast(_I64)
        )
        urls: list[str] = []
        ts: list[int] = []
        for u0, t0 in zip(base, ts0):
            sel = int.from_bytes(
                _hl.blake2b(u0.encode("utf8"), digest_size=2).digest(), "little"
            )
            urls.append(u0)
            ts.append(int(t0))
            variants = [
                u0 + "?utm_source=feed&utm_medium=rss",
                u0.replace("://", "://www.", 1),
                u0 + "/",
                u0 + "#section-2",
            ]
            for k, v in enumerate(variants):
                if (sel >> k) & 1:  # 0-4 planted recaptures per page
                    urls.append(v)
                    ts.append(int(t0) + 1000000 * (k + 1))  # later recaptures
        u = pc.utf8_lower(pa.array(urls, pa.string()))
        for pat, repl in URL_CANON_RULES:
            u = pc.replace_substring_regex(u, pat, repl)
        df = pd.DataFrame(
            {
                "canonical_url": u.to_pylist(),
                "warc_ts": np.asarray(ts, dtype=np.int64),
                "url": urls,
            }
        )
        # per-batch combiner: keep the batch-local winner per canonical
        g = df.sort_values(["canonical_url", "warc_ts", "url"], kind="mergesort")
        g = g.drop_duplicates("canonical_url", keep="first")
        n = (
            df.groupby("canonical_url", sort=False)
            .size()
            .reindex(g["canonical_url"])
            .to_numpy()
        )
        return pa.table(
            {
                "canonical_url": pa.array(g["canonical_url"], pa.string()),
                "warc_ts": pa.array(g["warc_ts"].to_numpy(), _I64),
                "url": pa.array(g["url"], pa.string()),
                "n_dups": pa.array(n.astype(np.int64), _I64),
            }
        )

    def finish(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["canonical_url", "warc_ts", "url"], kind="mergesort")
        n = (
            group.groupby("canonical_url", sort=False)["n_dups"]
            .sum()
            .reindex(g["canonical_url"])
            .to_numpy()
        )
        g = g.assign(n_total=n)
        g = g.drop_duplicates("canonical_url", keep="first")
        return pa.table(
            {
                "canonical_url": pa.array(g["canonical_url"], pa.string()),
                "keep_url": pa.array(g["url"], pa.string()),
                "warc_ts": pa.array(g["warc_ts"].to_numpy(dtype=np.int64), _I64),
                "n_dups": pa.array(g["n_total"].to_numpy(dtype=np.int64), _I64),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        part = np.asarray(
            [
                int.from_bytes(_hl.blake2b(u.encode("utf8"), digest_size=4).digest(), "little")
                % 32
                for u in batch.column("canonical_url").to_pylist()
            ],
            dtype=np.int32,
        )
        return batch.append_column("__p", pa.array(part, pa.int32()))

    return (
        ds.map_batches(canon_partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(finish, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# character coverage (tokenizer-training prep)
# ---------------------------------------------------------------------------


def q_char_coverage(sf_dir: str):
    """Per-language codepoint histogram — the corpus statistic behind
    SentencePiece's ``character_coverage`` knob (which codepoints must
    the tokenizer's alphabet cover, and how much tail can byte-fallback
    absorb).

    Scale shape: per batch, each language's texts are concatenated and
    decoded once into a uint32 codepoint array (``np.frombuffer`` of
    UTF-32), then ``np.unique`` counts the whole array in one
    vectorized pass — no per-character Python.  The per-batch
    ``(lang, cp, n)`` partials are the combiner: the groupby exchange
    moves O(langs × alphabet × blocks) rows, never O(corpus chars)."""
    from collections import defaultdict

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        bylang: dict[str, list[str]] = defaultdict(list)
        for lang, text in zip(
            batch.column("lang").to_pylist(), batch.column("text").to_pylist()
        ):
            bylang[lang].append(text or "")
        out_l: list[str] = []
        cps_parts: list[np.ndarray] = []
        n_parts: list[np.ndarray] = []
        for lang, texts in bylang.items():
            s = "".join(texts)
            if not s:
                continue
            arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            cps, counts = np.unique(arr, return_counts=True)
            out_l.extend([lang] * len(cps))
            cps_parts.append(cps.astype(np.int64))
            n_parts.append(counts.astype(np.int64))
        if not cps_parts:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "cp": pa.array([], _I64),
                    "n": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "cp": pa.array(np.concatenate(cps_parts)),
                "n": pa.array(np.concatenate(n_parts)),
            }
        )

    def post(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("n")
        return batch.set_column(i, "n", pc.cast(batch.column("n"), _I64))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "cp"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(post, batch_format="pyarrow")
        .sort(["lang", "cp"])
    )


# ---------------------------------------------------------------------------
# overlapping duplicated-span profile (Lee et al. 2022 substring dedup)
# ---------------------------------------------------------------------------

SPAN_W = 30  # duplicated-span window length, characters
SPAN_S = 10  # window stride (W/3: any ≥40-char shared run hits ≥1 window)
_N_SPAN_PARTS = 32


def q_span_dedup(sf_dir: str):
    """Per-document duplicated-span profile at arbitrary alignment — the
    corpus statistic behind suffix-array substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022): slide
    a ``SPAN_W``-char window at stride ``SPAN_S`` over every document
    and count, per document, how many windows also occur verbatim in at
    least one OTHER document.  ``dup_permille`` is the filterable score;
    unlike ``q_chunk_dedup``'s fixed token chunks, overlapping windows
    catch shared runs at any offset (any duplicated run of
    ``SPAN_W + SPAN_S - 1`` chars or longer is guaranteed to cover a
    window in both documents).

    Scale shape — window text crosses the wire exactly once:
      1. explode: per-doc window slices (C-level substring copies; one
         Python slice per window, same cost class as q_chunk_dedup's
         chunk join), routed by a vectorized content-hash partition id
         (hash ROUTES, pandas string equality DECIDES — collisions are
         harmless);
      2. one hash exchange on the window partition; within a partition
         a vectorized groupby-transform marks a window duplicated iff
         min(doc_id) != max(doc_id) over its corpus-wide occurrences
         (internal repeats inside one doc do NOT count), then partials
         pre-reduce to one row per (partition, doc);
      3. the final ``groupby(doc_id)`` moves O(docs × partitions)
         partial rows, never window text.
    Docs shorter than ``SPAN_W`` emit no windows and are absent from
    the output on both engines."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        wins: list[str] = []
        docs: list[int] = []
        for d, t in zip(doc, texts):
            t = t or ""
            for i in range(0, len(t) - SPAN_W + 1, SPAN_S):
                wins.append(t[i : i + SPAN_W])
                docs.append(d)
        if wins:
            part = (
                pd.util.hash_array(np.asarray(wins, dtype=object))
                % np.uint64(_N_SPAN_PARTS)
            ).astype(np.int32)
        else:
            part = np.array([], dtype=np.int32)
        return pa.table(
            {
                "win": pa.array(wins, pa.string()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.int64), _I64),
                "__p": pa.array(part, pa.int32()),
            }
        )

    def mark(part: pd.DataFrame) -> pa.Table:
        gb = part.groupby("win")["doc_id"]
        dup = (gb.transform("min") != gb.transform("max")).to_numpy(dtype=np.int64)
        out = (
            pd.DataFrame({"doc_id": part["doc_id"].to_numpy(), "dup": dup})
            .groupby("doc_id", sort=False)
            .agg(n_windows=("dup", "size"), n_dup_windows=("dup", "sum"))
            .reset_index()
        )
        # emit ARROW: a pandas block feeding Dataset.aggregate drops to a
        # per-group python path (measured 95s CPU over 85k rows at sf0.1)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64), _I64),
                "n_windows": pa.array(out["n_windows"].to_numpy(dtype=np.int64), _I64),
                "n_dup_windows": pa.array(
                    out["n_dup_windows"].to_numpy(dtype=np.int64), _I64
                ),
            }
        )

    partials = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(mark, batch_format="pandas")
    )

    agg = partials.groupby("doc_id").aggregate(
        Sum("n_windows", alias_name="n_windows"),
        Sum("n_dup_windows", alias_name="n_dup_windows"),
    )

    def post(batch: pa.Table) -> pa.Table:
        nw = pc.cast(batch.column("n_windows"), _I64)
        nd = pc.cast(batch.column("n_dup_windows"), _I64)
        # floor(1000.0 * nd / nw): int64→double exact at these sizes,
        # correctly-rounded IEEE division — bit-matches the oracle
        pm = np.floor(
            1000.0
            * np.asarray(nd, dtype=np.float64)
            / np.asarray(nw, dtype=np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "n_windows": nw,
                "n_dup_windows": nd,
                "dup_permille": pa.array(pm, _I64),
            }
        )

    return agg.map_batches(post, batch_format="pyarrow")


SUB_ANCHOR = 8  # anchor-gram width (codepoints) for content-defined starts
SUB_GAP = 10  # expected anchor spacing: P(anchor at a position) = 1/SUB_GAP


def _sub_windows(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Content-defined window starts + hashes (the winnowing/CDC
    anchoring trick): a ``SPAN_W``-codepoint window begins wherever the
    ``SUB_ANCHOR``-gram hash ≡ 0 (mod ``SUB_GAP``), so identical runs
    select identical windows at ANY document offset — a strided grid
    only matches when the two copies agree mod the stride."""
    from textpipe_ray.functions.strhash import (
        poly_prefix,
        window_hash64_from_prefix,
    )

    n = len(codes)
    if n < SPAN_W:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    prefix = poly_prefix(codes)  # shared by the anchor AND window passes
    a_starts = np.arange(0, n - SUB_ANCHOR + 1, dtype=np.int64)
    a_h = window_hash64_from_prefix(prefix, a_starts, SUB_ANCHOR)
    cand = a_starts[(a_h % np.uint64(SUB_GAP)) == 0]
    cand = cand[cand <= n - SPAN_W]
    return cand, window_hash64_from_prefix(prefix, cand, SPAN_W)


def q_substring_dedup(sf_dir: str):
    """Lee-et-al-2022 exact substring REMOVAL — the rewrite companion
    of ``q_span_dedup``'s profile: every ``SPAN_W``-char window (at
    content-defined anchor positions, see :func:`_sub_windows`) whose
    text occurs in ≥2 distinct documents is excised from every document
    EXCEPT the min-doc_id keeper; overlapping banned windows merge
    before excision (one +1/-1 coverage pass).  A cross-document shared
    run selects the SAME windows in every copy regardless of offset, so
    the non-keeper copies lose the anchored core (each anchor fires
    with prob 1/``SUB_GAP`` per position — a shared run of L chars is
    missed with prob ≈ (1-1/GAP)^(L-SPAN_W), deterministic given the
    content).  Retention guarantee is per WINDOW: chars covered by a
    window THIS document keeps are protected from excision, so every
    banned window's content survives intact in its keeper even when an
    overlapping run with a different (lower-id) keeper covers the same
    chars; for non-overlapping duplication — the common case — the
    keeper therefore retains the full run.  Output: rewritten ``text``,
    chars removed, banned-window count per document.

    Scale shape — window TEXT never leaves its task:
      1. count pass: O(n)-per-doc vectorized anchor + window hashes
         (functions/strhash rolling/at-position kernels); a per-batch
         combiner reduces to one (hash, min_doc, max_doc) row per
         distinct window per block; ONE hash exchange on ``h % P``
         partitions with a vectorized reduceat Min/Max per partition
         (13× the per-group Dataset aggregate at sf0.1: same rows
         moved, numpy instead of per-group machinery); banned =
         min≠max, broadcast SORTED with the keeper column.
         The broadcast is bounded by the corpus's duplicated-window
         vocabulary (the q_boilerplate_dedup budget argument — ~10^6-8
         hashes at web scale); past the object-store bound the lookup
         becomes a co-partitioned join (stages/joins.py).
      2. scrub pass (row-local, no exchange): recompute window hashes,
         ``searchsorted`` against the banned array, coverage mask,
         re-encode kept codepoints.  64-bit window-hash equality decides
         duplication (non-adversarial input; ~2^-64 per pair).
    Golden-oracle value-checked (range-merge text rewriting is not
    practically SQL-expressible)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        docs = np.asarray(batch.column("doc_id"), dtype=np.int64)
        hs, dls = [], []
        for d, t in zip(docs, batch.column("text").to_pylist()):
            codes = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
            _, h = _sub_windows(codes)
            if len(h):
                hs.append(h.view(np.int64))
                dls.append(np.full(len(h), d, dtype=np.int64))
        if not hs:
            return pa.table(
                {
                    "h": pa.array([], _I64),
                    "dmin": pa.array([], _I64),
                    "dmax": pa.array([], _I64),
                }
            )
        h = np.concatenate(hs)
        d = np.concatenate(dls)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(h))
        return pa.table(
            {
                "h": pa.array(h[starts], _I64),
                "dmin": pa.array(d[starts], _I64),  # d ascending within h
                "dmax": pa.array(d[ends - 1], _I64),
            }
        )

    import pandas as pd

    def part_tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("h"), dtype=np.int64)
        return t.append_column(
            "__p", pa.array((h % _N_SPAN_PARTS).astype(np.int32), pa.int32())
        )

    def reduce_part(g: pd.DataFrame) -> pa.Table:
        h = g["h"].to_numpy()
        dmin = g["dmin"].to_numpy()
        dmax = g["dmax"].to_numpy()
        order = np.argsort(h, kind="mergesort")
        h, dmin, dmax = h[order], dmin[order], dmax[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        mn = np.minimum.reduceat(dmin, starts)
        mx = np.maximum.reduceat(dmax, starts)
        keep = mn != mx  # banned = seen in ≥2 distinct docs
        return pa.table(
            {
                "h": pa.array(h[starts][keep], _I64),
                "dmin": pa.array(mn[keep], _I64),
            }
        )

    banned_rows = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .map_batches(part_tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(reduce_part, batch_format="pandas")
        .take_all()
    )
    bh = np.asarray([r["h"] for r in banned_rows], dtype=np.int64)
    bk = np.asarray([r["dmin"] for r in banned_rows], dtype=np.int64)
    order = np.argsort(bh)
    ref = ray.put((bh[order], bk[order]))

    def scrub(batch: pa.Table) -> pa.Table:
        h_sorted, keeper = ray.get(ref)
        docs = np.asarray(batch.column("doc_id"), dtype=np.int64)
        out_text: list[str] = []
        removed = np.zeros(len(docs), dtype=np.int64)
        nwin = np.zeros(len(docs), dtype=np.int64)
        for i, (d, t) in enumerate(zip(docs, batch.column("text").to_pylist())):
            t = t or ""
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            st, h = _sub_windows(codes)
            bad = np.empty(0, dtype=np.int64)
            own = np.empty(0, dtype=np.int64)
            if len(h) and len(h_sorted):
                hi = h.view(np.int64)
                idx = np.minimum(
                    np.searchsorted(h_sorted, hi), len(h_sorted) - 1
                )
                found = (h_sorted[idx] == hi)
                bad = st[found & (keeper[idx] != d)]
                own = st[found & (keeper[idx] == d)]
            if len(bad):
                def _coverage(starts_: np.ndarray) -> np.ndarray:
                    delta = np.zeros(len(codes) + 1, dtype=np.int64)
                    np.add.at(delta, starts_, 1)
                    np.add.at(delta, starts_ + SPAN_W, -1)
                    return np.cumsum(delta[:-1]) > 0
                # chars inside a window THIS doc keeps are protected —
                # without this, an overlapping foreign-keeper run erodes
                # the keeper's own copy and no intact copy survives
                covered = _coverage(bad)
                if len(own):
                    covered &= ~_coverage(own)
                out_text.append(codes[~covered].tobytes().decode("utf-32-le"))
                removed[i] = int(covered.sum())
                nwin[i] = len(bad)
            else:
                out_text.append(t)
        return pa.table(
            {
                "doc_id": pa.array(docs, _I64),
                "text": pa.array(out_text, pa.string()),
                "removed_chars": pa.array(removed, _I64),
                "n_banned_windows": pa.array(nwin, _I64),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII / toxicity incidence rollup
# ---------------------------------------------------------------------------


def q_pii_stats(sf_dir: str):
    """Corpus PII/toxicity incidence: per language and scrub rule, how
    many matches and how many affected documents — the observability
    rollup a release audit runs BEFORE deciding scrub policy (the
    per-document scrub itself is ``q_scrub``).  Counts follow scrub
    semantics exactly: each rule counts on the text as already
    rewritten by the rules before it (order matters — credit-card
    before phone, or phone eats card digits).

    Scale shape: per batch, one vectorized RE2 count + replace pass per
    rule (``stages/text.scrub_batch``), then a pandas partial groupby —
    the exchange moves O(langs × blocks) rows of 2×n_rules int64
    columns, never text."""
    import pandas as pd

    from textpipe_ray.functions.scrub import load_rules as _load_rules

    names = [r["name"] for r in _load_rules()["rules"]]
    cols = [f"{n}_{kind}" for n in names for kind in ("matches", "docs")]

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        b = scrub_batch(batch, text_col="text", out_col="__scrubbed")
        data = {"lang": np.asarray(b.column("lang"))}
        for n in names:
            cnt = np.asarray(b.column(f"scrub_{n}"), dtype=np.int64)
            data[f"{n}_matches"] = cnt
            data[f"{n}_docs"] = (cnt > 0).astype(np.int64)
        g = pd.DataFrame(data).groupby("lang", sort=False).sum().reset_index()
        return pa.table(
            {"lang": pa.array(g["lang"], pa.string())}
            | {c: pa.array(g[c].to_numpy(), _I64) for c in cols}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def post(batch: pa.Table) -> pa.Table:
        for c in cols:
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch.column(c), _I64))
        return batch

    return agg.map_batches(post, batch_format="pyarrow").sort("lang")


# ---------------------------------------------------------------------------
# distributed char-trigram LM training (tokenizer / perplexity prep)
# ---------------------------------------------------------------------------

TRIGRAM_TOPK = 50
_TRI_SENT = 0x110000  # > max codepoint (0x10FFFF): doc-boundary sentinel


def q_trigram_lm(sf_dir: str):
    """Train the char-trigram count table — the model family
    ``PerplexityStage`` consumes (functions/perplexity.py) — fully
    distributed: per language, the ``TRIGRAM_TOPK`` most frequent
    lowercase character trigrams with their counts and the language's
    total trigram mass (``n_total`` lets consumers form smoothed
    probabilities exactly; no floats cross an engine boundary).
    Trigrams never cross document boundaries.

    Scale shape: per batch, each language's docs are decoded once into
    a uint32 codepoint array with an impossible-codepoint sentinel
    between docs; the three shifted views pack into one int64 key
    (3×21 bits), sentinel windows mask out, and ``np.unique`` counts
    the whole batch in one pass — no per-character Python.  The
    ``groupby(lang, key)`` exchange moves O(langs × |alphabet|³-ish ×
    blocks) packed-int partials, never text; the final per-lang top-k +
    total is cardinality-bounded and decodes keys back to strings only
    for the k×langs output rows.  Partitioning assumption: one
    language's DISTINCT-trigram count table fits a partition — true for
    alphabetic scripts at any corpus size; for CJK at 100 TB pre-prune
    with a min-count threshold (value-histogram idiom) before the
    per-lang finish."""
    from collections import defaultdict

    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column("text"), pa.string()))
        bylang: dict[str, list[str]] = defaultdict(list)
        for lang, t in zip(batch.column("lang").to_pylist(), lowered.to_pylist()):
            bylang[lang].append(t or "")
        out_l: list[str] = []
        key_parts: list[np.ndarray] = []
        n_parts: list[np.ndarray] = []
        sent = np.array([_TRI_SENT], dtype=np.uint32)
        for lang, ts in bylang.items():
            parts: list[np.ndarray] = []
            for t in ts:
                parts.append(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32))
                parts.append(sent)
            arr = np.concatenate(parts).astype(np.int64)
            if len(arr) < 3:
                continue
            w0, w1, w2 = arr[:-2], arr[1:-1], arr[2:]
            valid = (w0 != _TRI_SENT) & (w1 != _TRI_SENT) & (w2 != _TRI_SENT)
            keys = (w0[valid] << 42) | (w1[valid] << 21) | w2[valid]
            if len(keys) == 0:
                continue
            uk, counts = np.unique(keys, return_counts=True)
            out_l.extend([lang] * len(uk))
            key_parts.append(uk)
            n_parts.append(counts.astype(np.int64))
        if not key_parts:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "key": pa.array([], _I64),
                    "n": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "key": pa.array(np.concatenate(key_parts)),
                "n": pa.array(np.concatenate(n_parts)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "key"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        n_total = int(g["n"].sum())
        keys = g["key"].to_numpy(dtype=np.int64)
        tri = [
            chr((k >> 42) & 0x1FFFFF) + chr((k >> 21) & 0x1FFFFF) + chr(k & 0x1FFFFF)
            for k in keys
        ]
        d = pd.DataFrame(
            {"lang": g["lang"].to_numpy(), "tri": tri, "n": g["n"].to_numpy()}
        )
        d = d.sort_values(["n", "tri"], ascending=[False, True], kind="mergesort").head(
            TRIGRAM_TOPK
        )
        d["n"] = d["n"].astype("int64")
        d["n_total"] = np.int64(n_total)
        return d[["lang", "tri", "n", "n_total"]]

    return (
        counts.groupby("lang")
        .map_groups(finish, batch_format="pandas")
        .sort(["lang", "n", "tri"], descending=[False, True, False])
    )


# ---------------------------------------------------------------------------
# image perceptual-hash dedup (multimodal near-dup family)
# ---------------------------------------------------------------------------


def q_media_phash_dedup(sf_dir: str):
    """Image near-duplicate pairs by perceptual hash — the multimodal
    analog of text SimHash dedup: decode each image in an actor pool,
    fingerprint with a 64-bit dHash (``ImagePHashStage``), then reuse
    the hamming-band pigeonhole plan (``near_dup_fingerprints``) that
    text dedup already runs.  Under a real decoder near-identical
    images (recompression, light edits) land within a few hamming bits;
    the deterministic fake decoder collides only planted byte-identical
    payloads — the banding/verify exchange is identical either way.

    Scale shape: decode is the expensive unit — an actor pool with
    small batches bounds in-flight decoded pixels; only (id, 8-byte
    fingerprint) rows reach the exchange, so dedup cost is independent
    of image size."""
    import re as _re

    import ray.data

    from textpipe_ray.stages.dedup import near_dup_fingerprints
    from textpipe_ray.stages.multimodal import ImagePHashStage, generate_media

    rows = {"0.001": 200, "0.01": 500, "0.1": 2000}
    m = _re.search(r"sf([0-9.]+)", sf_dir)
    n = rows.get(m.group(1) if m else "0.001", 200)
    media = ray.data.from_arrow(generate_media(n, dup_frac=0.3)).repartition(8)

    images = media.filter(
        lambda r: r["kind"] == "image"  # row-local; images only carry payloads onward
    )
    hashed = images.map_batches(
        ImagePHashStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
    ).select_columns(["media_id", "phash"])

    pairs = near_dup_fingerprints(
        hashed, fp_col="phash", id_col="media_id", max_hamming=2
    )
    return pairs.sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# global quality-percentile filter (keep top fraction by learned score)
# ---------------------------------------------------------------------------

QUALITY_PCT_Q = (7, 10)  # keep docs at/above the 0.70 score quantile (top ~30%)


def q_quality_percentile(sf_dir: str):
    """Global quality-percentile selection (the FineWeb/DCLM move:
    "keep the top X% of the corpus by classifier score", a corpus-
    relative threshold rather than a fixed cutoff): score every doc
    with the committed linear model, find the exact 0.70 score
    quantile corpus-wide, keep docs at/above it.

    Scale shape — two streaming passes, no global sort:
      1. threshold pass: scores quantize to ``floor(score·1e6)`` int64
         (score doubles are bit-identical across engines — see
         q_quality_score — so the quantized int agrees everywhere) and
         reduce via the value-histogram idiom (one row per distinct
         micro-score, the q_len_quantiles pattern); the
         ``quantile_disc`` index is exact-rational ``ceil(q·n)-1``;
      2. filter pass: rescore per batch and keep ``>= thr`` — entirely
         row-local, no shuffle; ties at the threshold all survive on
         both engines (deterministic over-selection, never a coin
         flip).  The int threshold is a closure scalar, not state."""
    from textpipe_ray.functions.quality_score import load_weights

    weights = load_weights()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        uk, cnt = np.unique(_quality_micro(batch, weights), return_counts=True)
        return pa.table(
            {
                "score_micro": pa.array(uk, _I64),
                "cnt": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("score_micro")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # one row per distinct micro-score
        .sort_values("score_micro")
    )
    cum = np.cumsum(hist["cnt"].to_numpy())
    n = int(cum[-1])
    num, den = QUALITY_PCT_Q
    idx = max(0, -(-(num * n) // den) - 1)  # quantile_disc: ceil(q*n)-1, exact
    thr = int(hist["score_micro"].to_numpy()[np.searchsorted(cum, idx + 1)])

    def keep(batch: pa.Table) -> pa.Table:
        micro = _quality_micro(batch, weights)
        mask = micro >= thr
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64).filter(pa.array(mask)),
                "score_micro": pa.array(micro[mask], _I64),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# audio near-dup via envelope fingerprints
# ---------------------------------------------------------------------------


def q_audio_dedup(sf_dir: str):
    """Audio near-duplicate pairs by loudness-envelope fingerprint —
    completes the multimodal dedup family (text SimHash, image dHash,
    video frame votes, audio envelope): decode in an actor pool,
    fingerprint the RMS-envelope SHAPE as 64 bits
    (``AudioFingerprintStage``), then the shared hamming-band plan
    (``near_dup_fingerprints``, max_hamming=2).  Under a real decoder,
    re-encoded/gain-shifted copies land within a few bits; the
    deterministic fake collides only planted payload copies — the
    exchange plan is identical.

    Scale shape: decode is the expensive unit (actor pool, small
    batches); only (id, 8-byte fingerprint) rows reach the exchange."""
    import re as _re

    import ray.data

    from textpipe_ray.stages.dedup import near_dup_fingerprints
    from textpipe_ray.stages.multimodal import AudioFingerprintStage, generate_media

    rows = {"0.001": 200, "0.01": 500, "0.1": 2000}
    m = _re.search(r"sf([0-9.]+)", sf_dir)
    n = rows.get(m.group(1) if m else "0.001", 200)
    media = ray.data.from_arrow(generate_media(n, dup_frac=0.3)).repartition(8)

    hashed = (
        media.filter(lambda r: r["kind"] == "audio")
        .map_batches(
            AudioFingerprintStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
        )
        .select_columns(["media_id", "audio_fp"])
    )
    pairs = near_dup_fingerprints(
        hashed, fp_col="audio_fp", id_col="media_id", max_hamming=2
    )
    return pairs.sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# video near-dup via sampled-frame perceptual hashes
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 4
VIDEO_MIN_MATCH = 3  # videos are dups when ≥3 of 4 frame hashes agree


def q_video_dedup(sf_dir: str):
    """Video near-duplicate pairs by sampled-frame fingerprints: sample
    ``VIDEO_FRAMES`` frames per clip at uniform midpoints, dHash each,
    and call two videos duplicates when at least ``VIDEO_MIN_MATCH``
    same-index frame hashes agree — robust to a re-encode corrupting a
    frame under a real decoder (the deterministic fake collides only
    planted payload+duration copies; the exchange plan is identical).

    Scale shape: frame decode is the expensive unit (actor pool, small
    batches); only ``(media_id, frame_idx, 8-byte hash)`` rows reach
    the exchange.  One hash partition on (frame_idx, hash) groups
    candidate frames, within-bucket pairs are vectorized, and the final
    pair groupby sums matched frames — the q_simhash banding plan with
    frame_idx as the band."""
    import re as _re

    import pandas as pd

    import ray.data

    from textpipe_ray.stages.multimodal import VideoFrameHashStage, generate_media

    rows = {"0.001": 200, "0.01": 500, "0.1": 2000}
    m = _re.search(r"sf([0-9.]+)", sf_dir)
    n = rows.get(m.group(1) if m else "0.001", 200)
    media = ray.data.from_arrow(generate_media(n, dup_frac=0.3)).repartition(16)

    # decode dominates this query (UDF ~5.5 ms/clip): size the pool to
    # the session, not a constant — (1,4) left 3/4 of the measured UDF
    # seconds queued behind 4 actors (4.7 s; (2,12) -> ~2.5 s at 32 cpus)
    frames = media.map_batches(
        VideoFrameHashStage,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(2, max(4, min(12, _cpus() // 3))),
        fn_constructor_kwargs={"num_frames": VIDEO_FRAMES},
    )

    def add_part(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("frame_phash"), dtype=np.int64) * np.int64(
            VIDEO_FRAMES + 1
        ) + np.asarray(batch.column("frame_idx"), dtype=np.int64)
        return batch.append_column("__p", _part_col(k, 32))

    def bucket_pairs(part: pd.DataFrame) -> pa.Table:
        g = part.sort_values(["frame_idx", "frame_phash", "media_id"], kind="mergesort")
        idx = g["frame_idx"].to_numpy(dtype=np.int64)
        ph = g["frame_phash"].to_numpy(dtype=np.int64)
        ids = g["media_id"].to_numpy(dtype=np.int64)
        # exact bucket boundaries on the REAL (frame_idx, phash) pair —
        # a packed int key would wrap (phash spans all of int64) and a
        # wrap collision would fabricate candidate pairs
        chg = np.ones(len(g), dtype=bool)
        chg[1:] = (idx[1:] != idx[:-1]) | (ph[1:] != ph[:-1])
        starts = np.flatnonzero(chg)
        counts = np.diff(np.append(starts, len(g)))
        a_out, b_out = [], []
        for s, k in zip(starts[counts > 1], counts[counts > 1]):
            bid = ids[s : s + k]
            xs, ys = np.triu_indices(k, k=1)
            a_out.append(bid[xs])
            b_out.append(bid[ys])
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], _I64),
                    "id_b": pa.array([], _I64),
                    "one": pa.array([], _I64),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out).astype(np.int64), _I64),
                "id_b": pa.array(np.concatenate(b_out).astype(np.int64), _I64),
                "one": pa.array(
                    np.ones(sum(len(a) for a in a_out), dtype=np.int64), _I64
                ),
            }
        )

    pairs = (
        frames.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("one", alias_name="n_frames_matched"))
    )

    def finish(b: pa.Table) -> pa.Table:
        nm = pc.cast(b.column("n_frames_matched"), _I64)
        keep = pc.greater_equal(nm, pa.scalar(VIDEO_MIN_MATCH, _I64))
        out = b.filter(keep)
        return pa.table(
            {
                "id_a": pc.cast(out.column("id_a"), _I64),
                "id_b": pc.cast(out.column("id_b"), _I64),
                "n_frames_matched": pc.cast(out.column("n_frames_matched"), _I64),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow").sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# distributed PCA over embeddings (whitening / compression)
# ---------------------------------------------------------------------------

PCA_COMPONENTS = 8
_PCA_DIM = 64
_PCA_Q = 1e6  # fixed-point quantum for order-independent sums


def q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embedding table — the
    whitening/compression step before embedding dedup or ANN (project
    64-d vectors onto the top ``PCA_COMPONENTS`` principal axes).

    Scale shape — the classic two-pass distributed PCA, made
    bit-deterministic with the fixed-point idiom of
    ``q_embedding_centroid``:
      1. moment pass: each ROW's sums and outer products quantize to
         int64 (``floor(x·1e6)``-style) BEFORE any summation, so the
         accumulated moments are exact integers — identical under any
         batching, block order, or cluster size; per-batch partials are
         one 64+64² int row per block (≈33 KB), a bounded driver
         collect;
      2. eigendecomposition of the 64×64 covariance on the driver
         (constant work), sign-fixed by convention (largest-|coord|
         positive), broadcast via ``ray.put``;
      3. projection pass: one matmul per batch, row-local, no shuffle.
    Output projections are micro-quantized ints → golden-oracle
    value-checked."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        x = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, _PCA_DIM))
        # per-ROW quantization before the sum → order-independent.
        # The (rows, D, D) outer-product tensor is built in 256-row
        # slices: per-row quantized values are identical under any
        # slicing, and peak memory stays ~16 MB/task instead of
        # ~100-400 MB at default batch sizes
        s_acc = np.floor(x * _PCA_Q).astype(np.int64).sum(axis=0)
        o_acc = np.zeros(_PCA_DIM * _PCA_DIM, dtype=np.int64)
        for lo in range(0, len(x), 256):
            xs = x[lo : lo + 256]
            outer = np.einsum("bi,bj->bij", xs, xs)
            o_acc += np.floor(outer * _PCA_Q).astype(np.int64).reshape(len(xs), -1).sum(axis=0)
        return pa.table(
            {
                "n": pa.array([np.int64(len(x))], _I64),
                "s": pa.array([s_acc.tolist()], pa.list_(pa.int64())),
                "o": pa.array([o_acc.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()  # one row/block
    n = int(parts["n"].sum())
    s = np.sum([np.asarray(v, dtype=np.int64) for v in parts["s"]], axis=0)
    o = np.sum([np.asarray(v, dtype=np.int64) for v in parts["o"]], axis=0)
    mean = (s / _PCA_Q) / n
    exx = (o / _PCA_Q).reshape(_PCA_DIM, _PCA_DIM) / n
    cov = exx - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)            # ascending; deterministic LAPACK
    comps = evecs[:, ::-1][:, :PCA_COMPONENTS]    # top-K columns
    for k in range(PCA_COMPONENTS):               # sign convention
        j = int(np.argmax(np.abs(comps[:, k])))
        if comps[j, k] < 0:
            comps[:, k] = -comps[:, k]
    basis_ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        m, c = ray.get(basis_ref)
        x = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, _PCA_DIM))
        proj = np.floor((x - m) @ c * _PCA_Q).astype(np.int64)
        cols = {"vec_id": pc.cast(batch.column("vec_id"), _I64)}
        for k in range(PCA_COMPONENTS):
            cols[f"pc{k}_micro"] = pa.array(proj[:, k], _I64)
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ordered-sequence funnel (event analytics)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 86_400_000_000  # each step must follow within 24 hours


def q_funnel(sf_dir: str):
    """Ordered-sequence funnel over the events stream: per user, the
    first ``view``, the first ``click`` strictly after that view within
    ``FUNNEL_WINDOW_US``, and the first ``purchase`` strictly after
    that click within the window — the sequence-analytics primitive
    (conversion funnels, A-then-B-within-T queries) that plain window
    aggregates can't express.

    Scale shape: the row-local filter keeps only funnel-step events,
    then ONE hash exchange on ``user_id`` (all of a user's events land
    in one partition — the q_sessionize partitioning assumption) and
    per-partition vectorized groupby-min/merge passes; the output is
    one row per funnel-active user."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array(list(FUNNEL_STEPS), pa.string()),
        )
        out = batch.filter(mask)
        return pa.table(
            {
                "user_id": pc.cast(out.column("user_id"), _I64),
                "event_type": out.column("event_type").cast(pa.string()),
                "ts": pc.cast(
                    pc.cast(out.column("ts"), pa.timestamp("us")), _I64
                ),
                "__p": _part_col(
                    np.asarray(pc.cast(out.column("user_id"), _I64)), 32
                ),
            }
        )

    def funnel(part: pd.DataFrame) -> pa.Table:
        s1, s2, s3 = FUNNEL_STEPS
        t1 = part[part["event_type"] == s1].groupby("user_id")["ts"].min()
        c = part[part["event_type"] == s2].merge(
            t1.rename("t1"), left_on="user_id", right_index=True
        )
        t2 = (
            c[(c["ts"] > c["t1"]) & (c["ts"] <= c["t1"] + FUNNEL_WINDOW_US)]
            .groupby("user_id")["ts"]
            .min()
        )
        p = part[part["event_type"] == s3].merge(
            t2.rename("t2"), left_on="user_id", right_index=True
        )
        t3 = (
            p[(p["ts"] > p["t2"]) & (p["ts"] <= p["t2"] + FUNNEL_WINDOW_US)]
            .groupby("user_id")["ts"]
            .min()
        )
        users = np.sort(part["user_id"].unique())
        out = pd.DataFrame({"user_id": users})
        out["t_view"] = out["user_id"].map(t1)
        out["t_click"] = out["user_id"].map(t2)
        out["t_purchase"] = out["user_id"].map(t3)
        stage = (
            out["t_view"].notna().astype(np.int64)
            + out["t_click"].notna().astype(np.int64)
            + out["t_purchase"].notna().astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(dtype=np.int64), _I64),
                "stage": pa.array(stage.to_numpy(), _I64),
                "t_view": pa.array(out["t_view"].astype("Int64"), pa.int64()),
                "t_click": pa.array(out["t_click"].astype("Int64"), pa.int64()),
                "t_purchase": pa.array(out["t_purchase"].astype("Int64"), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(funnel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# normalized exact dedup (CCNet-style canonical-text dedup)
# ---------------------------------------------------------------------------

NORM_DUP_TAG = 1_000_000  # planted-variant doc_id offset


def q_normalized_dedup(sf_dir: str):
    """Normalized exact dedup — the CCNet move: case-fold and collapse
    whitespace BEFORE hashing, so trivially-reformatted copies (case
    changes, wrapped lines, double spaces) collapse that raw-byte
    ``q_exact_dedup`` would miss.  Keeps min ``doc_id`` per normalized
    hash and reports the collapse count.

    Every document's full text is unique in the synthetic tables, so
    reformatted copies are planted the q_url_dedup way: docs selected by
    a hash of their id also appear as an UPPERCASED and/or
    whitespace-mangled variant (tagged doc_id + 10⁶/2·10⁶), and the
    normalization must collapse every variant group — the paired test
    asserts the output keys are exactly the original corpus and every
    planted variant is absorbed.

    Scale shape: normalization is two vectorized Arrow kernels
    (``utf8_lower`` + one RE2 whitespace collapse) and hashing is
    per-batch; the per-batch combiner pre-collapses local duplicates so
    the single ``groupby(key)`` exchange moves ≤ one row per distinct
    hash per block — never text."""
    import hashlib as _hl

    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm_partial(batch: pa.Table) -> pa.Table:
        ids0 = np.asarray(batch.column("doc_id"), dtype=np.int64)
        texts0 = batch.column("text").to_pylist()
        ids: list[int] = []
        texts: list[str] = []
        for i, t0 in zip(ids0, texts0):
            t0 = t0 or ""
            ids.append(int(i))
            texts.append(t0)
            sel = int(_hl.md5(f"norm:{i}".encode("utf8")).hexdigest()[:2], 16)
            if sel & 1:  # planted reformatted copy: case change
                ids.append(int(i) + NORM_DUP_TAG)
                texts.append(t0.upper())
            if sel & 2:  # planted reformatted copy: whitespace mangling
                ids.append(int(i) + 2 * NORM_DUP_TAG)
                texts.append("  " + t0.replace(" ", "\n\t ") + " \n")
        t = pc.utf8_lower(pa.array(texts, pa.string()))
        t = pc.replace_substring_regex(t, r"[\t\n\f\r ]+", " ")
        # trim SPACES only: DuckDB trim() strips ' ' while Arrow's
        # utf8_trim_whitespace also strips Unicode whitespace (NBSP,
        # \x0b) the collapse class deliberately leaves alone
        t = pc.utf8_trim(t, " ")
        keys = [
            hashlib.md5((s or "").encode("utf8")).hexdigest() for s in t.to_pylist()
        ]
        df = pd.DataFrame(
            {"dedup_key": keys, "doc_id": np.asarray(ids, dtype=np.int64)}
        )
        g = df.groupby("dedup_key", sort=False).agg(
            keep_doc_id=("doc_id", "min"), n_docs=("doc_id", "size")
        ).reset_index()
        return pa.table(
            {
                "dedup_key": pa.array(g["dedup_key"], pa.string()),
                "keep_doc_id": pa.array(g["keep_doc_id"].to_numpy(dtype=np.int64), _I64),
                "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64), _I64),
            }
        )

    return (
        ds.map_batches(norm_partial, batch_format="pyarrow")
        .groupby("dedup_key")
        .aggregate(
            Min("keep_doc_id", alias_name="keep_doc_id"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "dedup_key": b.column("dedup_key"),
                    "keep_doc_id": pc.cast(b.column("keep_doc_id"), _I64),
                    "n_docs": pc.cast(b.column("n_docs"), _I64),
                }
            ),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# per-source budget mix (training-mix selection under a size budget)
# ---------------------------------------------------------------------------

BUDGET_MIX_CHARS = 5_000  # per-source char budget (binds at every test scale)
_BUDGET_RANGES = 256       # hash-order range partitions (hk first byte)


def q_budget_mix(sf_dir: str):
    """Budgeted training-mix selection: from every source, keep documents
    in deterministic hash order until the source's size budget is
    reached — how production mixes are actually drawn ("X tokens of
    web, Y of code"), an unbiased sample with an exact cap rather than
    a keep-rate (q_domain_mix) or temperature (q_lang_temperature).
    A doc is kept iff the running total BEFORE it is under budget, so
    the boundary doc always survives on both engines.

    Scale shape — a grouped distributed prefix sum (the q_pack_sequences
    idiom, keyed by (source, hash-range)):
      1. each doc gets ``hk = md5(doc_id)`` and a range = hk's first
         byte; per-(source, range) totals reduce via one BOUNDED
         groupby (sources × 256 rows) and prefix offsets broadcast as
         a tiny dict;
      2. one hash exchange on (source, range); within a partition a
         vectorized pandas cumsum computes local prefixes, adds the
         broadcast offset, and filters — no global sort anywhere."""
    import hashlib as _hl

    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        hk = [_hl.md5(str(i).encode("utf8")).hexdigest() for i in ids]
        rng = np.asarray([int(h[:2], 16) for h in hk], dtype=np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "source": batch.column("source").cast(pa.string()),
                "n_chars": pc.cast(batch.column("n_chars"), _I64),
                "hk": pa.array(hk, pa.string()),
                "rng": pa.array(rng, pa.int32()),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow").materialize()

    totals = (
        keyed.groupby(["source", "rng"])
        .aggregate(Sum("n_chars", alias_name="total"))
        .to_pandas()  # bounded: sources × 256 rows
        .sort_values(["source", "rng"])
    )
    totals["offset"] = totals.groupby("source")["total"].cumsum() - totals["total"]
    off = {
        (s, int(r)): int(o)
        for s, r, o in zip(totals["source"], totals["rng"], totals["offset"])
    }
    off_ref = ray.put(off)

    def add_part(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch.column("rng"), dtype=np.int64)
        # range id alone spreads (source, range) groups: all rows of one
        # group share one partition, partitions hold whole groups
        return batch.append_column("__p", _part_col(r, 64))

    def local(df: pd.DataFrame) -> pa.Table:
        offs = ray.get(off_ref)
        g = df.sort_values(["source", "rng", "hk", "doc_id"], kind="mergesort")
        prev_local = (
            g.groupby(["source", "rng"], sort=False)["n_chars"].cumsum()
            - g["n_chars"]
        ).to_numpy(dtype=np.int64)
        base = np.asarray(
            [offs[(s, int(r))] for s, r in zip(g["source"], g["rng"])],
            dtype=np.int64,
        )
        prev_cum = prev_local + base
        keep = prev_cum < BUDGET_MIX_CHARS
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)[keep], _I64),
                "source": pa.array(g["source"].to_numpy(dtype=object)[keep], pa.string()),
                "n_chars": pa.array(g["n_chars"].to_numpy(dtype=np.int64)[keep], _I64),
                "prev_cum": pa.array(prev_cum[keep], _I64),
            }
        )

    return (
        keyed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(local, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection for language models)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1 << 16
DSIR_TARGET_SOURCE = "src0"  # stands in for the high-quality reference corpus


def q_dsir(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed n-gram features are under a
    target distribution (here: the ``DSIR_TARGET_SOURCE`` subset,
    standing in for Wikipedia/books) than under the raw corpus —
    ``w(doc) = Σ_f n_f(doc)·(log p̂_tgt(f) − log p̂_raw(f))`` with
    add-one smoothing.  Docs are then resampled ∝ exp(w) downstream;
    the weight table IS the operator output.

    Scale shape — the broadcast side is CONSTANT-SIZE by construction
    (the whole point of hashed features): two ``DSIR_BUCKETS``-entry
    histograms, not a vocabulary.
      1. histogram pass: packed char-trigram keys (the q_trigram_lm
         codepoint machinery) hash to 16-bit buckets; per-batch
         ``np.bincount`` partials reduce via one bounded
         ``groupby(bucket)`` and the 65k-row log-ratio table broadcasts
         once via ``ray.put``;
      2. scoring pass: per batch, one ``np.add.reduceat`` over the
         log-ratio lookups — row-local, no shuffle.
    Weights are emitted micro-quantized (int64); value-checked against
    the committed golden (same doubles → same floor everywhere)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def _packed_keys(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """→ (per-doc trigram counts, concatenated packed keys)."""
        sent = np.array([_TRI_SENT], dtype=np.uint32)
        parts: list[np.ndarray] = []
        for t in texts:
            parts.append(np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32))
            parts.append(sent)
        arr = np.concatenate(parts).astype(np.int64)
        w0, w1, w2 = arr[:-2], arr[1:-1], arr[2:]
        valid = (w0 != _TRI_SENT) & (w1 != _TRI_SENT) & (w2 != _TRI_SENT)
        keys = (w0 << 42) | (w1 << 21) | w2
        # per-doc trigram counts: distance between sentinel positions − 2
        lens = np.diff(np.concatenate(([-1], np.flatnonzero(arr == _TRI_SENT)))) - 1
        n_tri = np.maximum(lens - 2, 0)
        return n_tri, keys[valid]

    def _buckets(keys: np.ndarray) -> np.ndarray:
        return (
            (keys.astype(np.uint64) * _GOLDEN) >> np.uint64(64 - 16)
        ).astype(np.int64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column("text"), pa.string())).to_pylist()
        src = np.asarray(batch.column("source"))
        out = {}
        for name, mask in (
            ("n_target", src == DSIR_TARGET_SOURCE),
            ("n_raw", np.ones(len(src), dtype=bool)),
        ):
            texts = [t for t, m in zip(lowered, mask) if m]
            if texts:
                _, keys = _packed_keys(texts)
                out[name] = np.bincount(_buckets(keys), minlength=DSIR_BUCKETS)
            else:
                out[name] = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        nz = (out["n_target"] + out["n_raw"]) > 0
        return pa.table(
            {
                "bucket": pa.array(np.flatnonzero(nz).astype(np.int64), _I64),
                "n_target": pa.array(out["n_target"][nz].astype(np.int64), _I64),
                "n_raw": pa.array(out["n_raw"][nz].astype(np.int64), _I64),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_target", alias_name="n_target"), Sum("n_raw", alias_name="n_raw")
        )
        .to_pandas()  # bounded: ≤ DSIR_BUCKETS rows by construction
    )
    tgt = np.zeros(DSIR_BUCKETS, dtype=np.float64)
    raw = np.zeros(DSIR_BUCKETS, dtype=np.float64)
    b = hist["bucket"].to_numpy(dtype=np.int64)
    tgt[b] = hist["n_target"].to_numpy(dtype=np.float64)
    raw[b] = hist["n_raw"].to_numpy(dtype=np.float64)
    log_ratio = np.log((tgt + 1.0) / (tgt.sum() + DSIR_BUCKETS)) - np.log(
        (raw + 1.0) / (raw.sum() + DSIR_BUCKETS)
    )
    ratio_ref = ray.put(log_ratio)

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # _packed_keys concatenates per-text parts;
            # an empty parts list would raise in np.concatenate
            return pa.table(
                {"doc_id": pa.array([], _I64), "weight_micro": pa.array([], _I64)}
            )
        lr = ray.get(ratio_ref)
        lowered = pc.utf8_lower(pc.cast(batch.column("text"), pa.string())).to_pylist()
        n_tri, keys = _packed_keys(lowered)
        per_key = lr[_buckets(keys)]
        starts = np.concatenate(([0], np.cumsum(n_tri)))[:-1].astype(np.int64)
        w = np.zeros(len(lowered), dtype=np.float64)
        has = n_tri > 0
        if per_key.size:
            # reduceat over NON-EMPTY docs' starts only: they strictly
            # increase and partition per_key exactly (an empty doc's
            # start equals its successor's and would otherwise truncate
            # the PRECEDING doc's segment via index clipping)
            w[has] = np.add.reduceat(per_key, starts[has])
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "weight_micro": pa.array(
                    np.floor(w * 1e6).astype(np.int64), _I64
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# collocation mining (word-bigram counts + unigram margins)
# ---------------------------------------------------------------------------

COLLOC_TOKEN_RE2 = r"[\p{L}\p{N}_]+"  # word tokens only (no symbol tokens)
COLLOC_TOPK = 40


def q_collocations(sf_dir: str):
    """Collocation mining: the ``COLLOC_TOPK`` most frequent adjacent
    word bigrams corpus-wide, each with its count and both unigram
    margins — the exact-integer inputs to PMI/log-likelihood scoring
    (the float PMI itself is consumer-side by design: ``np.log`` vs SQL
    ``ln`` can differ in the last ulp and flip a rank, so no float ever
    crosses the engine boundary; see ADVICE on q_tfidf_topk).  Bigrams
    never cross document boundaries.

    Scale shape — two passes, both pre-aggregated before their shuffle:
      1. bigram pass: per-doc C-level ``findall`` (one call per doc,
         not per token), pandas combiner per batch, bigrams packed into
         ONE string key (``"w1 w2"`` — tokens cannot contain a space) so
         the groupby rides Ray's
         vectorized single-key Sum path (multi-key near-unique groups
         are the q_shingle pathology); global sort + limit keeps
         ``COLLOC_TOPK`` rows.
      2. margin pass: only the ≤2k distinct words of the winning
         bigrams are needed — broadcast them (``ray.put`` of a tiny
         set, the SMALL side) and count their corpus-wide unigram
         occurrences with an np.isin filter before the (tiny) groupby.
    Driver holds only the k winners + their word margins."""
    import regex as _re

    import pandas as pd

    creg = _re.compile(COLLOC_TOKEN_RE2)

    def bigram_partial(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch.column("text")).to_pylist()
        w1: list[str] = []
        w2: list[str] = []
        for t in lowered:
            toks = creg.findall(t or "")
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        if not w1:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "partial": pa.array([], _I64)}
            )
        # separator is a space: tokens are [\p{L}\p{N}_]+ so it cannot
        # collide, and unlike "\x00" numpy unicode arrays preserve it
        key = np.char.add(
            np.char.add(np.asarray(w1, dtype=np.str_), " "),
            np.asarray(w2, dtype=np.str_),
        )
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(uniq.tolist(), pa.string()),
                "partial": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    top = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("partial", alias_name="n_xy"))
        .sort(["n_xy", "bigram"], descending=[True, False])
        .limit(COLLOC_TOPK)
        .to_pandas()
    )
    split = top["bigram"].str.split(" ", expand=True)
    top["w1"], top["w2"] = split[0], split[1]

    needed = sorted(set(top["w1"]) | set(top["w2"]))
    needed_ref = ray.put(np.asarray(needed, dtype=object))

    def unigram_partial(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        lowered = pc.utf8_lower(batch.column("text")).to_pylist()
        toks = creg.findall("\n".join(t or "" for t in lowered))
        if not toks:
            return pa.table(
                {"w": pa.array([], pa.string()), "partial": pa.array([], _I64)}
            )
        arr = np.asarray(toks, dtype=object)
        arr = arr[np.isin(arr, want)]
        uniq, cnt = np.unique(arr, return_counts=True)
        return pa.table(
            {
                "w": pa.array(uniq.tolist(), pa.string()),
                "partial": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    margins = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("partial", alias_name="nw"))
        .to_pandas()
    )
    nw = dict(zip(margins["w"], margins["nw"]))
    top["n_x"] = top["w1"].map(nw).astype("int64")
    top["n_y"] = top["w2"].map(nw).astype("int64")
    top["n_xy"] = top["n_xy"].astype("int64")
    out = top.sort_values(
        ["n_xy", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
    ).reset_index(drop=True)
    return out[["w1", "w2", "n_xy", "n_x", "n_y"]]


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, public) — the
# word-level rule family: word-count bounds, mean-word-length bounds,
# symbol-to-word ratio, alphabetic-word fraction, stop-word presence.
# (The line-level rules — bullet/ellipsis line fractions — live on the
# pages table via q_paragraph_filter's C4 line profile; the documents
# table is single-line by construction.)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_MIN_MILLI = 3_000  # mean word length in [3, 10] chars
GOPHER_MWL_MAX_MILLI = 10_000
GOPHER_MAX_SYMBOL_MILLI = 100  # (# + ellipsis) per word <= 0.1
GOPHER_MIN_ALPHA_MILLI = 800  # >=80% of words contain a letter
GOPHER_MIN_STOP_HITS = 2  # >=2 hits of the 8-word stop list
GOPHER_STOP_RE2 = r"\b(?:the|a|of|to|and|in|is|on)\b"
GOPHER_ALPHA_WORD_RE2 = r"\S*[A-Za-z]\S*"
GOPHER_ELLIPSIS_RE2 = r"\.\.\."
# first-failure order decides drop_reason — fixed, mirrored in the SQL
GOPHER_RULE_ORDER = ("n_words", "mean_word_len", "symbol_ratio", "alpha_words", "stop_words")


def gopher_rule_flags(
    nw: np.ndarray, mwl: np.ndarray, symm: np.ndarray, alpham: np.ndarray, stop: np.ndarray
) -> dict:
    """Per-rule pass flags from the five integer features — the ONE
    place the thresholds are applied (q_gopher_rules emits them,
    q_rule_ablation attributes drops to them; a threshold change cannot
    diverge the two)."""
    return {
        "n_words": (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS),
        "mean_word_len": (mwl >= GOPHER_MWL_MIN_MILLI) & (mwl <= GOPHER_MWL_MAX_MILLI),
        "symbol_ratio": symm <= GOPHER_MAX_SYMBOL_MILLI,
        "alpha_words": alpham >= GOPHER_MIN_ALPHA_MILLI,
        "stop_words": stop >= GOPHER_MIN_STOP_HITS,
    }


def q_gopher_rules(sf_dir: str):
    """Gopher word-level quality rules over documents: per-doc rule
    features (integer-milli quantized so both engines do exact int64
    math), conjunctive ``keep`` and the FIRST failing rule as
    ``drop_reason``.  Entirely row-local (one streaming map, no
    shuffle); every feature is one RE2 kernel over the batch — the
    DuckDB oracle runs the very same patterns through its own RE2."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text"), pa.string())
        low = pc.utf8_lower(text)
        nw = np.asarray(pc.count_substring_regex(text, r"\S+"), dtype=np.int64)
        wchars = np.asarray(
            pc.subtract(
                pc.utf8_length(text), pc.count_substring_regex(text, r"\s")
            ),
            dtype=np.int64,
        )
        alphaw = np.asarray(
            pc.count_substring_regex(text, GOPHER_ALPHA_WORD_RE2), dtype=np.int64
        )
        stop = np.asarray(pc.count_substring_regex(low, GOPHER_STOP_RE2), dtype=np.int64)
        sym = np.asarray(pc.count_substring(text, pattern="#"), dtype=np.int64) + np.asarray(
            pc.count_substring_regex(text, GOPHER_ELLIPSIS_RE2), dtype=np.int64
        )
        nz = np.maximum(nw, 1)  # zero-word docs fail the n_words rule anyway
        mwl = wchars * 1000 // nz
        alpham = alphaw * 1000 // nz
        symm = sym * 1000 // nz
        rules = gopher_rule_flags(nw, mwl, symm, alpham, stop)
        keep = np.ones(len(nw), dtype=bool)
        reason = np.full(len(nw), "", dtype=object)
        for name in reversed(GOPHER_RULE_ORDER):  # earliest failure wins
            keep &= rules[name]
            reason = np.where(rules[name], reason, name)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "n_words": pa.array(nw, _I64),
                "mean_word_len_milli": pa.array(mwl, _I64),
                "symbol_milli": pa.array(symm, _I64),
                "alpha_milli": pa.array(alpham, _I64),
                "stop_hits": pa.array(stop, _I64),
                "keep": pa.array(keep),
                "drop_reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


# Gopher repetition-rule thresholds (Rae et al. 2021 Table A1, integer
# milli): top-{2,3,4}-gram thresholds are Gopher's 0.20/0.18/0.16 char
# fractions; the duplicate-gram family is represented by the bigram
# INSTANCE fraction at Gopher's 0.15 duplicate-gram level (the synthetic
# corpus has no duplicate ≥5-grams, so the bigram variant carries the
# signal; the kernel is n-generic).
REP_TOP2_MAX_MILLI = 200
REP_TOP3_MAX_MILLI = 180
REP_TOP4_MAX_MILLI = 160
REP_DUP2_MAX_MILLI = 150
REP_RULE_ORDER = ("top2", "top3", "top4", "dup2")

_REP_MIX = np.uint64(0x9E3779B97F4A7C15)


def q_repetition_rules(sf_dir: str):
    """Gopher REPETITION rule family (the filter companion of the
    count-fraction signals in ``q_repetition`` and the word-level rules
    in ``q_gopher_rules``): per doc, the fraction of word characters
    contained in the most frequent word {2,3,4}-gram (count × gram
    chars / total word chars) and the fraction of bigram instances that
    are duplicates — integer-milli quantized, conjunctive ``keep``,
    first failing rule as ``drop_reason``.

    Row-local and fully vectorized: ONE Arrow split per batch flattens
    every word of every doc; n-gram keys are rolling 64-bit combines of
    the vectorized word hashes (functions/strhash.hash64 — short-string
    inputs, within its documented memory envelope) and per-(doc, gram)
    counts come from one lexsort + run-length pass.  No shuffle; the
    DuckDB oracle builds the same grams with list lambdas and the same
    int64 milli math."""
    from textpipe_ray.functions.strhash import hash64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(batch: pa.Table) -> pa.Table:
        D = len(batch)
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        text = pc.cast(batch.column("text"), pa.string())
        wl = pc.split_pattern(text, " ")
        flat = pc.list_flatten(wl).combine_chunks()
        lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        # NULL text → null list: list_flatten DROPS null lists, so a
        # fill_null(0) length keeps doc_idx aligned with flat (a raw
        # int64 cast of the null length would yield INT64_MIN and blow
        # up np.repeat); the doc then has zero words → all-zero millis
        # and keep=true, matching the oracle's coalesce(...,0) math
        counts = np.asarray(pc.fill_null(pc.list_value_length(wl), 0), dtype=np.int64)
        off = np.zeros(D + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        doc_idx = np.repeat(np.arange(D, dtype=np.int64), counts)
        # exact: word lengths are small ints, float64 sums are exact far
        # beyond any document size
        wchars = np.bincount(doc_idx, weights=lens, minlength=D).astype(np.int64)
        denom = np.maximum(wchars, 1)
        h = hash64(flat) if len(flat) else np.empty(0, dtype=np.uint64)
        N = len(flat)
        cols = {"doc_id": pa.array(ids, _I64)}
        milli = {}
        for n in (2, 3, 4):
            if N >= n:
                pos_in_doc = np.arange(N, dtype=np.int64) - off[doc_idx]
                vpos = np.flatnonzero(pos_in_doc <= counts[doc_idx] - n)
            else:
                vpos = np.empty(0, dtype=np.int64)
            key = np.zeros(len(vpos), dtype=np.uint64)
            glen = np.zeros(len(vpos), dtype=np.int64)
            with np.errstate(over="ignore"):
                for j in range(n):
                    key = key * _REP_MIX + h[vpos + j]
                    glen += lens[vpos + j]
            d = doc_idx[vpos]
            order = np.lexsort((key, d))
            d, key, glen = d[order], key[order], glen[order]
            new = np.ones(len(d), dtype=bool)
            new[1:] = (d[1:] != d[:-1]) | (key[1:] != key[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(d)))
            contrib = cnt * glen[starts]
            # runs are grouped by doc (lexsort's primary key), so per-doc
            # max/sum are contiguous-segment reduceats — not ufunc.at's
            # per-element scalar dispatch
            drun = d[starts]
            best = np.zeros(D, dtype=np.int64)
            if len(drun):
                doc_new = np.ones(len(drun), dtype=bool)
                doc_new[1:] = drun[1:] != drun[:-1]
                doc_starts = np.flatnonzero(doc_new)
                best[drun[doc_starts]] = np.maximum.reduceat(contrib, doc_starts)
            milli[f"top{n}"] = best * 1000 // denom
            if n == 2:
                inst = np.bincount(doc_idx[vpos], minlength=D).astype(np.int64)
                dup = np.zeros(D, dtype=np.int64)
                if len(drun):
                    dup[drun[doc_starts]] = np.add.reduceat(
                        np.where(cnt >= 2, cnt, 0), doc_starts
                    )
                milli["dup2"] = dup * 1000 // np.maximum(inst, 1)
        rules = {
            "top2": milli["top2"] <= REP_TOP2_MAX_MILLI,
            "top3": milli["top3"] <= REP_TOP3_MAX_MILLI,
            "top4": milli["top4"] <= REP_TOP4_MAX_MILLI,
            "dup2": milli["dup2"] <= REP_DUP2_MAX_MILLI,
        }
        keep = np.ones(D, dtype=bool)
        reason = np.full(D, "", dtype=object)
        for name in reversed(REP_RULE_ORDER):  # earliest failure wins
            keep &= rules[name]
            reason = np.where(rules[name], reason, name)
        for name in ("top2", "top3", "top4", "dup2"):
            cols[name + "_milli"] = pa.array(milli[name], _I64)
        cols["keep"] = pa.array(keep)
        cols["drop_reason"] = pa.array(reason.tolist(), pa.string())
        return pa.table(cols)

    return ds.map_batches(feats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CCNet-style per-PARAGRAPH perplexity filtering (Wenzek et al. 2020 —
# the paragraph-level companion of q_ppl_buckets' doc-level tertiles):
# drop high-perplexity paragraphs, reassemble pages from the survivors.
# ---------------------------------------------------------------------------

PARA_PPL_MAX_CENTI = 1100  # ≈ p90 of the synthetic corpus's paragraphs


class ParaPplStage:
    """Actor-pool stage: char-LM loaded once per actor in ``__init__``;
    per batch, ALL paragraphs of all pages score in one
    ``perplexity_many`` call (per-doc sums are reduceat segments, so
    scores are independent of batch/block grouping — the same
    bit-stability argument as q_ppl_buckets, quantized to centi)."""

    def __init__(self):
        from textpipe_ray.functions.perplexity import PerplexityModel

        self.model = PerplexityModel.load()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textpipe_ray.functions.clean import html_paragraphs_flat

        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist()
        paras, offsets = html_paragraphs_flat(batch.column("html").to_pylist())
        counts = np.diff(np.asarray(offsets, dtype=np.int64))
        plangs = [
            lg or "en" for lg, n in zip(langs, counts) for _ in range(int(n))
        ]
        if paras:
            centi = np.floor(self.model.perplexity_many(paras, plangs) * 100).astype(
                np.int64
            )
        else:
            centi = np.zeros(0, dtype=np.int64)
        keep = centi <= PARA_PPL_MAX_CENTI
        n_paras, n_kept, kept_text, mean_kept = [], [], [], []
        for i in range(len(urls)):
            lo, hi = offsets[i], offsets[i + 1]
            k = keep[lo:hi]
            kept = [paras[j] for j in range(lo, hi) if keep[j]]
            n_paras.append(hi - lo)
            n_kept.append(len(kept))
            kept_text.append("\n".join(kept))
            # integer mean: exact and engine-independent
            mean_kept.append(int(centi[lo:hi][k].sum()) // len(kept) if kept else 0)
        return pa.table(
            {
                "url": batch.column("url"),
                "n_paras": pa.array(n_paras, _I64),
                "n_kept_paras": pa.array(n_kept, _I64),
                "mean_kept_ppl_centi": pa.array(mean_kept, _I64),
                "filtered_text": pa.array(kept_text, pa.string()),
            }
        )


def q_para_ppl(sf_dir: str):
    """Per-paragraph perplexity filter over the pages table: row-local
    (no shuffle), model in actor ``__init__``, one batched LM pass per
    batch regardless of paragraph count."""
    import glob as _glob

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html", "lang"]
    )
    # no ordering finisher: the driver/golden compare is order-
    # insensitive, and a global sort here would be a gratuitous
    # all-to-all on an otherwise fully row-local pipeline
    return ds.map_batches(
        ParaPplStage, concurrency=(2, 16), batch_size=128, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted MinHash-LSH index — the daily-
# snapshot path: only the NEW documents are shingled/minhashed; the old
# corpus contributes its committed index parquet (stages/dedup.py
# write_minhash_index / near_dup_against_index).
# ---------------------------------------------------------------------------


def q_incremental_dedup(sf_dir: str, index_path: str | None = None):
    """Split documents deterministically (even doc_id = the indexed
    corpus, odd = the new snapshot), persist the even half's LSH index,
    and report the new snapshot's near-dup pairs AGAINST the index —
    the old corpus is never re-shingled.  jaccard_est is k/128
    (signature agreement over 128 perms — exactly representable, so
    golden-stable).  Index build + query both stream; exchanges are the
    bucket-partitioned band join only.

    ``index_path`` is where the persisted index lives.  On a multi-node
    cluster this MUST be a SHARED FILESYSTEM mount (NFS/Lustre/gcsfuse):
    index shards are written by tasks on every node, and a node-local
    path would leave each node holding only its own shards.  Raw
    object-store URIs are NOT supported — the generational commit
    protocol needs POSIX semantics (atomic ``os.replace`` for the meta
    marker, ``glob`` for generation listing, ``rmtree`` for stale-dir
    cleanup); mount the bucket instead of passing ``s3://``.  When
    omitted
    (the single-node test/driver path) a temp dir under ``/tmp`` is
    used and removed after the result materializes."""
    import shutil as _sh
    import tempfile as _tf

    from textpipe_ray.stages.dedup import near_dup_against_index, write_minhash_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def even(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(d % 2 == 0))

    def odd(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(d % 2 == 1))

    idx_dir = index_path or _tf.mkdtemp(prefix="textpipe_ray_minhash_idx_")
    kw = dict(num_bands=16, shingle_size=5)
    # bucket/partition counts proportional to the input: at test scale
    # 32×32 hive buckets are pure fixed overhead (small files + empty
    # exchanges); at corpus scale callers pass the defaults
    nb = 8
    try:
        write_minhash_index(
            ds.map_batches(even, batch_format="pyarrow"), idx_dir, num_buckets=nb, **kw
        )
        pairs = near_dup_against_index(
            ds.map_batches(odd, batch_format="pyarrow"),
            idx_dir,
            threshold=0.7,
            num_parts=nb,
            **kw,
        )

        def quantize(batch: pa.Table) -> pa.Table:
            j = np.asarray(batch.column("jaccard_est"), dtype=np.float64)
            return pa.table(
                {
                    "new_id": pc.cast(batch.column("new_id"), _I64),
                    "index_id": pc.cast(batch.column("index_id"), _I64),
                    # k/128 is exact in float64; scale to an int column so the
                    # golden compare is integer-only
                    "jaccard_x128": pa.array(np.round(j * 128).astype(np.int64), _I64),
                }
            )

        # materialize before the temp index dir is removed (the lazy plan
        # reads the index parquet during execution)
        out = (
            pairs.map_batches(quantize, batch_format="pyarrow")
            .sort(["new_id", "index_id"])
            .materialize()
        )
    finally:
        if index_path is None:
            _sh.rmtree(idx_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Bloom-filter cross-snapshot exact dedup — the constant-memory
# complement of q_incremental_dedup's persisted parquet index: the
# indexed corpus is distilled to ONE bitmap (10 bits/key), broadcast
# once, and the new snapshot scans row-locally with zero exchanges.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 22  # 512 KiB bitmap; ~10+ bits/key at test scales
BLOOM_K = 6


def q_bloom_dedup(sf_dir: str):
    """DCLM-style Bloom dedup of a new crawl snapshot against an
    already-ingested corpus, over the EXTRACTED pages (even url-id =
    indexed corpus, odd = new snapshot; the pages table plants
    byte-identical template families across the split): build the
    filter over the even half's cleaned-text hashes (one constant-size
    bitmap partial per batch, OR-folded in a worker task), broadcast
    it, scan the odd half row-locally.  Zero false negatives by
    construction (every true exact dup is flagged — tested against the
    DuckDB ground truth); false positives are bounded by the
    10+-bits/key sizing and are part of the deterministic output
    (golden-checked).  Scale: the filter is the ONLY shared state — m
    grows with the indexed corpus, the scan never exchanges."""
    import glob as _glob

    from textpipe_ray.stages.dedup import bloom_scan, build_bloom
    from textpipe_ray.stages.text import clean_batch

    pages = pages_dir_for(sf_dir)

    # in production the indexed corpus and the new snapshot are separate
    # inputs; the even/odd url-id split here stands in for that — parity
    # is filtered from the URL BEFORE extraction, so each branch parses
    # only its own half (no page is extracted twice, nothing shared
    # between the two jobs except the 512 KiB filter bitmap)
    def half(parity: int):
        def pre(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                [int(u.rsplit("/", 1)[1]) for u in batch.column("url").to_pylist()],
                dtype=np.int64,
            )
            batch = batch.filter(pa.array(ids % 2 == parity))
            out = clean_batch(batch)
            return pa.table(
                {
                    "doc_id": pa.array(ids[ids % 2 == parity], _I64),
                    "text": out.column("clean"),
                }
            )

        return ray.data.read_parquet(
            sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html"]
        ).map_batches(pre, batch_format="pyarrow")

    bloom_ref = build_bloom(half(0), m_bits=BLOOM_M_BITS, k=BLOOM_K)
    return bloom_scan(half(1), bloom_ref, m_bits=BLOOM_M_BITS, k=BLOOM_K)


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (Sennrich et al. 2016) — the
# tokenizer-prep layer next to q_char_coverage: BPE learns from the
# WORD-TYPE frequency table, so the corpus-sized work is one
# combiner-bounded word count; the merge loop runs on the bounded top-V
# type table on the driver; applying the tokenizer is row-local.
# ---------------------------------------------------------------------------

BPE_NUM_MERGES = 48
BPE_TOP_WORDS = 10_000  # merge-table training vocabulary cap (bounded driver work)


def _word_types(sf_dir: str):
    """Distributed word-TYPE count table — the combiner-bounded
    exchange (distinct types × blocks, never token instances) shared by
    the BPE and unigram tokenizer trainers.  Returns ``(types, creg)``:
    the materialized (word, n) Dataset and the compiled word regex."""
    import regex as _re

    from textpipe_ray.functions.quality import RE2_PATTERNS

    creg = _re.compile(RE2_PATTERNS["nwords"])
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        c: dict = _Counter()
        for t in pc.utf8_lower(batch.column("text")).to_pylist():
            c.update(creg.findall(t or ""))
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([c[w] for w in words], _I64),
            }
        )

    types = (
        ds.map_batches(wc_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # types-sized; reused for learn + encode passes
    )
    return types, creg


def _bpe_word_types(sf_dir: str):
    """Shared trainer front half for :func:`q_bpe_train` and
    :func:`q_vocab_coverage` — the two MUST stay in lockstep (same token
    regex, same lowering, same (count desc, word asc) tie-break, same
    merge count) or the coverage QA stops measuring the tokenizer the
    trainer actually produces.  Returns ``(types, ranks_ref, creg)``:
    the materialized word-type count table (types-sized, reusable for
    encode passes), the broadcast merge-rank dict learned from its top
    ``BPE_TOP_WORDS`` types, and the compiled word regex."""
    from textpipe_ray.functions.bpe import learn_bpe

    types, creg = _word_types(sf_dir)
    top = types.sort(["n", "word"], descending=[True, False]).limit(BPE_TOP_WORDS).take_all()
    merges = learn_bpe([(r["word"], r["n"]) for r in top], BPE_NUM_MERGES)
    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    return types, ranks_ref, creg


def q_bpe_train(sf_dir: str):
    """Train a BPE tokenizer on the corpus and apply it: per-document
    whitespace-word and BPE-token counts under the learned merges.

    Physical plan: (1) per-batch word-count combiner → ``groupby(word)``
    — the exchange moves distinct word TYPES × blocks, never token
    instances; (2) exact top-V types by (count desc, word asc) — the
    sort runs over the type table, not the corpus; (3) the driver
    learns ≤``BPE_NUM_MERGES`` merges from the bounded type table
    (deterministic tie-breaks, functions/bpe.py) — the k-means-on-a-
    sample idiom, except BPE-from-type-frequencies is EXACT Sennrich
    semantics, not an approximation; (4) the merge-rank table
    broadcasts once (``ray.put``) and every batch encodes its own docs
    with a per-batch distinct-word cache.  Golden-oracle value-checked
    (the merge learning is not SQL-expressible)."""
    from textpipe_ray.functions.bpe import token_count

    _, ranks_ref, creg = _bpe_word_types(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        cache: dict[str, int] = {}
        n_words, n_bpe = [], []
        for t in pc.utf8_lower(batch.column("text")).to_pylist():
            ws = creg.findall(t or "")
            n_words.append(len(ws))
            total = 0
            for w in ws:
                k = cache.get(w)
                if k is None:
                    k = cache[w] = token_count(w, ranks)
                total += k
            n_bpe.append(total)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "n_words": pa.array(n_words, _I64),
                "n_bpe_tokens": pa.array(n_bpe, _I64),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token sketch — the APPROXIMATE companion of
# q_distinct_tokens for cardinalities where the exact (lang, token)
# exchange is too wide (10^9+ distinct tokens): the exchange carries one
# 4 KiB register row per (lang, batch) regardless of corpus size, and
# register-max merging is order-independent, so the estimate is exactly
# deterministic (golden-stable) under any batching/block order.
# ---------------------------------------------------------------------------

HLL_P = 12  # 4096 registers → σ ≈ 1.04/√4096 ≈ 1.6% relative error

# 16-bit bit_length lookup table — pure constant, built once at import
# (was rebuilt per batch per language: a Python loop + 512 KiB alloc in
# every q_distinct_sketch partial() call)
_BITLEN16 = np.zeros(1 << 16, dtype=np.int64)
for _b in range(1, 17):
    _BITLEN16[(1 << (_b - 1)) : (1 << _b)] = _b
del _b


def _hll_registers(hashes: np.ndarray) -> np.ndarray:
    """uint64 hashes → 4096 uint8 register maxima (rank = leading-zero
    count of the low 52 bits + 1, capped at 52+1)."""
    m = 1 << HLL_P
    reg = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return reg
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = hashes << np.uint64(HLL_P)  # low bits shifted up; zeros shift in
    # leading-zero count of w via bit_length: lz = 64 - bit_length(w)
    # (w == 0 → the whole 52-bit window is zeros)
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    # vectorized bit_length via log2 is float-unsafe near 2^53; use a
    # 16-bit table over the top bits instead (exact integer path)
    top16 = (w >> np.uint64(48)).astype(np.int64)
    mid16 = ((w >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)
    lo32 = (w & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    tbl = _BITLEN16
    bl = np.where(
        top16 > 0,
        48 + tbl[top16],
        np.where(
            mid16 > 0,
            32 + tbl[mid16],
            np.where(
                lo32 >> np.uint64(16) > 0,
                16 + tbl[(lo32 >> np.uint64(16)).astype(np.int64)],
                tbl[(lo32 & np.uint64(0xFFFF)).astype(np.int64)],
            ),
        ),
    )
    rank = np.where(nz, 64 - bl, 64 - HLL_P) + 1
    rank = np.minimum(rank, 64 - HLL_P + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _hll_estimate(reg: np.ndarray) -> int:
    """Standard HLL estimator with the small-range (linear counting)
    correction; floor to int64 — all inputs are exact, so the float
    arithmetic is identical everywhere."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return int(np.floor(e))


def q_distinct_sketch(sf_dir: str):
    """Per-language approximate distinct-token count via a 2^12-register
    HyperLogLog: per-batch partials are the register maxima (one list
    row per (lang, batch)), merged with an order-independent
    element-wise max — deterministic estimate, constant-size exchange."""
    from textpipe_ray.functions.quality import RE2_PATTERNS
    from textpipe_ray.functions.strhash import hash64_mixed

    import regex as _re

    creg = _re.compile(RE2_PATTERNS["nwords"])
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        texts = np.asarray(pc.utf8_lower(batch.column("text")).to_pylist(), dtype=object)
        uniq_langs, inv = np.unique(langs, return_inverse=True)
        out_lang, out_reg = [], []
        for li, lang in enumerate(uniq_langs):
            joined = "\n".join(t or "" for t in texts[inv == li])
            toks = np.unique(np.asarray(creg.findall(joined), dtype=object))
            # avalanched hash: HLL reads BIT PATTERNS (register index +
            # leading zeros), which the raw polynomial hash doesn't mix
            h = hash64_mixed(pa.array(toks.tolist(), pa.string()))
            out_lang.append(str(lang))
            out_reg.append(_hll_registers(h).tolist())
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "reg": pa.array(out_reg, pa.list_(pa.uint8())),
            }
        )

    import pandas as pd

    def merge(group: pd.DataFrame) -> pa.Table:
        regs = np.stack([np.asarray(r, dtype=np.uint8) for r in group["reg"]])
        merged = regs.max(axis=0)
        return pa.table(
            {
                "lang": pa.array([group["lang"].iloc[0]], pa.string()),
                "distinct_est": pa.array([_hll_estimate(merged)], _I64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
        .sort("lang")
    )


# heavy-hitter threshold φ = NUM/DEN of all paragraph occurrences
HH_PHI_NUM = 1
HH_PHI_DEN = 1000


def q_heavy_hitters(sf_dir: str):
    """Frequent-paragraph (boilerplate) detection via a Count-Min
    Sketch + candidate-verify — the third member of the sketch family
    (HLL cardinality in :func:`q_distinct_sketch`, bottom-k quantiles
    in :func:`q_quantile_sketch`, CMS frequencies here): every
    paragraph whose corpus-wide occurrence count is ≥ φ·N (φ =
    ``HH_PHI_NUM/HH_PHI_DEN``) over the pages table, with both its
    EXACT count and its CMS estimate.  This is the scale shape for
    frequency analyses like :func:`q_boilerplate_dedup`'s count pass
    when the distinct-paragraph table itself is too large to exchange
    (conceptually — the two keep separate hash keys): the CMS pass
    moves only constant-size sketch rows no matter how many distinct
    paragraphs exist.

    Scale shape — two streaming passes, every exchange bounded by the
    ANSWER size, not the corpus:

    1. sketch pass: each batch's paragraph counts fold into a dense
       partial CMS shipped as ``depth`` list rows (the
       :func:`q_distinct_sketch` register idiom — per-block exchange
       size is constant in BOTH the item count and the sketch width,
       so width can be generous; functions/cms.py) plus the batch's
       LOCAL heavy hitters (≤ ``HH_PHI_DEN/HH_PHI_NUM`` rows per
       block by construction — an item with local share ≥ φ caps at
       1/φ items).  No groupby: the pigeonhole guarantee makes the
       local-heavy union a SUPERSET of the true heavy hitters (if
       cnt_b < φ·n_b in every block then Σcnt_b < φ·N), so no true
       heavy hitter can be missed regardless of block layout.  The
       candidate union (up to 1/φ DISTINCT items per block) can grow
       with the corpus, so the partial rows MATERIALIZE (tiny: depth
       list rows + ≤1/φ candidates per block) and their measured
       count picks the collect strategy — Ray's dynamic block
       splitting makes the invocation count corpus-dependent, so no
       static bound exists.  Past ``collect_bound`` rows the sketch
       merges via a tree-reducing ``Dataset.aggregate`` and candidates prune
       DISTRIBUTED against the broadcast sketch — only candidates
       whose upper-bound estimate is ≥ φ·N ever reach the driver: by
       the CMS guarantee (error ≤ εN with ε = e/width at probability
       1-e^-depth per item; ε = e/8192 ≪ φ here) that is ~1/(φ-ε)
       items in expectation, answer-sized and independent of block
       count.  Below the bound one direct ``take_all`` of the
       materialized rows skips the extra jobs (the
       ``near_dup_minhash`` auto-select idiom); both paths are
       asserted identical in tests/test_heavy_hitters.py.
    2. verify pass: exact counts of the surviving candidates only —
       broadcast sorted candidate hashes, vectorized ``np.isin`` per
       batch, one groupby whose exchange carries ≤ |candidates| rows
       per block.  The final filter on EXACT counts makes the output
       independent of batching (CMS false positives are dropped
       here), so the result is golden-checkable byte-for-byte.

    Recomputing paragraphs in pass 2 beats shuffling paragraph text
    (the :func:`q_boilerplate_dedup` argument).  Output: paragraph,
    exact cnt, cms_est (≥ cnt always), ordered by cnt desc."""
    return _heavy_hitters(sf_dir)


def _heavy_hitters(sf_dir: str, collect_bound: int = 4_000_000):
    from textpipe_ray.functions.clean import html_paragraphs_flat
    from textpipe_ray.functions.cms import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_dense,
        cms_estimate,
    )
    from textpipe_ray.functions.strhash import hash64_mixed_chunked

    import glob as _glob

    pages = pages_dir_for(sf_dir)
    files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))

    def _paras(htmls: list) -> tuple[list[str], np.ndarray]:
        paras, _ = html_paragraphs_flat(htmls)
        if not paras:
            return paras, np.zeros(0, dtype=np.int64)
        # vectorized 63-bit positive keys; chunked variant bounds
        # hash64's ~32 B/input-byte temporaries, which scale with the
        # TOTAL column bytes of a corpus-scale paragraph batch
        hashes = (
            hash64_mixed_chunked(pa.array(paras, pa.string())) >> np.uint64(1)
        ).astype(np.int64)
        return paras, hashes

    _schema = pa.schema(
        [
            ("kind", _I64),
            ("slot", _I64),
            ("text", pa.string()),
            ("regs", pa.list_(pa.int64())),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        paras, hashes = _paras(batch.column("html").to_pylist())
        if not len(hashes):
            return _schema.empty_table()
        uniq, first_idx, cnt = np.unique(
            hashes, return_index=True, return_counts=True
        )
        cnt = cnt.astype(np.int64)
        dense = cms_dense(uniq, cnt)  # (depth, width) int64
        # local heavy hitters: cnt_b·DEN ≥ n_b·NUM (exact integer φ test)
        loc = cnt * HH_PHI_DEN >= len(hashes) * HH_PHI_NUM
        n_cand = int(loc.sum())
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(CMS_DEPTH, np.int64), np.ones(n_cand, np.int64)]
                    ),
                    _I64,
                ),
                "slot": pa.array(
                    np.concatenate(
                        [np.arange(CMS_DEPTH, dtype=np.int64), uniq[loc]]
                    ),
                    _I64,
                ),
                "text": pa.array(
                    [""] * CMS_DEPTH + [paras[i] for i in first_idx[loc]],
                    pa.string(),
                ),
                "regs": pa.array(
                    list(dense) + [None] * n_cand, pa.list_(pa.int64())
                ),
            }
        )

    n_blocks = _cpus()
    # materialized so the TRUE row count (Ray's dynamic block splitting
    # makes the number of partial() invocations scale with corpus size,
    # so no static bound exists) decides the collect strategy, and both
    # downstream consumers read the same blocks without re-parsing
    partials = (
        ray.data.read_parquet(files, columns=["html"], override_num_blocks=n_blocks)
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    cand_text: dict[int, str] = {}
    est_by_h: dict[int, int] = {}
    if partials.count() <= collect_bound:
        # small partial table: one direct collect, merge + prune
        # driver-side — no exchange at all
        for r in partials.take_all():
            if r["kind"] == 0:
                cms[r["slot"]] += np.asarray(r["regs"], dtype=np.int64)
            else:
                cand_text.setdefault(r["slot"], r["text"])
        n_total = int(cms[0].sum())  # every occurrence hits row 0 once
        if cand_text:
            slots = np.array(sorted(cand_text), dtype=np.int64)
            ests = cms_estimate(cms, slots)
            keep = ests * HH_PHI_DEN >= n_total * HH_PHI_NUM
            est_by_h = dict(
                zip(slots[keep].tolist(), ests[keep].astype(int).tolist())
            )
            cand_text = {h: cand_text[h] for h in est_by_h}
    else:
        # corpus-scale: the sketch merges via a tree-reducing aggregate
        # (driver receives ONE (depth, width) array); candidates prune
        # DISTRIBUTED against the broadcast sketch, and only est ≥ φ·N
        # survivors (answer-sized by the CMS error bound) are collected
        from ray.data.aggregate import AggregateFn

        mat = partials

        def _acc_block(acc: np.ndarray, blk: pa.Table) -> np.ndarray:
            blk = blk.filter(pc.equal(blk.column("kind"), 0))
            if blk.num_rows:
                rows = np.stack(
                    [np.asarray(r, dtype=np.int64) for r in blk.column("regs").to_pylist()]
                )
                acc = acc.copy()
                np.add.at(acc, np.asarray(blk.column("slot"), dtype=np.int64), rows)
            return acc

        agg = AggregateFn(
            init=lambda *_: np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64),
            accumulate_block=_acc_block,
            merge=lambda a, b: a + b,
            name="cms",
        )
        cms = mat.aggregate(agg)["cms"]
        n_total = int(cms[0].sum())
        cms_ref = ray.put(cms)

        def prune(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.equal(batch.column("kind"), 1))
            h = np.asarray(batch.column("slot"), dtype=np.int64)
            est = cms_estimate(ray.get(cms_ref), h)
            keep = est * HH_PHI_DEN >= n_total * HH_PHI_NUM
            return pa.table(
                {
                    "slot": pa.array(h[keep], _I64),
                    "text": pc.take(
                        batch.column("text"), pa.array(np.nonzero(keep)[0])
                    ),
                    "est": pa.array(est[keep], _I64),
                }
            )

        # groupby dedupes survivors so the collect is answer-sized even
        # when a heavy hitter is locally heavy in every block
        for r in (
            mat.map_batches(prune, batch_format="pyarrow")
            .groupby("slot")
            .map_groups(lambda g: g.head(1), batch_format="pandas")
            .take_all()
        ):
            cand_text[r["slot"]] = r["text"]
            est_by_h[r["slot"]] = int(r["est"])
    ref = ray.put(np.array(sorted(cand_text), dtype=np.int64))

    def verify(batch: pa.Table) -> pa.Table:
        sel = ray.get(ref)
        _, hashes = _paras(batch.column("html").to_pylist())
        m = np.isin(hashes, sel) if len(hashes) else np.zeros(0, dtype=bool)
        uniq, cnt = np.unique(hashes[m], return_counts=True)
        return pa.table(
            {"h": pa.array(uniq, _I64), "cnt": pa.array(cnt.astype(np.int64), _I64)}
        )

    rows = (
        ray.data.read_parquet(files, columns=["html"], override_num_blocks=_cpus())
        .map_batches(verify, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    out = sorted(
        (
            (cand_text[r["h"]], int(r["cnt"]), est_by_h[r["h"]])
            for r in rows
            if r["cnt"] * HH_PHI_DEN >= n_total * HH_PHI_NUM
        ),
        key=lambda t: (-t[1], t[0]),
    )
    return pa.table(
        {
            "paragraph": pa.array([t[0] for t in out], pa.string()),
            "cnt": pa.array([t[1] for t in out], _I64),
            "cms_est": pa.array([t[2] for t in out], _I64),
        }
    )


# ---------------------------------------------------------------------------
# distributed classifier training (IRLS logistic regression)
# ---------------------------------------------------------------------------

CLF_QF = 1_000_000  # feature micro-quantization (floor(f * 1e6))
CLF_QG = 1_000_000_000  # per-row gradient/Hessian/loss quantization
CLF_ITERS = 6  # Newton steps (IRLS converges in ~5 on this problem)
CLF_RIDGE = 1e-2  # ridge on the standardized scale — bounds the Newton
#                   step if the rule labels happen to be separable


def _clf_sigmoid(z: np.ndarray) -> np.ndarray:
    """Overflow-stable logistic; identical op sequence in training and
    scoring so the learned boundary and the emitted probabilities come
    from the same floats."""
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _train_quality_classifier(feats, features: list[str]):
    """Distributed IRLS (Newton) logistic regression over a feature
    Dataset with columns ``{f}_micro`` (int64, floor(f·1e6)), ``y``
    (int8) and ``is_train`` (bool).

    Every per-iteration exchange is ONE small integer row per block:
    the per-row gradient / Hessian / log-loss contributions quantize to
    int64 (floor(x·1e9)) BEFORE any summation — the
    ``q_embedding_pca`` fixed-point idiom — so the accumulated
    sufficient statistics are exact integers, identical under any
    batching, block order or cluster size.  Block partials are summed
    on the driver as Python bigints (arbitrary precision), so the only
    int64 headroom needed is within one block: |row term| ≤ ~2e11 ×
    rows/block.  Returns ``(beta, losses, n_train)`` where ``beta`` is
    the (D+1,) coefficient vector on the STANDARDIZED scale with the
    intercept first, plus ``(mu, sd)`` to apply it to raw features.
    """
    D = len(features)

    def moments(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch.column("is_train"), dtype=bool)
        cols = [np.asarray(batch.column(f + "_micro"), dtype=np.int64)[mask] for f in features]
        s1 = [int(c.sum()) for c in cols]
        # second moment re-derives the float feature per row, squares
        # and re-quantizes per row (order-independent by construction)
        s2 = [int(np.floor((c / CLF_QF) ** 2 * 1000.0).astype(np.int64).sum()) for c in cols]
        return pa.table(
            {
                "n": pa.array([int(mask.sum())], _I64),
                "s1": pa.array([s1], pa.list_(pa.int64())),
                "s2": pa.array([s2], pa.list_(pa.int64())),
            }
        )

    parts = feats.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s1 = [sum(int(row[k]) for row in parts["s1"]) for k in range(D)]
    s2 = [sum(int(row[k]) for row in parts["s2"]) for k in range(D)]
    mu = np.array([s / CLF_QF / n for s in s1], dtype=np.float64)
    ex2 = np.array([s / 1000.0 / n for s in s2], dtype=np.float64)
    sd = np.sqrt(np.maximum(ex2 - mu * mu, 0.0))
    sd[sd == 0.0] = 1.0

    P = D + 1  # intercept first
    iu = np.triu_indices(P)

    beta = np.zeros(P, dtype=np.float64)
    losses: list[float] = []
    for _ in range(CLF_ITERS):
        beta_now = beta.copy()

        def partials(batch: pa.Table, beta_=beta_now) -> pa.Table:
            mask = np.asarray(batch.column("is_train"), dtype=bool)
            y = np.asarray(batch.column("y"), dtype=np.int64)[mask].astype(np.float64)
            Z = np.empty((int(mask.sum()), P), dtype=np.float64)
            Z[:, 0] = 1.0
            for k, f in enumerate(features):
                c = np.asarray(batch.column(f + "_micro"), dtype=np.int64)[mask]
                Z[:, k + 1] = (c / CLF_QF - mu[k]) / sd[k]
            z = Z @ beta_
            p = _clf_sigmoid(z)
            g = p - y
            # per-row quantization BEFORE the sums (exactness under any
            # block order); Hessian rows use only the upper triangle
            gq = np.floor(g[:, None] * Z * CLF_QG).astype(np.int64).sum(axis=0)
            w = p * (1.0 - p)
            hrow = w[:, None] * Z[:, iu[0]] * Z[:, iu[1]]
            hq = np.floor(hrow * CLF_QG).astype(np.int64).sum(axis=0)
            ll = np.maximum(z, 0.0) - z * y + np.log1p(np.exp(-np.abs(z)))
            lq = int(np.floor(ll * CLF_QG).astype(np.int64).sum())
            return pa.table(
                {
                    "g": pa.array([gq.tolist()], pa.list_(pa.int64())),
                    "h": pa.array([hq.tolist()], pa.list_(pa.int64())),
                    "l": pa.array([lq], _I64),
                }
            )

        agg = feats.map_batches(partials, batch_format="pyarrow").to_pandas()
        gsum = np.array(
            [sum(int(row[k]) for row in agg["g"]) for k in range(P)], dtype=np.float64
        )
        hsum = np.array(
            [sum(int(row[k]) for row in agg["h"]) for k in range(len(iu[0]))],
            dtype=np.float64,
        )
        losses.append(float(sum(int(v) for v in agg["l"]) / CLF_QG / n))
        gm = gsum / CLF_QG / n
        H = np.zeros((P, P), dtype=np.float64)
        H[iu] = hsum / CLF_QG / n
        H = H + np.triu(H, 1).T
        beta = beta - np.linalg.solve(
            H + CLF_RIDGE * np.eye(P), gm + CLF_RIDGE * beta
        )

    return beta, mu, sd, losses, n


def clf_featurize(batch: pa.Table) -> pa.Table:
    """The q_classifier_train feature pass (row-local): quality-rule
    features micro-quantized to int64, the rule teacher label, and a
    splitmix64 train/holdout split.  Module-level so the tests certify
    the EXACT featurization the shipped query runs."""
    from textpipe_ray.functions.quality_score import SCORE_FEATURES
    from textpipe_ray.stages.ann import _id_hash

    b = quality_batch(batch, text_col="text")
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    cols: dict = {"doc_id": pa.array(ids, _I64)}
    for f in SCORE_FEATURES:
        v = np.asarray(b.column(f), dtype=np.float64)
        cols[f + "_micro"] = pa.array(np.floor(v * CLF_QF).astype(np.int64), _I64)
    cols["y"] = pc.cast(b.column("keep"), pa.int8())
    cols["is_train"] = pa.array((_id_hash(ids) % np.uint64(2)) == 0)
    return pa.table(cols)


def q_classifier_train(sf_dir: str):
    """In-pipeline distributed training of the fasttext-style quality
    classifier (the CCNet / GPT-3 pattern: learn a linear model that
    imitates a trusted keep/drop signal, then score the whole corpus
    with one dot product).  The teacher here is the repo's own
    rule-based ``keep`` label; the committed
    ``models/quality_weights.json`` was distilled OFFLINE by the same
    recipe — this query makes the distillation itself a distributed,
    driver-checked operator.

    Scale shape:
      1. feature pass (row-local): ``quality_batch`` features
         micro-quantized to int64, plus the rule label and a
         splitmix64 ``doc_id`` train/holdout split; materialized —
         ~90 bytes/doc in the object store, spillable.  At 10^12 docs
         you'd bound this with a hash-uniform training sample (the
         ``_uniform_sample`` idiom) and keep inference streaming; the
         synthetic table IS the sample here.
      2. training: distributed IRLS — ``CLF_ITERS`` Newton steps, each
         one ``map_batches`` pass emitting a single ~530-byte integer
         row per block (per-row fixed-point gradient + Hessian
         partials, the ``q_embedding_pca`` idiom), solved 11×11 on the
         driver.  Bit-identical under any block order or cluster size.
      3. scoring pass (row-local) over ALL docs with the learned
         boundary: quantized probability, prediction, teacher label,
         split flag.  Golden-oracle value-checked (IRLS is not
         SQL-expressible)."""
    from textpipe_ray.functions.quality_score import SCORE_FEATURES

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    feats = ds.map_batches(clf_featurize, batch_format="pyarrow").materialize()
    beta, mu, sd, _losses, _n = _train_quality_classifier(feats, list(SCORE_FEATURES))
    model_ref = ray.put((beta, mu, sd))

    def score(batch: pa.Table) -> pa.Table:
        beta_, mu_, sd_ = ray.get(model_ref)
        P = len(beta_)
        Z = np.empty((len(batch), P), dtype=np.float64)
        Z[:, 0] = 1.0
        for k, f in enumerate(SCORE_FEATURES):
            c = np.asarray(batch.column(f + "_micro"), dtype=np.int64)
            Z[:, k + 1] = (c / CLF_QF - mu_[k]) / sd_[k]
        z = Z @ beta_
        p = _clf_sigmoid(z)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "prob_micro": pa.array(np.floor(p * CLF_QG).astype(np.int64), _I64),
                "pred": pa.array(z > 0.0),
                "keep": pc.cast(batch.column("y"), pa.bool_()),
                "is_train": batch.column("is_train"),
            }
        )

    return feats.map_batches(score, batch_format="pyarrow")


def trained_models_dir() -> str:
    """Where q_trained_models writes its model files — must be SHARED
    storage on a multi-node cluster (driver writes, worker processes
    read; same contract as the minhash-index / IVF paths).  Read from
    the environment at CALL time so overrides set after import still
    take effect."""
    import os as _os

    return _os.environ.get(
        "TEXTPIPE_TRAINED_MODELS_DIR", "/tmp/textpipe_ray_trained_models"
    )


def q_trained_models(sf_dir: str):
    """Trained statistical stand-ins for the reference's two
    model-backed operations (Entities / Categories — reference
    operation.py:203-224,430-448), end-to-end under one driver row:

    1. **Textcat (NB)**: multinomial Naive Bayes fit DISTRIBUTED over
       ``documents`` — per-batch token-count partials, one
       ``groupby(label, tok).sum`` whose exchange is ∝ distinct
       (label, token) pairs (the BPE word-TYPE-table pattern), a
       deterministic top-V vocabulary cut, and a driver-side
       closed-form fit on the ≤|labels|·V-row bounded count table
       (functions/textcat_nb.nb_fit — the fit is pure arithmetic on
       the reduced counts, so one process or a 256-node groupby give
       the same model).
    2. **NER**: one-vs-rest logistic span heads trained by the SAME
       distributed IRLS trainer as ``q_classifier_train``
       (integer-quantized partials — bit-identical under any block
       order) over the deterministic seed span corpus
       (functions/ner_tagger.make_span_corpus), features =
       hashed char n-grams + context + shape (NO name-list
       membership, so the model must generalise).
    3. Both models are WRITTEN AS MODEL FILES and applied through the
       Pipeline registry seam (``models=[(name, lang, path)]`` —
       the reference's custom-model mechanism, pipeline.py:54-60) via
       ``Categories`` over the documents and ``Entities`` over
       held-out eval sentences whose names training never saw.

    Output per doc: NB predicted label + posterior micro, the planted
    held-out entity's true label, the tagger's label for it ("MISS" if
    untagged), and the tagged-entity count.  Golden-oracle
    value-checked (model fits are not SQL-expressible).

    Multi-node contract: :func:`trained_models_dir` must point at SHARED storage
    on a real cluster (the model files are written by the driver and
    opened inside worker processes by the registry) — the same
    documented contract as the minhash index / IVF layout paths; the
    single-node default is /tmp."""
    import json as _json
    import os as _os
    from collections import Counter

    from textpipe_ray.functions.ner_tagger import (
        NER_DIM,
        NER_LABELS,
        eval_sentence_for,
        make_span_corpus,
        span_features,
    )
    from textpipe_ray.functions.textcat_nb import (
        NB_VOCAB_TOPK,
        TOKEN_RE,
        nb_fit,
    )
    from textpipe_ray.pipelines.spec import Pipeline
    from textpipe_ray.stages.dedup import _join_partitions

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).materialize()

    # ---- NB sufficient statistics (distributed) -------------------------
    def tok_counts(batch: pa.Table) -> pa.Table:
        # per-BATCH combiner keyed (label, token): the exchange into the
        # groupby is the batch's distinct pairs, not one row per
        # (doc, token) — common tokens collapse before they move
        agg: Counter = Counter()
        for lab, txt in zip(
            batch.column("lang").to_pylist(), batch.column("text").to_pylist()
        ):
            for t, n in Counter(TOKEN_RE.findall((txt or "").lower())).items():
                agg[(lab, t)] += n
        keys = sorted(agg)
        return pa.table(
            {
                "label": pa.array([k[0] for k in keys], pa.string()),
                "tok": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([agg[k] for k in keys], _I64),
            }
        )

    pairs = (
        ds.map_batches(tok_counts, batch_format="pyarrow")
        .groupby(["label", "tok"])
        .sum("n")
        .materialize()  # TYPE table: one row per distinct (label, token)
    )
    # top-V vocabulary by global count, (count desc, tok asc) total
    # order so the V-boundary cut is deterministic
    vocab = [
        r["tok"]
        for r in pairs.groupby("tok")
        .sum("sum(n)")
        .sort(["sum(sum(n))", "tok"], descending=[True, False])
        .limit(NB_VOCAB_TOPK)
        .take_all()
    ]
    vocab_arr = pa.array(sorted(vocab), pa.string())

    def keep_vocab(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("tok"), value_set=vocab_arr))

    # bounded collect: ≤ |labels|·V rows after the vocab filter
    pair_counts = {
        (r["label"], r["tok"]): int(r["sum(n)"])
        for r in pairs.map_batches(keep_vocab, batch_format="pyarrow").take_all()
    }
    label_docs = {
        r["lang"]: int(r["count()"]) for r in ds.groupby("lang").count().take_all()
    }
    nb_model = nb_fit(pair_counts, label_docs, vocab)

    # ---- NER heads via the distributed IRLS trainer ---------------------
    feat_names = [f"x{j}" for j in range(NER_DIM)]
    span_rows = [
        {"span": sp, "prev": pv, "next": nx, "label": lab}
        for sp, pv, nx, lab in make_span_corpus(held_out=False)
    ]
    span_ds = ray.data.from_items(span_rows).repartition(4)

    def featurize(batch: pa.Table) -> pa.Table:
        mats = np.stack(
            [
                span_features(s, p, n)
                for s, p, n in zip(
                    batch.column("span").to_pylist(),
                    batch.column("prev").to_pylist(),
                    batch.column("next").to_pylist(),
                )
            ]
        )
        cols: dict = {
            f + "_micro": pa.array(
                np.floor(mats[:, j] * CLF_QF).astype(np.int64), _I64
            )
            for j, f in enumerate(feat_names)
        }
        cols["label"] = batch.column("label")
        return pa.table(cols)

    feats0 = span_ds.map_batches(featurize, batch_format="pyarrow").materialize()

    def train_head(lb: str):
        def relabel(batch: pa.Table, lb=lb) -> pa.Table:
            y = pc.cast(pc.equal(batch.column("label"), lb), pa.int8())
            return batch.append_column("y", y).append_column(
                "is_train", pa.array([True] * len(batch))
            )

        return _train_quality_classifier(
            feats0.map_batches(relabel, batch_format="pyarrow"), feat_names
        )

    # the three one-vs-rest heads are independent; driver threads
    # interleave their 7 small Ray rounds each (~75 ms scheduling floor
    # per round on the tiny span table), cutting wall to ~one head's —
    # per-head arithmetic is unchanged, so the model is bit-identical
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(NER_LABELS)) as ex:
        head_results = list(ex.map(train_head, NER_LABELS))
    weights: dict[str, list[float]] = {}
    mu = sd = None
    for lb, (beta, mu, sd, _losses, _n) in zip(NER_LABELS, head_results):
        weights[lb] = [float(b) for b in beta]
    ner_model = {
        "type": "ner_tagger",
        "dim": NER_DIM,
        "labels": NER_LABELS,
        "weights": weights,
        "mu": [float(v) for v in mu],
        "sd": [float(v) for v in sd],
    }

    # ---- write both through the model-file seam (atomic rename) ---------
    models_dir = trained_models_dir()
    _os.makedirs(models_dir, exist_ok=True)
    disc = hashlib.md5(sf_dir.encode("utf8")).hexdigest()[:10]
    paths = {}
    for tag, obj in (("textcat_nb", nb_model), ("ner_tagger", ner_model)):
        path = f"{models_dir}/{tag}_{disc}.json"
        tmp = f"{path}.tmp.{_os.getpid()}"
        with open(tmp, "w", encoding="utf8") as f:
            _json.dump(obj, f, ensure_ascii=False, sort_keys=True)
        _os.replace(tmp, path)
        paths[tag] = path

    # ---- apply via Pipeline steps (the registry seam) -------------------
    pcat = Pipeline(
        [("CleanText", {}), ("Categories", {"model_name": "nbcat"})],
        models=[("nbcat", "*", paths["textcat_nb"])],
    )
    pner = Pipeline(
        [
            ("CleanText", {}),
            ("Entities", {"model_name": "nertag", "ent_attributes": ("text", "label_")}),
        ],
        models=[("nertag", "*", paths["ner_tagger"])],
    )

    def cat_out(batch: pa.Table) -> pa.Table:
        ids = []
        lab_out = []
        micro = []
        for did, cats in zip(
            batch.column("doc_id").to_pylist(), batch.column("Categories").to_pylist()
        ):
            best = max(cats, key=lambda kv: (kv[1], kv[0]))
            ids.append(did)
            lab_out.append(best[0])
            micro.append(int(np.floor(best[1] * 1e6)))
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "nb_label": pa.array(lab_out, pa.string()),
                "nb_micro": pa.array(micro, _I64),
            }
        )

    cats = pcat.transform(ds.select_columns(["doc_id", "text"])).map_batches(
        cat_out, batch_format="pyarrow"
    )

    def build_eval(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        sents, spans, labels_ = [], [], []
        for i in ids:
            s, sp, lb = eval_sentence_for(int(i))
            sents.append(s)
            spans.append(sp)
            labels_.append(lb)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "text": pa.array(sents, pa.string()),
                "planted": pa.array(spans, pa.string()),
                "true_label": pa.array(labels_, pa.string()),
            }
        )

    def ner_out(batch: pa.Table) -> pa.Table:
        tagged = []
        n_tagged = []
        for ents, span in zip(
            batch.column("Entities").to_pylist(), batch.column("planted").to_pylist()
        ):
            hit = next((lb for txt, lb in ents if txt == span), "MISS")
            tagged.append(hit)
            n_tagged.append(len(ents))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "true_label": batch.column("true_label"),
                "tagged_label": pa.array(tagged, pa.string()),
                "n_tagged": pa.array(n_tagged, _I64),
            }
        )

    ners = pner.transform(
        ds.select_columns(["doc_id"]).map_batches(build_eval, batch_format="pyarrow")
    ).map_batches(ner_out, batch_format="pyarrow")

    nparts = _join_partitions(8)
    return cats.repartition(nparts).join(
        ners.repartition(nparts),
        join_type="inner",
        num_partitions=nparts,
        on=("doc_id",),
    )


# ---------------------------------------------------------------------------
# Cross-run snapshot ingest loop: the production lifecycle of the
# persisted dedup state (MinHash index generations + Bloom filter)
# across successive crawl snapshots, end-to-end in one driver query.
# ---------------------------------------------------------------------------


def q_snapshot_loop(sf_dir: str, work_dir: str | None = None):
    """The full cross-RUN ingest loop a production crawl takes: snapshot
    0 bootstraps the persisted state (MinHash-LSH index generation 1 +
    Bloom filter saved to disk); each later snapshot then (a) LOADS the
    Bloom filter and scans row-locally for exact-dup candidates, (b)
    near-dups against the stored index (only the new snapshot is
    shingled), (c) APPENDS its signatures as a new index generation —
    band parameters come from the index's own meta — and (d) ORs its
    keys into the filter and saves it back; after the last snapshot the
    generations are COMPACTED into one.  Each snapshot's TEXT is read
    exactly once: the signature pass (:func:`compute_minhash_sigs`)
    carries the dedup key through (``keep_cols``), and the Bloom scan,
    hit count, Bloom build and both index jobs all run over that
    materialized ~1 KB/doc state table — at crawl scale the text is
    tens of KB/doc, so every structure after the first pass touches
    ~1-2% of the snapshot's bytes.

    This gives the state-lifecycle machinery (``append_minhash_index``,
    ``compact_minhash_index``, ``save_bloom``/``load_bloom``/
    ``merge_blooms``) a driver-checked row instead of pytest-only
    coverage.  Snapshots are ``doc_id % 3`` thirds of ``documents``;
    every exchanged/checked value is integer (jaccard_x128 = signature
    agreement k of 128), so the output is golden-stable.

    Output: one row per cross-snapshot near-dup pair ``(snapshot,
    new_id, index_id, jaccard_x128, snap_bloom_hits)`` —
    ``snap_bloom_hits`` (constant within a snapshot) is the snapshot's
    Bloom candidate count, tying the scan path into the value check.
    The filter keys on the 40-char text-prefix fingerprint (the
    ``q_fingerprint`` dedup key) rather than the full text: the
    documents table has zero byte-exact duplicates, so a full-text
    filter would report a vacuous constant 0 — the prefix key has real
    cross-snapshot membership at every test scale, making the count a
    live regression signal.  ``work_dir`` must be a shared filesystem
    on a cluster; omitted → temp dir, removed after materialize."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from textpipe_ray.stages.dedup import (
        append_minhash_index,
        bloom_scan,
        build_bloom,
        compact_minhash_index,
        compute_minhash_sigs,
        load_bloom,
        merge_blooms,
        near_dup_against_index,
        save_bloom,
        write_minhash_index,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def third(r: int):
        def f(batch: pa.Table) -> pa.Table:
            d = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.filter(pa.array(d % 3 == r))

        return ds.map_batches(f, batch_format="pyarrow")

    def with_key(snap_ds):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "key",
                pc.utf8_slice_codeunits(
                    pc.fill_null(pc.cast(batch.column("text"), pa.string()), ""), 0, 40
                ),
            )

        return snap_ds.map_batches(f, batch_format="pyarrow")

    root = work_dir or _tf.mkdtemp(prefix="textpipe_ray_snapshot_loop_")
    idx = _os.path.join(root, "minhash_idx")
    bloom_path = _os.path.join(root, "bloom.npz")
    SHINGLE, BANDS, BUCKETS = 5, 16, 8
    M_BITS, K = 1 << 20, 6

    try:
        # snapshot 0: bootstrap both persisted structures from ONE text
        # pass — the signature job carries the dedup key through
        # (keep_cols), so the Bloom build reads the ~1 KB/doc signature
        # table, never the text again
        sig0 = compute_minhash_sigs(
            with_key(third(0)), shingle_size=SHINGLE, keep_cols=["key"]
        ).materialize()
        write_minhash_index(
            None, idx, num_bands=BANDS, shingle_size=SHINGLE, num_buckets=BUCKETS,
            sig_ds=sig0.select_columns(["doc_id", "sig"]),
        )
        save_bloom(
            build_bloom(sig0, text_col="key", m_bits=M_BITS, k=K),
            bloom_path, M_BITS, K,
        )

        parts = []
        for snap in (1, 2):
            # ONE text pass per snapshot: signatures + dedup key
            # materialized together; the Bloom scan/count/build and both
            # index jobs below all run over this small state table
            sig = compute_minhash_sigs(
                with_key(third(snap)), shingle_size=SHINGLE, keep_cols=["key"]
            ).materialize()
            # (a) exact-dup candidate scan against the accumulated filter
            filt = load_bloom(bloom_path, M_BITS, K)
            hits = bloom_scan(sig, filt, text_col="key", m_bits=M_BITS, k=K)
            n_hits = int(
                hits.map_batches(
                    lambda b: pa.table(
                        {"n": pa.array(
                            [int(np.asarray(b.column("bloom_hit")).sum())], _I64
                        )}
                    ),
                    batch_format="pyarrow",
                ).sum("n")
            )
            # (b)+(c): the same signature pass feeds dedup and ingest
            pairs = near_dup_against_index(
                None, idx, threshold=0.7, num_parts=BUCKETS,
                num_bands=BANDS, shingle_size=SHINGLE,
                sig_ds=sig.select_columns(["doc_id", "sig"]),
            )

            def stamp(batch: pa.Table, snap: int = snap, n_hits: int = n_hits) -> pa.Table:
                j = np.asarray(batch.column("jaccard_est"), dtype=np.float64)
                n = len(batch)
                return pa.table(
                    {
                        "snapshot": pa.array(np.full(n, snap, dtype=np.int64), _I64),
                        "new_id": pc.cast(batch.column("new_id"), _I64),
                        "index_id": pc.cast(batch.column("index_id"), _I64),
                        "jaccard_x128": pa.array(
                            np.round(j * 128).astype(np.int64), _I64
                        ),
                        "snap_bloom_hits": pa.array(
                            np.full(n, n_hits, dtype=np.int64), _I64
                        ),
                    }
                )

            # the pair set must be complete BEFORE this snapshot enters
            # the index (else snap-vs-self pairs would appear)
            parts.append(pairs.map_batches(stamp, batch_format="pyarrow").materialize())
            append_minhash_index(None, idx, sig_ds=sig.select_columns(["doc_id", "sig"]))
            # (d) accumulate the filter — keys come off the state table
            save_bloom(
                merge_blooms(
                    filt,
                    build_bloom(sig, text_col="key", m_bits=M_BITS, k=K),
                ),
                bloom_path, M_BITS, K,
            )

        # lifecycle close: many small generations → one
        compact_minhash_index(idx)
        out = parts[0].union(parts[1]).sort(["snapshot", "new_id", "index_id"]).materialize()
    finally:
        if work_dir is None:
            _sh.rmtree(root, ignore_errors=True)
    return out


def q_ann_ivf_layout(sf_dir: str, layout_path: str | None = None):
    """IVF top-k over a PERSISTED partition-by-centroid layout
    (stages/ann.write_ivf_layout → ann_ivf_topk_layout): the embedding
    table is written once partitioned by IVF cell, and a query READS
    only its nprobe probed cell partitions — pruning at the FILE level,
    which is the 100 TB story (a probe touches nprobe/num_centroids of
    the bytes on disk, not a post-read filter).  Same centroids and
    parameters as q_ann_ivf, so the result is identical to the
    in-memory IVF (asserted in tests/test_ann.py); golden-checked here
    so the layout read path has a driver row.  ``layout_path`` must be
    a shared filesystem on a cluster; omitted → temp dir, removed
    after materialize."""
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import ann_ivf_topk_layout, write_ivf_layout

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), ANN_NUM_QUERIES))
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    qmat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)

    path = layout_path or _tf.mkdtemp(prefix="textpipe_ray_ivf_layout_")
    try:
        write_ivf_layout(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            path, num_centroids=32, sample_size=2048, seed=13,
        )
        res, _cells_read, _cells_total = ann_ivf_topk_layout(
            path, qids, qmat, k=ANN_K, nprobe=8
        )
        out = res.materialize()
    finally:
        if layout_path is None:
            _sh.rmtree(path, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Near-dup cluster assignment (distributed connected components) and
# BM25 keyword retrieval — round-4 additions.
# ---------------------------------------------------------------------------


def q_dup_clusters(sf_dir: str):
    """Near-dup CLUSTER ASSIGNMENT: distributed connected components
    over the exact word-3-gram Jaccard pair graph of
    ``q_ngram_jaccard`` — the step between pair-finding and
    keeper-selection in every fuzzy-dedup recipe (MinHash/SimHash/
    suffix pipelines all end with "group the pairs, keep one per
    component").  ``q_pages_dedup`` exercises the DRIVER union-find
    finisher; this row value-checks the DISTRIBUTED path
    (:func:`textpipe_ray.stages.dedup.pair_clusters_distributed`):
    iterative min-label propagation — per round one ``Dataset.join``
    of the labels onto the symmetric edge list plus a per-node
    groupby-min, converging on an 8-byte driver scalar when
    ``sum(label)`` stops falling.  Rounds = component diameter
    (near-dup clusters are star-like, 2-4); nothing about the graph
    ever sits on the driver, so this is the plan that survives a
    mostly-duplicated corpus whose PAIR LIST outgrows one process.

    The DuckDB oracle is a recursive-CTE transitive closure — exact
    but quadratic-in-component-size, i.e. usable as a small-scale
    oracle and nothing else; the two plans agreeing on every (doc_id,
    root) row is the check.  Output: one row per document appearing in
    ≥1 pair; ``root`` = the component's minimum doc_id."""
    from textpipe_ray.stages.dedup import (
        pair_clusters_distributed,
        shingle_jaccard_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = shingle_jaccard_pairs(ds, k=3, threshold=0.8)
    return pair_clusters_distributed(pairs)


# BM25 retrieval constants: Robertson k1/b defaults; the query terms are
# fixed high-signal words of the synthetic vocabulary (the oracle SQL is
# generated from this same tuple, so both engines score the same query).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("data", "merge", "window", "stream", "vector", "customer")
BM25_TOPK = 100


def q_bm25(sf_dir: str):
    """BM25 keyword retrieval (Robertson/Sparck-Jones; the lexical
    companion of the embedding ANN queries): score every document
    against a fixed multi-term query, return the global top-k.

    Scale shape — text is read once and never shuffled:
      1. ONE tokenize pass materializes the per-doc feature table
         ``(doc_id, dl, tf_0..tf_T)`` — 8 ints/doc, text projected
         away (the same materialize-the-small-derivative idiom as
         q_tfidf_topk's tf table).
      2. Corpus stats (N, Σdl, per-term df) are ONE constant-size
         partial row per block, summed driver-side — no shuffle.
      3. Scoring is a row-local pass over the feature table with the
         T-entry idf table captured in the closure; each block emits
         only its partial top-k (≤ K rows), and a single-block merge
         finishes — the exchange is ≤ K·blocks 16-byte rows, never
         O(N).
    Scores are quantized ``floor(score·1e6)`` on BOTH engines before
    ranking (same ulp argument as q_tfidf_topk) and ties break on
    doc_id, so the top-k SET is deterministic and the value hash
    exact.  Float expressions mirror the oracle SQL shape exactly
    (left-fold term sum, same parenthesization)."""
    import re as _re

    tok_re = _re.compile(TFIDF_TOKEN_RE)
    terms = np.array(BM25_TERMS)
    T = len(terms)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feat_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        D = len(ids)
        dl = np.zeros(D, dtype=np.int64)
        tf = np.zeros((D, T), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = tok_re.findall((t or "").lower())
            dl[i] = len(toks)
            if toks:
                uniq, cnt = np.unique(toks, return_counts=True)
                pos = np.searchsorted(uniq, terms)
                ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == terms)
                tf[i, ok] = cnt[pos[ok]]
        cols = {"doc_id": pa.array(ids, _I64), "dl": pa.array(dl, _I64)}
        for j in range(T):
            cols[f"tf{j}"] = pa.array(tf[:, j], _I64)
        return pa.table(cols)

    feats = ds.map_batches(feat_rows, batch_format="pyarrow").materialize()

    def stat_partial(batch: pa.Table) -> pa.Table:
        cols = {
            "n": pa.array([len(batch)], _I64),
            "sdl": pa.array([int(np.sum(np.asarray(batch.column("dl"), dtype=np.int64)))], _I64),
        }
        for j in range(T):
            cols[f"df{j}"] = pa.array(
                [int(np.count_nonzero(np.asarray(batch.column(f"tf{j}"), dtype=np.int64)))],
                _I64,
            )
        return pa.table(cols)

    parts = feats.map_batches(stat_partial, batch_format="pyarrow").take_all()
    n_docs = sum(p["n"] for p in parts)
    sum_dl = sum(p["sdl"] for p in parts)
    df = np.array([sum(p[f"df{j}"] for p in parts) for j in range(T)], dtype=np.float64)
    # identical expression shapes to the generated oracle SQL
    avgdl = float(sum_dl) / float(n_docs)
    idf = np.log(1.0 + ((float(n_docs) - df) + 0.5) / (df + 0.5))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        dl = np.asarray(batch.column("dl"), dtype=np.int64).astype(np.float64)
        norm = BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl))
        score = None
        for j in range(T):
            tfj = np.asarray(batch.column(f"tf{j}"), dtype=np.int64).astype(np.float64)
            tj = idf[j] * ((tfj * (BM25_K1 + 1.0)) / (tfj + norm))
            score = tj if score is None else score + tj
        micro = np.floor(score * 1000000.0).astype(np.int64) if len(ids) else np.zeros(0, np.int64)
        order = np.lexsort((ids, -micro))[:BM25_TOPK]
        return pa.table(
            {"doc_id": pa.array(ids[order], _I64), "bm25_micro": pa.array(micro[order], _I64)}
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        micro = np.asarray(batch.column("bm25_micro"), dtype=np.int64)
        order = np.lexsort((ids, -micro))[:BM25_TOPK]
        return pa.table(
            {"doc_id": pa.array(ids[order], _I64), "bm25_micro": pa.array(micro[order], _I64)}
        )

    return (
        feats.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow")
    )


def q_ann_ivf_append(sf_dir: str, layout_path: str | None = None):
    """IVF layout LIFECYCLE as a driver row (the ANN analog of
    q_snapshot_loop's minhash-index loop): build the partitioned layout
    from the EVEN-vec_id half of the embedding table (centroids fit on
    that base), ``append_ivf_layout`` the odd half as a committed
    generation — new vectors assigned to the EXISTING centroids, data
    written before the atomic ``_meta.json`` bump — then run the same
    probed top-k as q_ann_ivf_layout over base + generation.  The
    result must (and does — tests/test_ann.py) bit-equal a joint
    single-write layout built with the same base centroids: appending
    never shifts cell boundaries, it only adds postings.
    ``layout_path`` must be shared storage on a cluster; omitted →
    temp dir, removed after materialize."""
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import (
        ann_ivf_topk_layout,
        append_ivf_layout,
        write_ivf_layout,
    )

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), ANN_NUM_QUERIES))
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    qmat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def even(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column("vec_id"), _I64), dtype=np.int64)
        return batch.filter(pa.array(v % 2 == 0))

    def odd(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column("vec_id"), _I64), dtype=np.int64)
        return batch.filter(pa.array(v % 2 == 1))

    base = ds.map_batches(even, batch_format="pyarrow")
    snap = ds.map_batches(odd, batch_format="pyarrow")

    path = layout_path or _tf.mkdtemp(prefix="textpipe_ray_ivf_append_")
    try:
        write_ivf_layout(base, path, num_centroids=32, sample_size=2048, seed=13)
        append_ivf_layout(path, snap)
        res, _cells_read, _cells_total = ann_ivf_topk_layout(
            path, qids, qmat, k=ANN_K, nprobe=8
        )
        out = res.materialize()
    finally:
        if layout_path is None:
            _sh.rmtree(path, ignore_errors=True)
    return out


# Repeat-upsampling mixing constants: a source with fewer than TARGET
# docs is repeated ceil-ish (TARGET // n, capped) times — the Llama /
# DoReMi "epochs per source" knob, completing the mixing family's
# UPsample direction (budget/domain/temperature only ever drop).
EPOCH_MIX_TARGET = 300
EPOCH_MIX_MAX_FACTOR = 8
EPOCH_MIX_SHARDS = 64


def q_epoch_mix(sf_dir: str):
    """Per-source repeat upsampling: every document of source ``s`` is
    emitted ``factor_s = clamp(TARGET // n_s, 1, MAX)`` times, each
    replica tagged with its ``epoch`` index and a deterministic
    ``shard = md5('epoch:'||doc_id||':'||epoch) % NSHARDS`` so replicas
    of one document SPREAD across training shards instead of sitting
    adjacent (the point of epoch-indexed sharding).

    Scale shape: one tiny ``groupby(source).count`` broadcast via
    ``ray.put`` (same plan as q_domain_mix — at millions of sources
    this becomes a co-partitioned join), then a single row-local
    ``np.repeat`` explode per batch — no shuffle, output streams.  The
    oracle rebuilds the factors and replicas with generate_series and
    the identical md5-prefix shard math."""
    from textpipe_ray.functions.strhash import md5_hex

    rows = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    src = np.asarray([r["source"] for r in rows], dtype=object)
    n = np.asarray([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(src)
    src_sorted = src[order]
    factor = np.clip(EPOCH_MIX_TARGET // n[order], 1, EPOCH_MIX_MAX_FACTOR)
    ref = ray.put((src_sorted, factor))

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def explode(batch: pa.Table) -> pa.Table:
        src_s, factors = ray.get(ref)
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        cnt = factors[np.searchsorted(src_s, s)]
        total = int(cnt.sum())
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
        starts = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        epoch = np.arange(total, dtype=np.int64) - starts[rep]
        rid = ids[rep]
        keys = pa.array(
            [f"epoch:{d}:{e}" for d, e in zip(rid.tolist(), epoch.tolist())],
            pa.string(),
        )
        shard = np.array(
            [int(h[:8], 16) for h in md5_hex(keys)], dtype=np.int64
        ) % EPOCH_MIX_SHARDS
        return pa.table(
            {
                "doc_id": pa.array(rid, _I64),
                "source": pa.array(s[rep].tolist(), pa.string()),
                "epoch": pa.array(epoch, _I64),
                "shard": pa.array(shard, _I64),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# Bitext-mining threshold: mutual-best pairs must clear this quantized
# cosine (no pair sits within 58k quanta of the boundary at either test
# scale, so engine-ulp flips cannot change the row set).
BITEXT_MIN_COS_Q = 300_000_000


def q_bitext_mine(sf_dir: str):
    """Embedding-space cross-set alignment (the bitext-mining shape of
    Artetxe & Schwenk / CCMatrix): split the embedding table into two
    halves (even vec_id = source set, odd = target set) and keep the
    MUTUAL-best cosine pairs above a threshold — each side's best must
    pick the other.

    Scale shape — exact sharded search, no giant broadcast:
      * the INDEX side is its own materialized Arrow BLOCK REFS (one
        object-store ref per block, fetched one at a time inside the
        scoring task — per-task memory is one index block + one query
        batch, the FAISS-sharded-exact plan; a single ray.put of the
        whole matrix would not survive a billion-row side);
      * the QUERY side streams through ``map_batches``, keeping a
        running (best_q, best_id) per row across index blocks — the
        output is ONE row per query node, so the exchange after the
        scan is O(N) 24-byte rows regardless of the N×M score count;
      * mutual agreement is an equality ``Dataset.join`` of the two
        directions' best tables (each N rows, hash-partitioned).
    Cosines are quantized ``floor(cos·1e9)`` with min-id tie-break on
    BOTH engines (the q_ann_topk contract), and the same float
    expression shape as stages/ann is reused so DuckDB's
    ``list_cosine_similarity`` agrees under quantization."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def half(par: int):
        def f(batch: pa.Table) -> pa.Table:
            v = np.asarray(pc.cast(batch.column("vec_id"), _I64), dtype=np.int64)
            return batch.filter(pa.array(v % 2 == par))

        return ds.map_batches(f, batch_format="pyarrow").materialize()

    a_ds, b_ds = half(0), half(1)

    def best_of(query_ds, index_refs, out_q: str, out_n: str):
        def scan(batch: pa.Table) -> pa.Table:
            ids = np.asarray(pc.cast(batch.column("vec_id"), _I64), dtype=np.int64)
            if len(ids) == 0:
                return pa.table(
                    {out_q: pa.array([], _I64), out_n: pa.array([], _I64),
                     "cos_q": pa.array([], _I64)}
                )
            qm = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            qn = np.sqrt((qm * qm).sum(axis=1))
            best_q = np.full(len(ids), np.iinfo(np.int64).min, dtype=np.int64)
            best_id = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
            for ref in index_refs:
                blk = ray.get(ref)
                if len(blk) == 0:
                    continue
                nids = np.asarray(pc.cast(blk.column("vec_id"), _I64), dtype=np.int64)
                emb = np.array(blk.column("embedding").to_pylist(), dtype=np.float64)
                norms = np.sqrt((emb * emb).sum(axis=1))
                for j in range(len(ids)):  # rows per batch × one matvec each
                    sims_j = (emb @ qm[j]) / (norms * qn[j])
                    cq = np.floor(sims_j * 1e9).astype(np.int64)
                    o = np.lexsort((nids, -cq))[0]  # max q, min id tie-break
                    if cq[o] > best_q[j] or (cq[o] == best_q[j] and nids[o] < best_id[j]):
                        best_q[j] = cq[o]
                        best_id[j] = nids[o]
            return pa.table(
                {
                    out_q: pa.array(ids, _I64),
                    out_n: pa.array(best_id, _I64),
                    "cos_q": pa.array(best_q, _I64),
                }
            )

        return query_ds.map_batches(scan, batch_format="pyarrow")

    ab = best_of(a_ds, b_ds.to_arrow_refs(), "src_id", "tgt_id")
    ba = best_of(b_ds, a_ds.to_arrow_refs(), "tgt_id", "src_id").drop_columns(
        ["cos_q"]
    )

    def thresh(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch.column("cos_q"), dtype=np.int64)
        return batch.filter(pa.array(q >= BITEXT_MIN_COS_Q)).drop_columns(["cos_q"])

    # the two best tables are one row per doc on each side — corpus-
    # sized, so the mutual-agreement join widens with the input
    # (~50k rows/partition from parquet metadata), under the
    # CPU-proportional _join_partitions cap (>CPU-slot join partition
    # counts deadlock small clusters)
    from textpipe_ray.pipelines.flagship import parquet_rows
    from textpipe_ray.stages.dedup import _join_partitions

    n_vecs = parquet_rows([f"{sf_dir}/embeddings.parquet"])
    # each joined best-table holds ~half the rows (even/odd source
    # split), so size from n_vecs/2 to actually hit ~50k rows/partition
    nparts = max(2, min(_join_partitions(64), n_vecs // 2 // 50_000 + 1))
    joined = (
        ab.map_batches(thresh, batch_format="pyarrow")
        .repartition(nparts)
        .join(
            ba.repartition(nparts),
            join_type="inner",
            num_partitions=nparts,
            on=("src_id", "tgt_id"),
        )
    )
    return joined.select_columns(["src_id", "tgt_id"])


# ---------------------------------------------------------------------------
# Keeper selection: quality-aware canonical document per near-dup
# cluster — the step AFTER cluster formation in every fuzzy-dedup
# recipe (FineWeb/CCNet keep one representative per cluster; the
# reference's find_minhash similarity (doc.py:465) only surfaces the
# pair — choosing which side survives is the production decision).
# ---------------------------------------------------------------------------


def q_keeper_selection(sf_dir: str):
    """Canonical-document selection per near-dup cluster: form the
    exact word-3-gram Jaccard clusters of :func:`q_dup_clusters`, then
    keep the HIGHEST-QUALITY member of each (quality = word count
    ``\\S+``, the Gopher n_words feature; ties break to the smaller
    doc_id).  Output: one row per clustered document — ``(doc_id,
    root, n_words, keeper_id, is_keeper)``.

    Scale shape:
      1. pairs/clusters: the established shingle + min-label-
         propagation plan (nothing driver-side).
      2. the quality feature is a 16-byte/doc derivative computed in
         its own pruned row-local pass — the TEXT never enters a
         shuffle; the hash join ships only ``(doc_id, n_words)``
         against the (pairs-only) cluster table.
      3. per-cluster argmax via ``groupby('root').map_groups`` — a
         near-dup cluster is snippet-sized (bounded by the dup
         cardinality of one page), so the group is always tiny even
         when there are billions of clusters.
    """
    from textpipe_ray.stages.dedup import (
        _join_partitions,
        pair_clusters_distributed,
        shingle_jaccard_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = shingle_jaccard_pairs(ds, k=3, threshold=0.8)
    clusters = pair_clusters_distributed(pairs)  # (doc_id, root)

    def nwords(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text"), pa.string())
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "n_words": pc.cast(pc.count_substring_regex(text, r"\S+"), _I64),
            }
        )

    feats = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        nwords, batch_format="pyarrow"
    )
    # join partitions from the MEASURED size of the LARGER side: the
    # probe side (feats) is corpus-sized (16 bytes/doc for every doc),
    # so sizing by the tiny cluster table alone would funnel the whole
    # corpus through one hash-join task; ~1M probe rows per partition
    clusters = clusters.materialize()
    # corpus row count comes from parquet metadata (no feature pass)
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    big_side = max(clusters.count(), n_docs)
    nparts = int(max(1, min(_join_partitions(), big_side // 1_000_000 + 1)))
    joined = clusters.repartition(nparts).join(
        feats.repartition(nparts),
        join_type="inner",
        num_partitions=nparts,
        on=("doc_id",),
    )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        nw = group["n_words"].to_numpy(dtype=np.int64)
        ids = group["doc_id"].to_numpy(dtype=np.int64)
        # argmax n_words, ties -> min doc_id (lexicographic on (-nw, id))
        order = np.lexsort((ids, -nw))
        keeper = ids[order[0]]
        out = group[["doc_id", "root", "n_words"]].copy()
        out["keeper_id"] = np.int64(keeper)
        out["is_keeper"] = ids == keeper
        return out

    return joined.groupby("root").map_groups(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# Hyperlink graph: anchor-text aggregation + in-degree per link target —
# the classic web-corpus side product (anchor-text training corpora,
# link-based quality priors).  New surface over the pages table.
# ---------------------------------------------------------------------------

LINK_RE = r'<a href="([^"]*)"[^>]*>(.*?)</a>'


def iter_page_links(urls, htmls):
    """Yield ``(src_url, target_url, anchor_text)`` for every ``<a
    href>`` in a batch of pages, resolving root-relative hrefs against
    the page's own host; page-relative hrefs (no leading slash) are out
    of scope and skipped."""
    import re as _re

    link_re = _re.compile(LINK_RE, _re.S)
    base_re = _re.compile(r"^([a-z]+://[^/]+)")
    for u, h in zip(urls, htmls):
        m = base_re.match(u)
        text = (h or b"").decode("utf8", errors="replace")
        for href, anchor in link_re.findall(text):
            if href.startswith(("http://", "https://")):
                yield u, href, anchor
            elif href.startswith("/") and m:
                # root-relative: resolve against the page's own
                # scheme+host; pages with an unparseable url get no
                # relative resolution rather than a bogus bare-path node
                yield u, m.group(1) + href, anchor


def q_link_graph(sf_dir: str):
    """Anchor-text aggregation over the pages table's hyperlinks: parse
    every ``<a href>`` out of the raw HTML, resolve relative hrefs
    against the page's own host, and roll up per TARGET url —
    ``in_degree`` (total in-links), ``n_anchors`` (distinct anchor
    texts), and the most frequent anchor (``top_anchor`` /
    ``top_anchor_n``; count ties break to the lexicographically
    smallest text).  The anchor-text table per target is the classic
    web-corpus side product (link-text training corpora, link-based
    quality priors for crawl scheduling).

    Scale shape — one HTML parse pass, one pre-aggregated exchange:
      1. link extraction is row-local over the pruned ``(url, html)``
         read; each batch immediately combines to one row per
         ``(target, anchor)`` seen (np.unique on the pair), so HTML
         never leaves the extraction task and the shuffle moves
         O(distinct pairs × blocks) small rows, never O(links).
      2. global ``groupby(target, anchor).sum`` merges the partials.
      3. the per-target finisher (degree sum + argmax anchor) is a
         ``map_groups`` over anchor-cardinality-sized groups — bounded
         by a page vocabulary, never by corpus size.
    """
    import glob as _glob

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html"]
    )

    def extract(batch: pa.Table) -> pa.Table:
        targets: list[str] = []
        anchors: list[str] = []
        for _src, tgt, anchor in iter_page_links(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            targets.append(tgt)
            anchors.append(anchor)
        if not targets:
            return pa.table(
                {
                    "target": pa.array([], pa.string()),
                    "anchor": pa.array([], pa.string()),
                    "cnt": pa.array([], _I64),
                }
            )
        import pandas as pd

        g = (
            pd.DataFrame({"target": targets, "anchor": anchors})
            .groupby(["target", "anchor"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "target": pa.array(g["target"], pa.string()),
                "anchor": pa.array(g["anchor"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(dtype=np.int64), _I64),
            }
        )

    pair_counts = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby(["target", "anchor"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd

        n = group["n"].to_numpy(dtype=np.int64)
        anchors = group["anchor"].to_numpy(dtype=object)
        order = np.lexsort((anchors, -n))
        top = order[0]
        return pd.DataFrame(
            {
                "target": [group["target"].iloc[0]],
                "in_degree": np.array([n.sum()], dtype=np.int64),
                "n_anchors": np.array([len(n)], dtype=np.int64),
                "top_anchor": [anchors[top]],
                "top_anchor_n": np.array([n[top]], dtype=np.int64),
            }
        )

    return pair_counts.groupby("target").map_groups(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# PageRank over the hyperlink graph — the second iterative distributed
# algorithm family (next to q_dup_clusters' connected components):
# power iteration as per-round join + groupby-sum, with an INTEGER
# arithmetic contract so every rank is exactly reproducible under any
# block layout / summation order.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
PAGERANK_SCALE = 10**12  # total rank mass in integer units
PAGERANK_D_NUM, PAGERANK_D_DEN = 85, 100  # damping d = 0.85


def q_pagerank(sf_dir: str):
    """PageRank over the pages hyperlink graph (distinct ``(src,
    target)`` edges from :func:`iter_page_links`), ``PAGERANK_ITERS``
    power iterations at damping 0.85.  Output: one row per node —
    ``(node, rank_units, out_degree, in_degree)`` with ranks in
    integer units of 1/PAGERANK_SCALE.

    Determinism contract — ALL integer arithmetic: ranks are int64
    unit counts; a node's per-edge contribution is ``d_num * R //
    (d_den * outdeg)`` (floor), the teleport share is ``SCALE *
    (d_den - d_num) // (d_den * N)``, and the dangling mass ``Σ
    d_num*R//d_den`` over sink nodes is redistributed ``D // N`` per
    node.  Integer sums are order-independent, so the result is
    bit-identical under any partitioning — the same idiom as the
    repo's micro/milli-quantized aggregates (flooring leaks ≤1 unit
    per division; the leak is identical on every engine that follows
    the contract, see the dict-based parity test).

    Scale shape: one HTML parse pass builds the edge list, distincted
    inside a hash(src) partition exchange (same-pair rows co-locate, so
    per-partition ``drop_duplicates`` is exact) — the edge table comes
    out ALREADY partitioned by src-hash and is reused every round.
    Each power iteration is exactly TWO bounded ``__p`` exchanges and
    ZERO joins / driver syncs: (A) edges ∪ state grouped by src-hash —
    a vectorized in-partition merge computes per-edge contributions,
    combined per dst; the partition's dangling partial is replicated to
    every target partition as P tiny rows, and state rows ride the same
    exchange re-keyed by node-hash; (B) grouped by dst/node-hash — every
    partition reconstructs the identical global dangling scalar from
    the P² partials, sums inflow per node, and rebuilds the state rows
    in place.  O(E) rows exchanged per round (unavoidable without
    pinned placement), but as flat int/string columns through two Sort
    ops instead of three hash-join/aggregate barriers plus a
    whole-table dangling pass."""
    import glob as _glob

    import pandas as pd

    from textpipe_ray.functions.strhash import part_ids as _spart
    from textpipe_ray.stages.dedup import _join_partitions

    pages = pages_dir_for(sf_dir)
    files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    # partitions sized from row-count metadata (edges ~5x pages): small
    # graphs must not pay per-round scheduling on dozens of near-empty
    # partitions (the q_dup_clusters lesson)
    from textpipe_ray.pipelines.flagship import parquet_rows

    n_pages = parquet_rows(files)
    # per-exchange parallelism = number of __p groups: floor at CPU
    # count (tiny graphs must still use the box), cap by edge volume
    # (~5 edges/page, ~25k edge rows per partition keeps groups fat)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = int(max(min(cpus, 16), min(_join_partitions(), n_pages // 5_000 + 1)))

    def edge_partial(batch: pa.Table) -> pa.Table:
        seen: set = set()
        for src, tgt, _a in iter_page_links(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            seen.add((src, tgt))
        srcs = pa.array([s for s, _ in seen], pa.string())
        tgts = pa.array([t for _, t in seen], pa.string())
        return pa.table(
            {
                "src": srcs,
                "dst": tgts,
                "__p": pa.array(_spart(srcs, nparts), pa.int32()),
            }
        )

    def edge_distinct(part: "pd.DataFrame") -> "pd.DataFrame":
        return part.drop_duplicates(["src", "dst"], ignore_index=True)

    def widen_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "node": pa.nulls(n, pa.string()),
                "rank_units": pa.nulls(n, _I64),
                "out_degree": pa.nulls(n, _I64),
                "in_degree": pa.nulls(n, _I64),
                "__p": t.column("__p"),
            }
        )

    # ONE materialized O(E) table for the whole query, already in the
    # iteration exchange schema — degrees and every round read it
    wide_edges = (
        ds.map_batches(edge_partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(edge_distinct, batch_format="pandas")
        .map_batches(widen_edges, batch_format="pyarrow")
        .repartition(nparts)
        .materialize()
    )

    # node set + both degrees in ONE __p exchange: every edge emits a
    # tagged row per endpoint ((src, out=1, in=0) and (dst, 0, 1)),
    # keyed by node-hash; the in-partition pandas sum yields both
    # degrees together — no degree joins, no separate distinct pass
    def endpoint_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ones = np.ones(n, dtype=np.int64)
        zeros = np.zeros(n, dtype=np.int64)
        node = pa.concat_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
        )
        return pa.table(
            {
                "node": node,
                "od": pa.array(np.concatenate([ones, zeros]), _I64),
                "id_": pa.array(np.concatenate([zeros, ones]), _I64),
                "__p": pa.array(_spart(node, nparts), pa.int32()),
            }
        )

    def degree_combine(part: "pd.DataFrame") -> "pd.DataFrame":
        g = part.groupby("node", sort=False)[["od", "id_"]].sum().reset_index()
        return pd.DataFrame(
            {
                "node": g["node"],
                "out_degree": g["od"].astype("int64"),
                "in_degree": g["id_"].astype("int64"),
                "__p": np.full(len(g), part["__p"].iat[0], dtype=np.int32),
            }
        )

    # block count == nparts from here on: every downstream Sort sizes
    # its shuffle fan-out from input blocks, and 64+ near-empty blocks
    # were measured to cost 5.5s PER EXCHANGE in scheduling alone
    nodes = (
        wide_edges.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(degree_combine, batch_format="pandas")
        .repartition(nparts)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "rank_units": pa.array([], _I64),
                    "out_degree": pa.array([], _I64),
                    "in_degree": pa.array([], _I64),
                }
            )
        )

    # unified exchange schema: edges carry (src, dst); state rows carry
    # (node, rank_units, out_degree, in_degree); stage-B rows carry
    # (key, c, od, id_, kind).  One wide schema per stage keeps every
    # iteration a plain union -> groupby("__p") -> map_groups chain.
    state = nodes.map_batches(
        lambda t: t.append_column(
            "rank_units",
            pa.array(np.full(t.num_rows, PAGERANK_SCALE // n_nodes, dtype=np.int64), _I64),
        ),
        batch_format="pyarrow",
    )

    teleport = PAGERANK_SCALE * (PAGERANK_D_DEN - PAGERANK_D_NUM) // (PAGERANK_D_DEN * n_nodes)

    def widen_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "src": pa.nulls(n, pa.string()),
                "dst": pa.nulls(n, pa.string()),
                "node": t.column("node"),
                "rank_units": pc.cast(t.column("rank_units"), _I64),
                "out_degree": pc.cast(t.column("out_degree"), _I64),
                "in_degree": pc.cast(t.column("in_degree"), _I64),
                "__p": pc.cast(t.column("__p"), pa.int32()),
            }
        )

    def stage_a(part: "pd.DataFrame") -> "pd.DataFrame":
        st = part[part["node"].notna()]
        e = part[part["node"].isna()]
        r = st["rank_units"].to_numpy(dtype=np.int64)
        od = st["out_degree"].to_numpy(dtype=np.int64)
        # per-edge contribution via in-partition merge (src co-located
        # with its state row by construction of __p)
        m = e[["src", "dst"]].merge(
            pd.DataFrame({"src": st["node"].to_numpy(), "r": r, "odeg": od}),
            on="src",
            how="inner",
        )
        c = (
            m["r"].to_numpy(dtype=np.int64)
            * PAGERANK_D_NUM
            // (PAGERANK_D_DEN * m["odeg"].to_numpy(dtype=np.int64))
        )
        g = (
            pd.DataFrame({"key": m["dst"].to_numpy(), "c": c})
            .groupby("key", sort=False)["c"]
            .sum()
            .reset_index()
        )
        dang = int((r[od == 0] * PAGERANK_D_NUM // PAGERANK_D_DEN).sum())
        key = pd.concat(
            [g["key"], pd.Series([""] * nparts), st["node"]], ignore_index=True
        )
        cc = np.concatenate(
            [
                g["c"].to_numpy(dtype=np.int64),
                np.full(nparts, dang, dtype=np.int64),
                np.zeros(len(st), dtype=np.int64),
            ]
        )
        odo = np.concatenate(
            [
                np.zeros(len(g) + nparts, dtype=np.int64),
                st["out_degree"].to_numpy(dtype=np.int64),
            ]
        )
        ido = np.concatenate(
            [
                np.zeros(len(g) + nparts, dtype=np.int64),
                st["in_degree"].to_numpy(dtype=np.int64),
            ]
        )
        kind = np.concatenate(
            [
                np.zeros(len(g), dtype=np.int8),
                np.ones(nparts, dtype=np.int8),
                np.full(len(st), 2, dtype=np.int8),
            ]
        )
        p2 = np.concatenate(
            [
                _spart(pa.array(g["key"], pa.string()), nparts),
                np.arange(nparts, dtype=np.int32),
                _spart(pa.array(st["node"], pa.string()), nparts),
            ]
        )
        return pd.DataFrame(
            {"key": key, "c": cc, "od": odo, "id_": ido, "kind": kind, "__p": p2}
        )

    def stage_b(part: "pd.DataFrame") -> "pd.DataFrame":
        kind = part["kind"].to_numpy()
        # every partition sees ALL P dangling partials -> identical
        # global scalar, no driver round-trip
        dang_total = int(part.loc[kind == 1, "c"].sum())
        base = teleport + dang_total // n_nodes
        infl = part[kind == 0].groupby("key", sort=False)["c"].sum()
        st = part[kind == 2]
        rank = st["key"].map(infl).fillna(0).astype("int64") + base
        n = len(st)
        # Arrow output so the next union's block type matches wide_edges
        return pa.table(
            {
                "src": pa.nulls(n, pa.string()),
                "dst": pa.nulls(n, pa.string()),
                "node": pa.array(st["key"].to_numpy(), pa.string()),
                "rank_units": pa.array(rank.to_numpy(dtype=np.int64), _I64),
                "out_degree": pa.array(st["od"].to_numpy(dtype=np.int64), _I64),
                "in_degree": pa.array(st["id_"].to_numpy(dtype=np.int64), _I64),
                "__p": pa.array(
                    np.full(n, part["__p"].iat[0], dtype=np.int32), pa.int32()
                ),
            }
        )

    state = state.map_batches(widen_state, batch_format="pyarrow")
    for _ in range(PAGERANK_ITERS):
        state = (
            wide_edges.union(state)
            .groupby("__p")
            .map_groups(stage_a, batch_format="pandas")
            .groupby("__p")
            .map_groups(stage_b, batch_format="pandas")
        )

    return state.select_columns(["node", "rank_units", "out_degree", "in_degree"])


# ---------------------------------------------------------------------------
# Data-quality family (Deequ-style): single-pass column profiling and
# declarative constraint validation with per-rule violation rollups —
# the pipeline-health surface a 100 TB ingest runs before/after every
# stage.  All rule/profile partials are constant-size per block, so the
# only exchanges are the uniqueness-key combine and the referential
# anti-join.
# ---------------------------------------------------------------------------

# (column, kind): num -> cents units via floor(x*100); ts -> epoch
# micros; cat -> lexicographic min/max + EXACT distinct (declared
# low-cardinality columns only — unbounded columns use the HLL path of
# q_distinct_sketch and report n_distinct = -1 here)
PROFILE_COLUMNS = (
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_shipdate", "ts"),
    ("l_returnflag", "cat"),
    ("l_linestatus", "cat"),
)


def q_profile(sf_dir: str):
    """Single-pass column profile of ``lineitem``: one output row per
    declared column — ``(col, n_rows, n_nulls, n_distinct, min_repr,
    max_repr)``.  Numeric min/max are integer cents units
    (``floor(x*100)`` per row, the repo's exact-money idiom) and
    timestamps epoch-microseconds, both rendered as strings so one
    schema covers every column kind; ``n_distinct`` is exact for the
    declared-categorical columns (per-block value sets, bounded by the
    category cardinality) and -1 for unbounded ones (their scale path
    is the HLL sketch of ``q_distinct_sketch``).

    Scale shape: ONE streaming pass; every block emits a constant-size
    partial (7 rows, each with min/max/counts + a bounded category
    set); partials merge driver-side — no shuffle at all, the same
    constant-partial idiom as q_bm25's corpus stats."""
    import pandas as pd

    cols = [c for c, _ in PROFILE_COLUMNS]
    ds = _read(sf_dir, "lineitem", cols)

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for col, kind in PROFILE_COLUMNS:
            a = batch.column(col)
            n = len(a)
            nulls = a.null_count
            if kind == "num":
                units = pc.floor(pc.multiply(pc.cast(a, pa.float64()), 100.0))
                mm = pc.min_max(units)
                # all-null block -> 0 placeholders; the driver merge
                # skips blocks with n == nulls, so they are never read
                lo = int(mm["min"].as_py() or 0)
                hi = int(mm["max"].as_py() or 0)
                distinct: list[str] = []
            elif kind == "ts":
                mm = pc.min_max(pc.cast(a, pa.int64()))
                lo = int(mm["min"].as_py() or 0)
                hi = int(mm["max"].as_py() or 0)
                distinct = []
            else:  # cat
                vals = pc.drop_null(a).unique().to_pylist()
                lo = hi = 0
                distinct = sorted(str(v) for v in vals)
            rows.append((col, n, nulls, lo, hi, distinct))
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], _I64),
                "nulls": pa.array([r[2] for r in rows], _I64),
                "lo": pa.array([r[3] for r in rows], _I64),
                "hi": pa.array([r[4] for r in rows], _I64),
                "distinct": pa.array([r[5] for r in rows], pa.list_(pa.string())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    kinds = dict(PROFILE_COLUMNS)
    agg: dict[str, list] = {}
    for r in parts:
        col = r["col"]
        cur = agg.setdefault(col, [0, 0, None, None, set()])
        cur[0] += int(r["n"])
        cur[1] += int(r["nulls"])
        if int(r["n"]) > int(r["nulls"]):  # block had non-null values
            cur[2] = int(r["lo"]) if cur[2] is None else min(cur[2], int(r["lo"]))
            cur[3] = int(r["hi"]) if cur[3] is None else max(cur[3], int(r["hi"]))
        cur[4].update(r["distinct"] or [])
    out = []
    for col, kind in PROFILE_COLUMNS:
        n, nulls, lo, hi, dset = agg.get(col, [0, 0, None, None, set()])
        if kind == "cat":
            mn = min(dset) if dset else ""
            mx = max(dset) if dset else ""
            nd = len(dset)
        else:
            mn = "" if lo is None else str(lo)
            mx = "" if hi is None else str(hi)
            nd = -1
        out.append((col, n, nulls, nd, mn, mx))
    return pd.DataFrame(
        out, columns=["col", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"]
    )


def q_validate(sf_dir: str):
    """Declarative constraint validation (the Deequ/great-expectations
    surface): seven rules over ``lineitem`` / ``orders`` /
    ``documents``, one output row per rule — ``(rule, n_checked,
    n_violations, sample_key)`` with ``sample_key`` the smallest
    violating key (-1 when clean).  Covers the three check shapes a
    production suite needs:

      * row-local predicates (range / positivity / consistency /
        non-emptiness): constant-size per-block partials (count,
        violation count, min violating key), merged driver-side — no
        shuffle;
      * uniqueness (``(l_orderkey, l_linenumber)`` primary key):
        per-block key-count combiner, ONE bounded hash-partition
        exchange (``__p`` = hash(key) % 32, the ``q_anti_join``
        idiom — Ray Data's multi-key aggregate was measured 25×
        slower on the same input), surplus ``Σ(c-1)`` per duplicated
        group, one partial row per partition;
      * referential integrity (every ``l_orderkey`` resolves in
        orders): per-block fk value-counts unioned with per-block
        distinct orders keys, co-partitioned by the same ``__p``,
        anti-membership inside ``map_groups`` — no join operator, no
        full-key groupby."""
    import pandas as pd

    rules_out: dict[str, tuple[int, int, int]] = {}

    # ---- row-local predicate rules: one pass per source table ----
    def li_partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(pc.cast(batch.column("l_orderkey"), _I64), dtype=np.int64)
        q = np.asarray(pc.cast(batch.column("l_quantity"), pa.float64()), dtype=np.float64)
        d = np.asarray(pc.cast(batch.column("l_discount"), pa.float64()), dtype=np.float64)
        bad_q = (q < 1.0) | (q > 50.0)
        bad_d = (d < 0.0) | (d > 0.1)
        return pa.table(
            {
                "rule": pa.array(["lineitem_quantity_range", "lineitem_discount_range"], pa.string()),
                "n": pa.array([len(key)] * 2, _I64),
                "viol": pa.array([int(bad_q.sum()), int(bad_d.sum())], _I64),
                "mk": pa.array(
                    [
                        int(key[bad_q].min()) if bad_q.any() else -1,
                        int(key[bad_d].min()) if bad_d.any() else -1,
                    ],
                    _I64,
                ),
            }
        )

    def ord_partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(pc.cast(batch.column("o_orderkey"), _I64), dtype=np.int64)
        p = np.asarray(pc.cast(batch.column("o_totalprice"), pa.float64()), dtype=np.float64)
        # p <= 0 (not ~(p > 0)): NULL prices become NaN, and NaN <= 0
        # is False — matching the oracle's CASE WHEN NOT(p > 0), where
        # NULL falls through to ELSE 0
        bad = p <= 0.0
        return pa.table(
            {
                "rule": pa.array(["orders_totalprice_positive"], pa.string()),
                "n": pa.array([len(key)], _I64),
                "viol": pa.array([int(bad.sum())], _I64),
                "mk": pa.array([int(key[bad].min()) if bad.any() else -1], _I64),
            }
        )

    def doc_partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        text = pc.cast(batch.column("text"), pa.string())
        nch = np.asarray(pc.cast(batch.column("n_chars"), _I64), dtype=np.int64)
        ln = np.asarray(
            pc.fill_null(pc.utf8_length(text), -1), dtype=np.int64
        )
        bad_c = nch != ln
        # pc.utf8_trim(t, " ") NOT utf8_trim_whitespace: DuckDB trim()
        # strips only ' ' while Arrow's whitespace trim also strips
        # \t/\n/unicode spaces (same trap documented at the scrub rule)
        trimmed = pc.utf8_trim(pc.fill_null(text, ""), " ")
        bad_e = np.asarray(pc.equal(pc.utf8_length(trimmed), 0), dtype=bool)
        return pa.table(
            {
                "rule": pa.array(
                    ["documents_nchars_consistent", "documents_text_nonempty"], pa.string()
                ),
                "n": pa.array([len(key)] * 2, _I64),
                "viol": pa.array([int(bad_c.sum()), int(bad_e.sum())], _I64),
                "mk": pa.array(
                    [
                        int(key[bad_c].min()) if bad_c.any() else -1,
                        int(key[bad_e].min()) if bad_e.any() else -1,
                    ],
                    _I64,
                ),
            }
        )

    def merge_partials(parts) -> None:
        by_rule: dict[str, list[int]] = {}
        for r in parts:
            cur = by_rule.setdefault(r["rule"], [0, 0, -1])
            cur[0] += int(r["n"])
            cur[1] += int(r["viol"])
            mk = int(r["mk"])
            if mk >= 0:
                cur[2] = mk if cur[2] < 0 else min(cur[2], mk)
        for rule, (n, v, mk) in by_rule.items():
            rules_out[rule] = (n, v, mk)

    merge_partials(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow")
        .take_all()
    )
    merge_partials(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(ord_partial, batch_format="pyarrow")
        .take_all()
    )
    merge_partials(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        .map_batches(doc_partial, batch_format="pyarrow")
        .take_all()
    )

    # ---- uniqueness rule: per-block combiner + bounded __p exchange ----
    num_parts = 32

    def pk_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k1": np.asarray(pc.cast(batch.column("l_orderkey"), _I64), dtype=np.int64),
                "k2": np.asarray(pc.cast(batch.column("l_linenumber"), _I64), dtype=np.int64),
            }
        )
        g = df.groupby(["k1", "k2"], sort=False).size().reset_index(name="c")
        k1 = g["k1"].to_numpy(dtype=np.int64)
        k2 = g["k2"].to_numpy(dtype=np.int64)
        # composite-key hash so both columns steer the partition
        mixed = k1.astype(np.uint64) ^ (k2.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table(
            {
                "k1": pa.array(k1, _I64),
                "k2": pa.array(k2, _I64),
                "c": pa.array(g["c"].to_numpy(dtype=np.int64), _I64),
                "__p": _part_col(mixed, num_parts),
            }
        )

    def pk_combine(part) -> "pd.DataFrame":
        g = part.groupby(["k1", "k2"], sort=False)["c"].sum()
        c = g.to_numpy(dtype=np.int64)
        k1 = g.index.get_level_values(0).to_numpy(dtype=np.int64)
        dup = c > 1
        return pd.DataFrame(
            {
                "n": [int(c.sum())],
                "viol": [int((c[dup] - 1).sum())],
                "mk": [int(k1[dup].min()) if dup.any() else -1],
            }
        )

    pk_parts = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
        .map_batches(pk_partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(pk_combine, batch_format="pandas")
        .take_all()
    )
    n = sum(int(r["n"]) for r in pk_parts)
    v = sum(int(r["viol"]) for r in pk_parts)
    mks = [int(r["mk"]) for r in pk_parts if int(r["mk"]) >= 0]
    rules_out["lineitem_pk_unique"] = (n, v, min(mks) if mks else -1)

    # ---- referential rule: co-partitioned anti-membership, no join op ----
    def fk_partial(batch: pa.Table) -> pa.Table:
        cnt = np.asarray(pc.cast(batch.column("l_orderkey"), _I64), dtype=np.int64)
        # carry per-block row multiplicity so orphan ROW counts are exact
        g = pd.Series(cnt).value_counts()
        keys = g.index.to_numpy(dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(keys, _I64),
                "m": pa.array(g.to_numpy(dtype=np.int64), _I64),
                "is_fk": pa.array(np.ones(len(keys), dtype=bool)),
                "__p": _part_col(keys, num_parts),
            }
        )

    def ok_partial(batch: pa.Table) -> pa.Table:
        k = pc.unique(pc.cast(batch.column("o_orderkey"), _I64))
        keys = np.asarray(k, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(keys, _I64),
                "m": pa.array(np.zeros(len(keys), dtype=np.int64), _I64),
                "is_fk": pa.array(np.zeros(len(keys), dtype=bool)),
                "__p": _part_col(keys, num_parts),
            }
        )

    def ref_combine(part) -> "pd.DataFrame":
        is_fk = part["is_fk"].to_numpy()
        fkk = part.loc[is_fk, "key"].to_numpy(dtype=np.int64)
        m = part.loc[is_fk, "m"].to_numpy(dtype=np.int64)
        have = part.loc[~is_fk, "key"].to_numpy(dtype=np.int64)
        orphan = ~np.isin(fkk, have)
        return pd.DataFrame(
            {
                "n": [int(m.sum())],
                "viol": [int(m[orphan].sum())],
                "mk": [int(fkk[orphan].min()) if orphan.any() else -1],
            }
        )

    fk_parts = (
        _read(sf_dir, "lineitem", ["l_orderkey"])
        .map_batches(fk_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
                ok_partial, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(ref_combine, batch_format="pandas")
        .take_all()
    )
    n = sum(int(r["n"]) for r in fk_parts)
    v = sum(int(r["viol"]) for r in fk_parts)
    mks = [int(r["mk"]) for r in fk_parts if int(r["mk"]) >= 0]
    rules_out["lineitem_fk_orders"] = (n, v, min(mks) if mks else -1)

    rows = [
        (rule, *rules_out[rule])
        for rule in sorted(rules_out)
    ]
    return pd.DataFrame(rows, columns=["rule", "n_checked", "n_violations", "sample_key"])


# ---------------------------------------------------------------------------
# OLAP reshaping family: hierarchical rollup and long-to-wide pivot —
# the reporting surface a corpus dashboard runs over release stats.
# Both are pure combiner shapes: every grouping level / pivot cell is
# reduced per block to a constant-size partial, so the single exchange
# moves O(distinct keys x blocks) integer rows regardless of corpus
# size.
# ---------------------------------------------------------------------------

ROLLUP_ALL = "ALL"  # sentinel for rolled-up key levels (no NULL keys in TPC-H)


def q_rollup(sf_dir: str):
    """Hierarchical ROLLUP over ``lineitem``: detail rows per
    ``(l_returnflag, l_linestatus)``, subtotals per ``l_returnflag``,
    and the grand total — all three levels from ONE read pass.
    Measures are integer units (``floor(qty)``, price cents), matching
    the repo's exact-money idiom, so sums are order-independent and
    golden-stable.

    Scale shape: the per-block combiner emits every grouping level
    already reduced (≤ |flags|x|statuses| + |flags| + 1 rows per
    block); the single ``__p`` exchange then merges constant-size
    integer partials — the classic two-phase GROUPING SETS plan, never
    a second read and never a row-level shuffle."""
    import pandas as pd

    num_parts = 8

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "rflag": batch.column("l_returnflag").to_pandas(),
                "lstatus": batch.column("l_linestatus").to_pandas(),
                "qty": np.floor(
                    np.asarray(pc.cast(batch.column("l_quantity"), _F64), dtype=np.float64)
                ).astype(np.int64),
                "pcents": np.floor(
                    np.asarray(
                        pc.cast(batch.column("l_extendedprice"), _F64), dtype=np.float64
                    )
                    * 100.0
                ).astype(np.int64),
            }
        )
        lv0 = (
            df.groupby(["rflag", "lstatus"], sort=False)
            .agg(sum_qty=("qty", "sum"), sum_price_cents=("pcents", "sum"), n=("qty", "size"))
            .reset_index()
        )
        lv1 = (
            df.groupby("rflag", sort=False)
            .agg(sum_qty=("qty", "sum"), sum_price_cents=("pcents", "sum"), n=("qty", "size"))
            .reset_index()
        )
        lv1["lstatus"] = ROLLUP_ALL
        lv2 = pd.DataFrame(
            {
                "rflag": [ROLLUP_ALL],
                "lstatus": [ROLLUP_ALL],
                "sum_qty": [int(df["qty"].sum())],
                "sum_price_cents": [int(df["pcents"].sum())],
                "n": [len(df)],
            }
        )
        out = pd.concat([lv0, lv1, lv2], ignore_index=True)
        fused = pa.array((out["rflag"] + "|" + out["lstatus"]).to_numpy(), pa.string())
        return pa.table(
            {
                "rflag": pa.array(out["rflag"].to_numpy(), pa.string()),
                "lstatus": pa.array(out["lstatus"].to_numpy(), pa.string()),
                "sum_qty": pa.array(out["sum_qty"].to_numpy(dtype=np.int64), _I64),
                "sum_price_cents": pa.array(
                    out["sum_price_cents"].to_numpy(dtype=np.int64), _I64
                ),
                "n": pa.array(out["n"].to_numpy(dtype=np.int64), _I64),
                "__p": pa.array(strhash_part_ids(fused, num_parts), pa.int32()),
            }
        )

    def merge(part: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            part.groupby(["rflag", "lstatus"], sort=False)[
                ["sum_qty", "sum_price_cents", "n"]
            ]
            .sum()
            .reset_index()
        )
        for c in ("sum_qty", "sum_price_cents", "n"):
            g[c] = g[c].astype("int64")
        return g

    return (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge, batch_format="pandas")
    )


PIVOT_LANGS = ("de", "en", "es", "fr", "zh")  # declared pivot columns; rest -> n_other


def q_pivot(sf_dir: str):
    """Long-to-wide pivot of ``documents``: one row per ``source`` with
    per-language document counts as COLUMNS (``n_de`` … ``n_zh`` +
    ``n_other`` for undeclared languages), total rows and total chars.
    The pivot columns are a DECLARED closed set (``PIVOT_LANGS``) — the
    schema is fixed up front, as a distributed pivot must be (a
    data-dependent column set would need a driver round-trip before the
    plan could even be built).

    Scale shape: per-block pandas crosstab → one partial row per
    (source x block), integer cells only; a single-key ``__p`` exchange
    merges them.  Works unchanged when sources number millions (hosts):
    the exchange is bounded by distinct sources x blocks, never rows.

    Assumes non-null ``lang``/``source`` (the documents contract — same
    assumption q_rollup states for its key columns): a NULL lang would
    land in ``n_other`` here but in no declared cell under the oracle's
    ``CASE WHEN lang NOT IN (...)`` (NULL → ELSE 0), and a NULL source
    group would be dropped by the pandas crosstab but emitted by SQL."""
    import pandas as pd

    num_parts = 8
    langs = list(PIVOT_LANGS)

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pandas()
        lang = batch.column("lang").to_pandas()
        nch = np.asarray(pc.cast(batch.column("n_chars"), _I64), dtype=np.int64)
        lane = pd.Categorical(
            lang.where(lang.isin(langs), "other"), categories=langs + ["other"]
        )
        ct = pd.crosstab(src, lane, dropna=False)
        df = pd.DataFrame({"source": ct.index.to_numpy()})
        for lg in langs + ["other"]:
            df[f"n_{lg}"] = ct[lg].to_numpy(dtype=np.int64) if lg in ct else 0
        base = pd.DataFrame({"source": src, "nch": nch})
        tot = base.groupby("source", sort=False)["nch"].agg(["size", "sum"])
        df["n_rows"] = tot.loc[df["source"], "size"].to_numpy(dtype=np.int64)
        df["sum_chars"] = tot.loc[df["source"], "sum"].to_numpy(dtype=np.int64)
        cols = {"source": pa.array(df["source"].to_numpy(), pa.string())}
        for c in df.columns[1:]:
            cols[c] = pa.array(df[c].to_numpy(dtype=np.int64), _I64)
        cols["__p"] = pa.array(
            strhash_part_ids(cols["source"], num_parts), pa.int32()
        )
        return pa.table(cols)

    def merge(part: "pd.DataFrame") -> "pd.DataFrame":
        num = [c for c in part.columns if c not in ("source", "__p")]
        g = part.groupby("source", sort=False)[num].sum().reset_index()
        for c in num:
            g[c] = g[c].astype("int64")
        return g

    return (
        _read(sf_dir, "documents", ["source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge, batch_format="pandas")
    )


def q_bm25_layout(sf_dir: str, layout_path: str | None = None):
    """BM25 top-k over a PERSISTED inverted-index layout
    (stages/postings.write_postings_layout → bm25_topk_layout): the
    tokenized corpus is written once hive-partitioned by term-hash
    bucket, and the query OPENS only the buckets its terms hash to —
    file-level read pruning, the lexical analog of q_ann_ivf_layout's
    partition-by-centroid story (a keyword query touches
    |query terms| / num_buckets of the index bytes, while q_bm25
    re-reads the whole feature table per query).  Same terms, constants
    and quantization contract as q_bm25, and the float fold is
    bit-equal (missing terms contribute exactly +0.0; tested), so the
    result matches q_bm25 row-for-row at every scale where the top-k is
    all positive-score docs.  Only ≥1-term-matching docs can appear —
    the oracle applies the same restriction.  ``layout_path`` must be
    shared storage on a cluster; omitted → temp dir, removed after
    materialize."""
    import shutil as _sh
    import tempfile as _tf

    from textpipe_ray.stages.postings import bm25_topk_layout, write_postings_layout

    path = layout_path or _tf.mkdtemp(prefix="textpipe_ray_postings_")
    try:
        write_postings_layout(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            path,
            token_pattern=TFIDF_TOKEN_RE,
            num_buckets=16,
        )
        out = bm25_topk_layout(
            path,
            BM25_TERMS,
            BM25_TOPK,
            k1=BM25_K1,
            b=BM25_B,
            token_pattern=TFIDF_TOKEN_RE,
        ).materialize()
    finally:
        if layout_path is None:
            _sh.rmtree(path, ignore_errors=True)
    return out


def q_bm25_append(sf_dir: str, layout_path: str | None = None):
    """Postings-layout LIFECYCLE as a driver row (the retrieval analog
    of q_ann_ivf_append): build the inverted index from the EVEN-doc_id
    half of ``documents``, ``append_postings_layout`` the odd half as a
    committed generation (tokenized with the layout's OWN meta kernel,
    stats accumulated, atomic bump last), then run the same pruned-read
    BM25 over base + generation.  The result must (and does —
    tests/test_postings.py) bit-equal a joint single-write layout:
    appending never re-buckets existing terms, df is counted from the
    pruned read so it can't go stale, and corpus stats add exactly.
    ``layout_path`` must be shared storage on a cluster; omitted →
    temp dir, removed after materialize."""
    import shutil as _sh
    import tempfile as _tf

    from textpipe_ray.stages.postings import (
        append_postings_layout,
        bm25_topk_layout,
        write_postings_layout,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            d = np.asarray(pc.cast(b.column("doc_id"), _I64), dtype=np.int64)
            return b.filter(pa.array(d % 2 == parity))

        return ds.map_batches(f, batch_format="pyarrow")

    path = layout_path or _tf.mkdtemp(prefix="textpipe_ray_postings_app_")
    try:
        write_postings_layout(
            half(0), path, token_pattern=TFIDF_TOKEN_RE, num_buckets=16
        )
        append_postings_layout(path, half(1))
        out = bm25_topk_layout(
            path, BM25_TERMS, BM25_TOPK, k1=BM25_K1, b=BM25_B,
            token_pattern=TFIDF_TOKEN_RE,
        ).materialize()
    finally:
        if layout_path is None:
            _sh.rmtree(path, ignore_errors=True)
    return out


TIME_LAYOUT_START, TIME_LAYOUT_END = "2024-01-10", "2024-01-17"  # [start, end)


def q_time_layout(sf_dir: str, layout_path: str | None = None):
    """Date-partitioned events layout + partition-pruned range scan —
    the time-series counterpart of the hash-bucket pruning layouts
    (postings / IVF): events are written ONCE hive-partitioned by
    calendar day, and a day-aligned time-range query OPENS only the
    partitions inside the range (7 of the 30 days here) — file-level
    pruning on the axis warehouse scans actually filter by.  Output:
    per ``event_type`` row count and exact integer cents of ``value``
    over the range.

    Scale shape: the layout write is one streaming stamp pass (the day
    string derives row-locally from ``ts``); the query's per-block
    combiner reduces to O(event_types) integer partials and one bounded
    ``__p`` exchange merges them — nothing outside the pruned
    partitions is read, decoded or shuffled.  ``layout_path`` must be
    shared storage on a cluster; omitted → temp dir, removed after
    materialize."""
    import glob as _glob
    import os as _os
    import shutil as _sh
    import tempfile as _tf
    from datetime import date, timedelta

    import pandas as pd

    path = layout_path or _tf.mkdtemp(prefix="textpipe_ray_time_layout_")
    # re-run hygiene: write_parquet APPENDS files into existing day=
    # dirs, so stale partitions from a previous (or crashed) build into
    # a user-provided layout_path would double-count — clear them first
    if layout_path is not None and _os.path.isdir(path):
        for d in _glob.glob(f"{path}/day=*"):
            _sh.rmtree(d, ignore_errors=True)
    try:
        def stamp(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "day", pc.strftime(batch.column("ts"), format="%Y-%m-%d")
            )

        _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            stamp, batch_format="pyarrow"
        ).write_parquet(path, partition_cols=["day"])

        d0 = date.fromisoformat(TIME_LAYOUT_START)
        d1 = date.fromisoformat(TIME_LAYOUT_END)
        days = [(d0 + timedelta(days=i)).isoformat() for i in range((d1 - d0).days)]
        files: list[str] = []
        for d in days:
            files.extend(sorted(_glob.glob(f"{path}/day={d}/*.parquet")))
        if not files:
            # no partition inside the range: the oracle's empty result
            return ray.data.from_arrow(
                pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "n": pa.array([], _I64),
                        "sum_value_cents": pa.array([], _I64),
                    }
                )
            )

        num_parts = 8

        def partial(batch: pa.Table) -> pa.Table:
            et = batch.column("event_type").to_pandas()
            cents = np.floor(
                np.asarray(pc.cast(batch.column("value"), _F64), dtype=np.float64)
                * 100.0
            ).astype(np.int64)
            g = (
                pd.DataFrame({"event_type": et, "c": cents})
                .groupby("event_type", sort=False)["c"]
                .agg(["size", "sum"])
                .reset_index()
            )
            keys = pa.array(g["event_type"].to_numpy(), pa.string())
            return pa.table(
                {
                    "event_type": keys,
                    "n": pa.array(g["size"].to_numpy(dtype=np.int64), _I64),
                    "sum_value_cents": pa.array(g["sum"].to_numpy(dtype=np.int64), _I64),
                    "__p": pa.array(strhash_part_ids(keys, num_parts), pa.int32()),
                }
            )

        def merge(part: "pd.DataFrame") -> "pd.DataFrame":
            g = (
                part.groupby("event_type", sort=False)[["n", "sum_value_cents"]]
                .sum()
                .reset_index()
            )
            g["n"] = g["n"].astype("int64")
            g["sum_value_cents"] = g["sum_value_cents"].astype("int64")
            return g

        out = (
            ray.data.read_parquet(files, columns=["event_type", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__p")
            .map_groups(merge, batch_format="pandas")
            .materialize()
        )
    finally:
        if layout_path is None:
            _sh.rmtree(path, ignore_errors=True)
    return out


CDC_CHANGE_MOD = 7  # doc_id % 7 == 0 rows get modified text in snapshot B


def q_cdc_diff(sf_dir: str):
    """Snapshot change-data-capture: the added / removed / changed
    delta between two crawl snapshots of ``documents`` — the diff a
    daily ingest publishes so downstream stages reprocess only the
    delta instead of the corpus.  Snapshot A = ``doc_id % 3 != 2``,
    snapshot B = ``doc_id % 3 != 0`` with every ``doc_id % CDC_CHANGE_MOD
    == 0`` row's text perturbed (deterministic suffix), so all three
    change kinds occur at every scale: ``%3==0`` → removed, ``%3==2`` →
    added, overlap rows with perturbed text → changed; unchanged rows
    are NOT emitted (the delta must stay delta-sized).  Output: one row
    per difference — ``(doc_id, change)``.

    Scale shape: each side is read once and reduced ROW-LOCALLY to
    ``(doc_id, content_hash)`` (16 bytes/doc — text never enters the
    exchange); one bounded ``__p`` co-partition exchange compares both
    sides' hash tables in-partition with vectorized isin/merge.  The
    exchange is O(docs), the only floor possible for a full-corpus
    diff; the output is O(delta)."""
    from textpipe_ray.functions.strhash import hash64_mixed_chunked

    num_parts = 16

    def side(which: int):
        def f(batch: pa.Table) -> pa.Table:
            d = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
            keep = (d % 3 != 2) if which == 0 else (d % 3 != 0)
            t = batch.filter(pa.array(keep))
            d = np.asarray(t.column("doc_id"), dtype=np.int64)
            text = pc.cast(t.column("text"), pa.string())
            if which == 1:
                changed = pa.array(d % CDC_CHANGE_MOD == 0)
                text = pc.if_else(
                    changed, pc.binary_join_element_wise(text, " [rev2]", ""), text
                )
            # chunked form: text columns amplify ~32 bytes of temporaries
            # per input byte in the plain kernel (strhash.py contract)
            h = hash64_mixed_chunked(text).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(d, _I64),
                    "h": pa.array(h, _I64),
                    "is_b": pa.array(np.full(len(d), bool(which), dtype=bool)),
                    "__p": _part_col(d, num_parts),
                }
            )

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow"
        )

    def diff(part) -> pa.Table:
        a = part[~part["is_b"]]
        b = part[part["is_b"]]
        # nullable Int64 keeps the hashes EXACT through the outer merge:
        # plain int64 would upcast to float64 (NaN padding) and distinct
        # hashes above 2^53 could compare equal, silently dropping a
        # changed doc from the delta
        m = a[["doc_id", "h"]].astype({"h": "Int64"}).merge(
            b[["doc_id", "h"]].astype({"h": "Int64"}),
            on="doc_id", how="outer", suffixes=("_a", "_b"), indicator=True,
        )
        removed = (m["_merge"] == "left_only").to_numpy(dtype=bool)
        added = (m["_merge"] == "right_only").to_numpy(dtype=bool)
        changed = (
            ((m["_merge"] == "both") & (m["h_a"] != m["h_b"]))
            .fillna(False)
            .to_numpy(dtype=bool)
        )
        change = np.select([removed, added, changed], ["removed", "added", "changed"], "")
        keep = change != ""
        # pyarrow output pins the schema (an empty pandas object column
        # would convert to Arrow null type, not string)
        return pa.table(
            {
                "doc_id": pa.array(m["doc_id"].to_numpy(dtype=np.int64)[keep], _I64),
                "change": pa.array(change[keep].astype(object), pa.string()),
            }
        )

    return (
        side(0)
        .union(side(1))
        .groupby("__p")
        .map_groups(diff, batch_format="pandas")
    )


COMPRESS_LEVEL = 6  # zlib level; output LENGTH is deterministic per zlib build
COMPRESS_LOW_MILLI, COMPRESS_HIGH_MILLI = 200, 995  # keep band (repetitive / random)
COMPRESS_MIN_BYTES = 64  # below this zlib's fixed ~11-byte stream overhead
# dominates the ratio (empty text "compresses" to 8 bytes → ratio 8000),
# so the filter ABSTAINS (keep) — length rules own tiny docs


def q_compress_ratio(sf_dir: str):
    """Compression-ratio (entropy) quality filter — the cheap
    model-free signal production web pipelines run next to the Gopher
    rules: highly compressible text is boilerplate/repetition, nearly
    incompressible text is encoded junk or randomness.  Per document:
    ``ratio_milli = floor(1000 * len(zlib(text)) / max(1, len(text)))``
    over UTF-8 bytes, keep iff ``COMPRESS_LOW_MILLI <= ratio_milli <=
    COMPRESS_HIGH_MILLI``, first-fail ``drop_reason`` like the other
    rule families.  Texts under ``COMPRESS_MIN_BYTES`` are ALWAYS kept
    (reason ``""``): zlib's fixed ~11-byte stream overhead dominates
    the ratio there (empty text → 8000 milli), so the signal is
    meaningless — length rules own tiny docs.

    Determinism: only the compressed LENGTH is used, a pure function of
    the input bytes for a fixed zlib version/level — golden-stable in
    this environment (the same caveat every model-scored golden
    carries).  Scale shape: strictly row-local (one C zlib call per
    document — the same per-doc inherent cost as HTML parsing), no
    exchange at all; the filter composes with the flagship chain as a
    pure map."""
    import zlib

    def score(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), _I64)
        texts = batch.column("text").to_pylist()
        n = len(texts)
        milli = np.zeros(n, dtype=np.int64)
        nbytes = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf8")
            nbytes[i] = len(raw)
            milli[i] = (1000 * len(zlib.compress(raw, COMPRESS_LEVEL))) // max(1, len(raw))
        judged = nbytes >= COMPRESS_MIN_BYTES  # overhead-dominated below → abstain
        too_rep = judged & (milli < COMPRESS_LOW_MILLI)
        too_rand = judged & (milli > COMPRESS_HIGH_MILLI)
        keep = ~(too_rep | too_rand)
        reason = np.where(too_rep, "too_repetitive", np.where(too_rand, "too_random", ""))
        return pa.table(
            {
                "doc_id": ids,
                "ratio_milli": pa.array(milli, _I64),
                "keep": pa.array(keep),
                "drop_reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# --- q_skew_join: hot-key-salted big-⋈-big join -----------------------------
# The north rule demands "partitioning / shuffle / skew handled
# explicitly".  The flagship breaks host-domain skew by repartitioning
# on url-hash BEFORE the actor-pool stages (flagship.py); this query is
# the JOIN-side counterpart: the classic salted join for a fact table
# whose join key has a hot value (one host/customer owning a double-
# digit share of all rows).  The synthetic TPC-H-ish keys are uniform,
# so the skew is PLANTED deterministically (and SQL-expressibly):
# every 5th order is re-keyed to customer 1, giving it ~20% of the fact
# side — the same shape a dominant host gives a per-host join at crawl
# scale.
SKEW_MOD = 5  # o_orderkey % SKEW_MOD == 0 → re-key to customer 1
SKEW_SALTS = 8  # salt fan-out R for hot keys
SKEW_HOT_FRAC_MILLI = 10  # a key is "hot" at ≥1% of fact rows


def skew_salt_left(okey: np.ndarray, ckey: np.ndarray, hot: np.ndarray) -> np.ndarray:
    """Salt bucket per fact row: rows on a hot key spread over
    ``SKEW_SALTS`` buckets by a splitmix of their unique order key;
    cold keys stay at salt 0 (single partition suffices)."""
    mix = okey.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    mix ^= mix >> np.uint64(31)
    salt = (mix % np.uint64(SKEW_SALTS)).astype(np.int64)
    return np.where(np.isin(ckey, hot), salt, 0)


def skew_replicate_right(n: int, ishot: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, salt) for the dimension side: hot keys are
    replicated once per salt bucket (so every salted fact partition
    finds its match); cold keys keep one copy at salt 0."""
    reps = np.where(ishot, SKEW_SALTS, 1)
    idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    ends = np.cumsum(reps)
    salt = np.arange(int(ends[-1]) if n else 0, dtype=np.int64) - np.repeat(ends - reps, reps)
    return idx, salt


def q_skew_join(sf_dir: str):
    """Skew-aware distributed hash join (salted join).  A plain
    ``Dataset.join`` hash-partitions both sides on the key, so a hot
    key lands its entire ~20% of the fact table in ONE partition — the
    straggler that stalls the stage at 100 TB.  Plan:

    1. **Measure, don't guess**: a per-block ``np.unique`` combiner +
       one small ``groupby(key).sum`` counts rows per key (exchange =
       distinct keys × blocks, the standard pre-aggregated shape);
       keys with ≥ ``SKEW_HOT_FRAC_MILLI``/1000 of the fact rows are
       hot — the collect is bounded by 1000/SKEW_HOT_FRAC_MILLI rows
       regardless of corpus size.
    2. **Salt**: hot fact rows spread over ``SKEW_SALTS`` buckets by a
       hash of their unique order key; the dimension side replicates
       hot keys once per bucket (cold keys: one copy, salt 0).
    3. Join on ``(key, salt)`` — the hot key's load now lands on R
       partitions instead of one; replication cost is R × (#hot keys)
       rows, not R × |dimension|.

    Output is per-fact-row ``(o_orderkey, skew_custkey, c_mktsegment,
    price_cents)``, value-checked against a TRUE DuckDB oracle that
    runs the plain (unsalted) join — salting must be semantics-free."""
    total = _read(sf_dir, "orders", ["o_orderkey"]).count()

    def keyed(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        sk = np.where(ok % SKEW_MOD == 0, 1, ck)
        t = pa.table({"o_orderkey": pa.array(ok, _I64), "skew_custkey": pa.array(sk, _I64)})
        if "o_totalprice" in batch.column_names:
            t = t.append_column("o_totalprice", batch.column("o_totalprice"))
        return t

    def cnt_partial(batch: pa.Table) -> pa.Table:
        sk = np.asarray(batch.column("skew_custkey"), dtype=np.int64)
        u, c = np.unique(sk, return_counts=True)
        return pa.table({"k": pa.array(u, _I64), "n": pa.array(c, _I64)})

    threshold = max(1, (total * SKEW_HOT_FRAC_MILLI) // 1000)
    hot_rows = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(keyed, batch_format="pyarrow")
        .map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n"), threshold)),
            batch_format="pyarrow",
        )
        .take_all()
    )
    hot = np.asarray(sorted(r["k"] for r in hot_rows), dtype=np.int64)

    def salt_left(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        sk = np.asarray(batch.column("skew_custkey"), dtype=np.int64)
        return batch.append_column("salt", pa.array(skew_salt_left(ok, sk, hot), _I64))

    left = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(keyed, batch_format="pyarrow")
        .map_batches(salt_left, batch_format="pyarrow")
    )

    def salt_right(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        idx, salt = skew_replicate_right(len(ck), np.isin(ck, hot))
        return pa.table(
            {
                "c_custkey": pa.array(ck[idx], _I64),
                "c_mktsegment": batch.column("c_mktsegment").take(pa.array(idx)),
                "salt": pa.array(salt, _I64),
            }
        )

    right = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        salt_right, batch_format="pyarrow"
    )

    from textpipe_ray.stages.dedup import _join_partitions

    j = left.join(
        right,
        join_type="inner",
        num_partitions=_join_partitions(16),
        on=("skew_custkey", "salt"),
        right_on=("c_custkey", "salt"),
    )

    def post(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(batch.column("o_orderkey"), _I64),
                "skew_custkey": pc.cast(batch.column("skew_custkey"), _I64),
                "c_mktsegment": batch.column("c_mktsegment"),
                "price_cents": pc.cast(
                    pc.floor(pc.multiply(batch.column("o_totalprice"), 100.0)), _I64
                ),
            }
        )

    return j.map_batches(post, batch_format="pyarrow")


WET_EPOCH_US = 1577836800_000000  # 2020-01-01T00:00:00Z


def q_wet_export(sf_dir: str, out_dir: str | None = None):
    """Distributed WET export + read-back (sources/warc.py): the
    documents table is written as sharded Common-Crawl WET files — one
    gzipped ``conversion``-record file per input block, written inside
    the map task so the export streams with the read, no collect — then
    ``read_wet`` parses the shards back and a row-local pass summarizes
    each document.  The TRUE DuckDB oracle computes the same summary
    from the ORIGINAL parquet, so the check proves the WET round-trip
    is lossless per document (url-embedded doc_id, exact char length,
    md5 prefix of the text bytes).

    Scale shape: export is embarrassingly parallel (shard name = the
    block's min doc_id, unique because blocks partition the id space);
    read-back is one ``read_binary_files`` + row-local parse; no
    exchange anywhere.  ``out_dir`` must be shared storage on a
    cluster; omitted → temp dir, removed after materialize."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from textpipe_ray.functions.strhash import md5_hex
    from textpipe_ray.sources.warc import read_wet, write_wet

    root = out_dir or _tf.mkdtemp(prefix="textpipe_ray_wet_")
    # a re-run into a user-provided out_dir must not read back stale
    # shards from a previous export (shard names differ when batching
    # differs, so leftovers would silently corrupt the result)
    if out_dir is not None:
        _os.makedirs(root, exist_ok=True)
        for f in _os.listdir(root):
            if f.startswith("wet-"):
                _os.remove(_os.path.join(root, f))

    def export(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # tiny inputs can produce empty blocks
            return pa.table({"file": pa.array([], pa.string()), "n_docs": pa.array([], _I64)})
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        urls = pa.array([f"http://docs.example/{i}" for i in ids], pa.string())
        ts = pa.array(WET_EPOCH_US + ids * 1_000_000, pa.timestamp("us"))
        t = pa.table({"url": urls, "warc_ts": ts, "text": batch.column("text")})
        name = f"wet-{ids.min():012d}.warc.wet.gz"
        write_wet(t, _os.path.join(root, name), compress=True)
        return pa.table({"file": pa.array([name]), "n_docs": pa.array([len(ids)], _I64)})

    def summarize(batch: pa.Table) -> pa.Table:
        # fixed-length prefix "http://docs.example/" → slice off 20 chars
        doc_id = pc.cast(pc.utf8_slice_codeunits(batch.column("url"), 20), _I64)
        text = batch.column("text")
        md5_8 = pc.utf8_slice_codeunits(
            pa.array(md5_hex(text), pa.string()), 0, 8
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "n_chars": pc.cast(pc.utf8_length(text), _I64),
                "md5_8": md5_8,
            }
        )

    try:
        manifest = (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(export, batch_format="pyarrow")
            .materialize()  # one row per shard — the export barrier
        )
        assert manifest.count() > 0
        files = sorted(
            _os.path.join(root, f) for f in _os.listdir(root) if f.startswith("wet-")
        )
        out = (
            read_wet(files).map_batches(summarize, batch_format="pyarrow").materialize()
        )
    finally:
        if out_dir is None:
            _sh.rmtree(root, ignore_errors=True)
    return out


LSH_EVAL_TRUTH = 0.8  # exact word-3-gram jaccard ≥ this is a "true" near-dup
LSH_EVAL_PARTS = 16
LSH_EVAL_EST_FLOOR = 64  # report non-truth candidates only at est ≥ 64/128
LSH_EVAL_SHINGLE = 5  # byte-shingle minhash (the production pages config)


def q_lsh_recall(sf_dir: str):
    """Dedup-quality evaluation: how well does the production
    MinHash-LSH candidate generator cover the EXACT near-duplicate
    pairs?  Production pipelines tune LSH (bands × rows, shingle
    space) against measured recall/precision, not guesses — this row
    makes that measurement a first-class, regression-gated operator.

    Truth side: :func:`shingle_jaccard_pairs` — the exact word-3-gram
    Jaccard pairs (inverted-index plan, q_ngram_jaccard's machinery) at
    ``LSH_EVAL_TRUTH``.  Candidate side: :func:`near_dup_minhash` with
    ``threshold=0.0`` so every LSH band-bucket candidate survives with
    its signature-agreement estimate.  Both sides are pair tables
    (bounded by actual similarity, never O(N²)); the outer merge is one
    co-partitioned ``__p`` exchange + vectorized run-boundary reduce —
    no join operator, no driver collect.

    Output: every truth pair plus every candidate pair at ``est_x128 ≥
    LSH_EVAL_EST_FLOOR`` — ``(id_a, id_b, exact_x1000, est_x128,
    in_truth, in_cand)`` with -1 for a side the pair is absent from
    (``est_x128`` = signature agreement k of 128; ``in_cand`` records
    raw LSH candidacy at ANY estimate, so recall over truth rows is
    exact).  The floor keeps the result answer-sized: the raw candidate
    set is the LSH background fire rate (~100k pairs even at sf0.01),
    which is the thing this eval exists to measure, not to ship.
    Recall = mean(in_cand | in_truth), asserted ≥ the production bar in
    tests.  At corpus scale the eval runs over a sampled shard slice —
    it composes with any upstream filter; the exact truth side is the
    quadratic-free inverted-index plan, so the slice just bounds the
    candidate fire rate.  Golden-checked (the minhash side is not
    SQL-expressible)."""
    from textpipe_ray.stages.dedup import near_dup_minhash, shingle_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_part(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        mix = (a.astype(np.uint64) << np.uint64(32)) ^ b.astype(np.uint64)
        mix *= np.uint64(0x9E3779B97F4A7C15)
        return ((mix >> np.uint64(33)) % np.uint64(LSH_EVAL_PARTS)).astype(np.int32)

    def tag_truth(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a"), dtype=np.int64)
        b = np.asarray(batch.column("id_b"), dtype=np.int64)
        jac = np.asarray(batch.column("jac"), dtype=np.float64)
        return pa.table(
            {
                "id_a": pa.array(a, _I64),
                "id_b": pa.array(b, _I64),
                "exact_x1000": pa.array(np.floor(jac * 1000.0).astype(np.int64), _I64),
                "est_x128": pa.array(np.full(len(a), -1, dtype=np.int64), _I64),
                "__p": pa.array(pair_part(a, b), pa.int32()),
            }
        )

    def tag_cand(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a"), dtype=np.int64)
        b = np.asarray(batch.column("id_b"), dtype=np.int64)
        est = np.asarray(batch.column("jaccard_est"), dtype=np.float64)
        return pa.table(
            {
                "id_a": pa.array(a, _I64),
                "id_b": pa.array(b, _I64),
                "exact_x1000": pa.array(np.full(len(a), -1, dtype=np.int64), _I64),
                "est_x128": pa.array(np.rint(est * 128.0).astype(np.int64), _I64),
                "__p": pa.array(pair_part(a, b), pa.int32()),
            }
        )

    truth = shingle_jaccard_pairs(ds, k=3, threshold=LSH_EVAL_TRUTH).map_batches(
        tag_truth, batch_format="pyarrow"
    )
    cand = near_dup_minhash(ds, threshold=0.0, shingle_size=LSH_EVAL_SHINGLE).map_batches(
        tag_cand, batch_format="pyarrow"
    )

    def merge(part: pa.Table) -> pa.Table:
        n = len(part)
        if n == 0:
            return pa.table(
                {
                    "id_a": pa.array([], _I64),
                    "id_b": pa.array([], _I64),
                    "exact_x1000": pa.array([], _I64),
                    "est_x128": pa.array([], _I64),
                    "in_truth": pa.array([], pa.bool_()),
                    "in_cand": pa.array([], pa.bool_()),
                }
            )
        a = np.asarray(part.column("id_a"), dtype=np.int64)
        b = np.asarray(part.column("id_b"), dtype=np.int64)
        ex = np.asarray(part.column("exact_x1000"), dtype=np.int64)
        es = np.asarray(part.column("est_x128"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, ex, es = a[order], b[order], ex[order], es[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        exm = np.maximum.reduceat(ex, starts)
        esm = np.maximum.reduceat(es, starts)
        keep = (exm >= 0) | (esm >= LSH_EVAL_EST_FLOOR)
        return pa.table(
            {
                "id_a": pa.array(a[starts][keep], _I64),
                "id_b": pa.array(b[starts][keep], _I64),
                "exact_x1000": pa.array(exm[keep], _I64),
                "est_x128": pa.array(esm[keep], _I64),
                "in_truth": pa.array(exm[keep] >= 0),
                "in_cand": pa.array(esm[keep] >= 0),
            }
        )

    return truth.union(cand).groupby("__p").map_groups(merge, batch_format="pyarrow")


VOCAB_TOP_K = 50


def q_vocab_coverage(sf_dir: str):
    """Tokenizer QA: corpus-wide BPE token frequencies and coverage —
    the check a team runs after training a tokenizer (q_bpe_train)
    before spending GPU-hours on it: which token types dominate, and
    what share of the corpus token stream the head of the vocabulary
    covers.

    Everything runs in WORD-TYPE space, never token-instance space:
    the corpus is read once for the word-type count table (the
    q_bpe_train plan — exchange moves distinct types × blocks), merges
    are learned from the bounded top-type table, and then each TYPE is
    encoded exactly once with its count carried as a weight — the
    token-frequency table is a second types-sized groupby, so corpus
    size only enters through the single word-count pass.

    Output: the top ``VOCAB_TOP_K`` tokens by corpus frequency —
    ``(token, n, permille)`` where permille is the token's integer
    share of the total token stream.  Trainer front half is shared
    with :func:`q_bpe_train` (:func:`_bpe_word_types`) so the QA query
    always measures the tokenizer the trainer produces.  Golden-checked
    (merge learning is not SQL-expressible)."""
    from collections import Counter as _Counter

    from textpipe_ray.functions.bpe import encode_word

    types, ranks_ref, _ = _bpe_word_types(sf_dir)

    def tok_partial(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        c: dict = _Counter()
        for w, n in zip(batch.column("word").to_pylist(), batch.column("n").to_pylist()):
            for tok in encode_word(w, ranks):
                c[tok] += n
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], _I64),
            }
        )

    tokens = (
        types.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab-sized
    )
    total = tokens.sum("n")
    head = tokens.sort(["n", "token"], descending=[True, False]).limit(VOCAB_TOP_K)

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.int64)
        return pa.table(
            {
                "token": batch.column("token"),
                "n": pa.array(n, _I64),
                "permille": pa.array(n * 1000 // max(1, total), _I64),
            }
        )

    return head.map_batches(finish, batch_format="pyarrow")


ANN_PQ_REFINE = 5  # exact re-rank shortlist factor (k·R candidates)


def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (PQ-ADC, Jégou et al. 2011) — the
    memory tier of the ANN family (brute exact → IVF probe-pruned →
    IVF layout file-pruned → PQ RAM-compressed): vectors quantize to
    M=8 uint8 codes (8 B vs 256 B raw), so a corpus whose embeddings
    exceed cluster RAM keeps its whole index resident; queries scan the
    codes table with per-row table lookups (stages/ann.ann_pq_topk).
    PQ's guarantee is recall@k within its top-k·R shortlist (shared
    codes collapse near-identical vectors), so the query runs the full
    production shape: ADC candidate generation (k·{ANN_PQ_REFINE}) +
    one exact-cosine re-rank over the answer-sized shortlist (the
    candidate map broadcasts; re-rank work and exchange are O(k·R·Q),
    never corpus-sized).  Same bounded-exchange contract as q_ann_topk:
    per-batch partial top-k, merge sees ≤ k·Q·blocks rows.
    Golden-checked (k-means codebooks + ADC are not SQL-expressible);
    shortlist recall and refined agreement vs the exact brute-force
    baseline are asserted in tests/test_ann.py."""
    import pyarrow.parquet as pq

    from textpipe_ray.stages.ann import ann_pq_topk

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), ANN_NUM_QUERIES))
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    qmat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_pq_topk(ds, qids, qmat, k=ANN_K, refine=ANN_PQ_REFINE)


# --- q_drift: snapshot distribution drift -----------------------------------
# Bucket edges are declared constants shared with the SQL oracle; the
# TVD threshold flags a feature whose distribution moved enough that a
# recurring-crawl pipeline should alert before mixing the new snapshot.
DRIFT_EDGES = {
    "n_chars": (0, 100, 200, 400, 800, 1600, 3200, 6400),
    "n_words": (0, 20, 40, 80, 160, 320, 640, 1280),
}
DRIFT_TVD_MICRO_BAR = 25000  # drifted iff TVD ≥ 0.025


def q_drift(sf_dir: str):
    """Distribution drift between two crawl snapshots — the monitoring
    op a recurring ingest runs BEFORE mixing a new snapshot: per-feature
    histograms (doc length in chars / words, fixed declared bucket
    edges) for snapshot A (``doc_id % 3 != 2``) vs snapshot B
    (``doc_id % 3 != 0``, every ``% CDC_CHANGE_MOD == 0`` row's text
    re-crawled with a revision suffix — the q_cdc_diff snapshot
    convention), and the total-variation distance between the two
    distributions in exact integer micro units:
    ``tvd_micro = floor(1e6 · Σ|n_a·NB − n_b·NA| / (2·NA·NB))``
    (exact rational arithmetic — no float ln as PSI would need, so the
    oracle matches bit-for-bit).  Output: one row per (feature, bucket)
    with both counts, the feature's ``tvd_micro`` and the ``drifted``
    flag.

    Scale shape: ONE read of the corpus; each batch reduces row-locally
    to per-(feature, bucket) count partials — a CONSTANT ≤ features ×
    buckets rows per block regardless of batch size (the q_distinct_
    sketch register idiom); one tiny groupby merges partials and a
    per-feature map_groups over ≤ buckets rows computes the TVD with
    Python bignums (overflow-free at any corpus size).  Nothing
    text-sized ever enters an exchange."""
    import pandas as pd

    edges = {f: np.asarray(e, dtype=np.int64) for f, e in DRIFT_EDGES.items()}

    def partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        text = pc.coalesce(pc.cast(batch.column("text"), pa.string()), "")
        in_a = d % 3 != 2
        in_b = d % 3 != 0
        # ONE kernel pass: B's re-crawl suffix " [rev2]" shifts the
        # features by a constant (+7 chars, +1 whitespace token — the
        # suffix starts with a space, so this holds for every input
        # including empty), so B's values derive arithmetically instead
        # of re-running utf8_length + the RE2 count on 2/3 of the corpus
        changed = d % CDC_CHANGE_MOD == 0
        nc = np.asarray(pc.cast(pc.utf8_length(text), _I64), dtype=np.int64)
        nw = np.asarray(
            pc.cast(pc.count_substring_regex(text, r"\S+"), _I64), dtype=np.int64
        )
        feats = {
            "a": {"n_chars": nc[in_a], "n_words": nw[in_a]},
            "b": {
                "n_chars": (nc + 7 * changed)[in_b],
                "n_words": (nw + changed)[in_b],
            },
        }
        out_f: list = []
        out_bkt, out_a, out_b = [], [], []
        for feat, e in edges.items():
            ca = np.bincount(
                np.searchsorted(e, feats["a"][feat], side="right") - 1, minlength=len(e)
            )
            cb = np.bincount(
                np.searchsorted(e, feats["b"][feat], side="right") - 1, minlength=len(e)
            )
            idx = np.nonzero((ca > 0) | (cb > 0))[0]
            out_f.extend([feat] * len(idx))
            out_bkt.append(idx.astype(np.int64))
            out_a.append(ca[idx].astype(np.int64))
            out_b.append(cb[idx].astype(np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.array([], np.int64)  # noqa: E731
        return pa.table(
            {
                "feature": pa.array(out_f, pa.string()),
                "bucket": pa.array(cat(out_bkt), _I64),
                "n_a": pa.array(cat(out_a), _I64),
                "n_b": pa.array(cat(out_b), _I64),
            }
        )

    def tvd(group: "pd.DataFrame") -> "pd.DataFrame":
        na = int(group["n_a"].sum())
        nb = int(group["n_b"].sum())
        if na == 0 or nb == 0:
            # exactly one empty snapshot = maximal drift (true TVD 1);
            # the 0/0 form of the formula would report 0 — the one
            # situation a drift monitor must alarm on, not sleep through
            t = 0 if na == nb else 1_000_000
        else:
            num = sum(
                abs(int(a) * nb - int(b) * na)
                for a, b in zip(group["n_a"], group["n_b"])
            )
            t = (1_000_000 * num) // (2 * na * nb)
        return pd.DataFrame(
            {
                "feature": group["feature"].to_numpy(),
                "bucket": group["bucket"].to_numpy(dtype=np.int64),
                "n_a": group["n_a"].to_numpy(dtype=np.int64),
                "n_b": group["n_b"].to_numpy(dtype=np.int64),
                "tvd_micro": np.full(len(group), t, dtype=np.int64),
                "drifted": np.full(len(group), t >= DRIFT_TVD_MICRO_BAR),
            }
        )

    hist = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["feature", "bucket"])
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
    )
    return hist.groupby("feature").map_groups(tvd, batch_format="pandas")


def q_rule_ablation(sf_dir: str):
    """Per-rule drop attribution for the Gopher rule family — the
    ablation table a pipeline engineer reads before tuning thresholds:
    for each rule, how many documents violate it (``n_fail``) and how
    many it ALONE is responsible for dropping (``n_unique`` — the docs
    that would be recovered if the rule were removed), plus the exact
    integer ``fail_permille``.  A rule with large n_fail but near-zero
    n_unique is redundant with the rest of the family; a rule with
    n_unique ≈ n_fail is doing independent work.

    Scale shape: composes on q_gopher_rules' row-local feature map (the
    integer-milli features carry every threshold decision, so the rule
    flags recompute from 5 int columns — the text kernels run ONCE);
    the per-batch combiner reduces to a CONSTANT 5 rows per block
    (rule, n_fail, n_unique, n_docs partials), one tiny groupby-sum,
    arithmetic finisher.  Nothing row-sized enters the exchange."""
    feats = q_gopher_rules(sf_dir)

    def combine(batch: pa.Table) -> pa.Table:
        nw = np.asarray(batch.column("n_words"), dtype=np.int64)
        mwl = np.asarray(batch.column("mean_word_len_milli"), dtype=np.int64)
        symm = np.asarray(batch.column("symbol_milli"), dtype=np.int64)
        alpham = np.asarray(batch.column("alpha_milli"), dtype=np.int64)
        stop = np.asarray(batch.column("stop_hits"), dtype=np.int64)
        passes = gopher_rule_flags(nw, mwl, symm, alpham, stop)
        n_fails = np.zeros(len(nw), dtype=np.int64)
        for p in passes.values():
            n_fails += ~p
        rows_r, rows_f, rows_u, rows_n = [], [], [], []
        for name in GOPHER_RULE_ORDER:
            fail = ~passes[name]
            rows_r.append(name)
            rows_f.append(int(fail.sum()))
            rows_u.append(int((fail & (n_fails == 1)).sum()))
            rows_n.append(len(nw))
        return pa.table(
            {
                "rule": pa.array(rows_r, pa.string()),
                "n_fail": pa.array(rows_f, _I64),
                "n_unique": pa.array(rows_u, _I64),
                "n_docs": pa.array(rows_n, _I64),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        f = np.asarray(batch.column("n_fail"), dtype=np.int64)
        n = np.asarray(batch.column("n_docs"), dtype=np.int64)
        return pa.table(
            {
                "rule": batch.column("rule"),
                "n_fail": pa.array(f, _I64),
                "n_unique": pc.cast(batch.column("n_unique"), _I64),
                "fail_permille": pa.array(
                    1000 * f // np.maximum(n, 1), _I64
                ),
            }
        )

    return (
        feats.map_batches(combine, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(
            Sum("n_fail", alias_name="n_fail"),
            Sum("n_unique", alias_name="n_unique"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


# --- per-language quantile normalization -------------------------------

NORM_BUCKET_SHIFT = 12  # micro-score >> 12: ≤ score-range/4096 rank buckets


def q_lang_quantile_norm(sf_dir: str):
    """Per-language quantile normalization of the quality score — the
    CCNet/FineWeb "language-fair filtering" move: a single global score
    cutoff keeps whatever languages the classifier happens to favor, so
    each doc's score is re-expressed as its percentile WITHIN its
    language and any later threshold composes per-language.  Emits the
    exact strict-rank permille
    ``pct_milli = (1000 * n_strictly_below_in_lang) // n_lang``.

    Scale shape — exact distributed rank in two passes; the score is
    effectively CONTINUOUS (≈1 distinct micro per doc), so a per-value
    histogram would be corpus-sized and is exactly what this layout
    avoids:
      1. bucket-histogram pass: scores quantize to ``floor(score*1e6)``
         int64 (bit-identical across engines — see q_quality_score) and
         coarsen to ``bucket = micro >> 12``; per-batch ``np.unique``
         combiners + a small (lang, bucket) groupby.  Exchange AND
         driver pull are bounded by langs × score-range/4096 (the
         measured micro range is ±3M → ≲1.5k buckets per language —
         the DSIR/HLL constant-histogram idiom), never by corpus size.
         The driver folds cumulative below-bucket offsets and per-lang
         totals and broadcasts them once via ``ray.put``.
      2. rank pass: one (lang, bucket) groupby over the narrow
         (doc_id, lang, bucket, micro) projection — the standard
         distributed-rank all-to-all, four slim columns.  Within a
         group the strict rank is a local sort + ``searchsorted`` (ties
         share a bucket by definition, so below-counts are exact), and
         ``pct_milli = (1000·(offset+local)) // n_lang`` in integer
         math.  Nothing corpus-sized ever lands on the driver or in a
         task closure.  Average group size is corpus/(langs·buckets);
         a pathologically PEAKED score distribution concentrates docs
         in few buckets (worst case: one group per tied value set) —
         equal micros rank 0 against each other, so such a bucket could
         be salt-sharded without changing results, at the cost of an
         extra dedup of the offsets; not done here."""
    import pandas as pd

    from textpipe_ray.functions.quality_score import load_weights

    weights = load_weights()
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def batch_langs(batch: pa.Table) -> np.ndarray:
        col = pc.fill_null(pc.cast(batch.column("lang"), pa.string()), "")
        return np.asarray(col.to_pylist(), dtype=object)

    def hist_partial(batch: pa.Table) -> pa.Table:
        langs = batch_langs(batch)
        buckets = _quality_micro(batch, weights) >> NORM_BUCKET_SHIFT
        out_l: list = []
        out_b: list = []
        out_c: list = []
        for lg in np.unique(langs):
            mask = langs == lg
            uk, cnt = np.unique(buckets[mask], return_counts=True)
            out_l.extend([lg] * len(uk))
            out_b.append(uk)
            out_c.append(cnt.astype(np.int64))
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "bucket": pa.array(
                    np.concatenate(out_b) if out_b else np.array([], np.int64), _I64
                ),
                "cnt": pa.array(
                    np.concatenate(out_c) if out_c else np.array([], np.int64), _I64
                ),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # ≤ langs × score-range/64 rows — constant-bounded
        .sort_values(["lang", "bucket"])
    )
    offsets: dict = {}  # (lang, bucket) -> docs in strictly smaller buckets
    totals: dict = {}  # lang -> n_lang
    for lg, g in hist.groupby("lang", sort=False):
        cnt = g["cnt"].to_numpy()
        below = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
        for b, off in zip(g["bucket"].to_numpy(), below):
            offsets[(lg, int(b))] = int(off)
        totals[lg] = int(cnt.sum())
    rank_ref = ray.put((offsets, totals))

    def project(batch: pa.Table) -> pa.Table:
        langs = batch_langs(batch)
        m = _quality_micro(batch, weights)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "lang": pa.array(langs.astype(str), pa.string()),
                "bucket": pa.array(m >> NORM_BUCKET_SHIFT, _I64),
                "score_micro": pa.array(m, _I64),
            }
        )

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        offs, tots = ray.get(rank_ref)
        m = df["score_micro"].to_numpy()
        local = np.searchsorted(np.sort(m), m, side="left")
        lg = df["lang"].iloc[0]
        base = offs[(lg, int(df["bucket"].iloc[0]))]
        pct = (1000 * (base + local)) // tots[lg]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "lang": df["lang"].to_numpy(),
                "score_micro": m,
                "pct_milli": pct.astype(np.int64),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .map_groups(rank_group, batch_format="pandas")
    )


# --- code detection -----------------------------------------------------

CODE_MOD = 4  # doc_id % 4 == 0 rows get the code snippet planted
CODE_SNIPPET = "\ndef f(x):\n    y = x * 2; return {x: y};\nimport os\n"
CODE_KEYWORDS = ("def ", "return ", "import ")
CODE_SYMBOLS = ("{", "}", ";", "=")


def q_code_detect(sf_dir: str):
    """Code-vs-prose routing (the StarCoder/CodeLlama-era split: code
    goes to the code corpus, NOT the NL corpus, and a code-looking doc
    inside a web-text crawl is usually boilerplate or a paste dump):
    per doc, count code keywords and code symbols and flag
    ``is_code = kw_hits >= 2 AND n_braces >= 2 AND n_semi >= 1``.  The
    shipped corpus is pure prose, so a deterministic code snippet is
    PLANTED row-locally on every ``doc_id % CODE_MOD == 0`` row — the
    q_nfc_normalize perturbation idiom — making every feature and the
    flag a live signal the TRUE DuckDB oracle reproduces exactly.

    Scale shape: strictly row-local — suffix append + one vectorized
    ``pc.count_substring`` per keyword/symbol over the Arrow column,
    integer milli math, no shuffle, only (doc_id, text) read."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def detect(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        base = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        sfx = pa.array(
            np.where(ids % CODE_MOD == 0, CODE_SNIPPET, "").tolist(), pa.string()
        )
        t = pc.binary_join_element_wise(base, sfx, "")
        kw = sum(
            np.asarray(pc.count_substring(t, pattern=k), dtype=np.int64)
            for k in CODE_KEYWORDS
        )
        sym = {
            s: np.asarray(pc.count_substring(t, pattern=s), dtype=np.int64)
            for s in CODE_SYMBOLS
        }
        n_braces = sym["{"] + sym["}"]
        n_sym = n_braces + sym[";"] + sym["="]
        n_chars = np.asarray(pc.utf8_length(t), dtype=np.int64)
        code_milli = np.where(n_chars > 0, (1000 * n_sym) // np.maximum(n_chars, 1), 0)
        is_code = (kw >= 2) & (n_braces >= 2) & (sym[";"] >= 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "kw_hits": pa.array(kw, _I64),
                "n_braces": pa.array(n_braces, _I64),
                "n_semi": pa.array(sym[";"], _I64),
                "n_eq": pa.array(sym["="], _I64),
                "code_milli": pa.array(code_milli, _I64),
                "is_code": pa.array(is_code, pa.bool_()),
            }
        )

    return ds.map_batches(detect, batch_format="pyarrow")


# --- langid evaluation --------------------------------------------------

LANGID_NOISE_MOD = 8  # hash64_mixed(url) % 8 == 0 rows get a corrupted declared lang
LANGID_NOISE_ROTATE = {"en": "de", "de": "es", "es": "fr", "fr": "nl", "nl": "en"}


def q_langid_eval(sf_dir: str):
    """LangID router evaluation over the pages corpus — the QA table a
    corpus team reads before trusting the language-resolution rule
    (reference doc.py:146: ``resolved = pred if reliable else declared
    hint``): score every page's extracted text with the committed model
    and count ``(lang_true, lang_pred, lang_resolved)`` confusion cells.

    The page's DECLARED language (the metadata hint the flagship feeds
    LangIdStage's ``lang`` slot) is deterministically CORRUPTED on
    ``hash64_mixed(url) % LANGID_NOISE_MOD == 0`` rows — real crawls
    carry wrong lang attributes — which makes every resolution path a
    live cell at every scale: pages with real content recover the truth
    from trigram evidence regardless of the bad hint (diagonal),
    empty/numeric pages (truth ``un``) detect unreliable and resolve to
    the declared hint, corrupted or not — the off-diagonal
    ``un → lang`` mass that is exactly the failure mode the rule
    accepts in production.  The truth label itself NEVER reaches the
    stage: it is moved to ``lang_true`` before scoring, so the model
    sees only what production sees (text + declared metadata).

    Scale shape: vectorized url hashing for the corruption mask, model
    scoring in the langid actor pool (model loads once per actor), then
    a per-batch ``np.unique`` combiner emits one row per confusion cell
    seen — the exchange is bounded by |langs|³ × blocks, never corpus
    size — and a tiny multi-key groupby merges the partials.  Model op
    → golden-parquet oracle."""
    import glob as _glob

    from textpipe_ray.functions.strhash import hash64_mixed
    from textpipe_ray.stages.actors import LangIdStage

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "text", "lang"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        truth = np.asarray(
            pc.fill_null(pc.cast(batch.column("lang"), pa.string()), "").to_pylist(),
            dtype=object,
        )
        noisy = hash64_mixed(batch.column("url")) % LANGID_NOISE_MOD == 0
        hint = np.where(
            noisy,
            np.asarray([LANGID_NOISE_ROTATE.get(t, t) for t in truth], dtype=object),
            truth,
        )
        idx = batch.column_names.index("lang")
        batch = batch.set_column(idx, "lang", pa.array(hint.tolist(), pa.string()))
        return batch.append_column(
            "lang_true", pa.array(truth.tolist(), pa.string())
        ).append_column("clean", batch.column("text"))

    scored = ds.map_batches(pre, batch_format="pyarrow").map_batches(
        LangIdStage, batch_format="pyarrow", batch_size=1024, concurrency=2
    )

    def confuse(batch: pa.Table) -> pa.Table:
        cols = []
        for name in ("lang_true", "pred_lang", "resolved_lang"):
            cols.append(
                np.asarray(
                    pc.fill_null(pc.cast(batch.column(name), pa.string()), "").to_pylist(),
                    dtype=object,
                ).astype(str)
            )
        trip = np.char.add(
            np.char.add(np.char.add(np.char.add(cols[0], "\x1f"), cols[1]), "\x1f"),
            cols[2],
        )
        uk, cnt = np.unique(trip, return_counts=True)
        parts = [u.split("\x1f", 2) for u in uk]
        t, p, r = ([], [], []) if not parts else zip(*parts)
        return pa.table(
            {
                "lang_true": pa.array(list(t), pa.string()),
                "lang_pred": pa.array(list(p), pa.string()),
                "lang_resolved": pa.array(list(r), pa.string()),
                "n": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    return (
        scored.map_batches(confuse, batch_format="pyarrow")
        .groupby(["lang_true", "lang_pred", "lang_resolved"])
        .aggregate(Sum("n", alias_name="n"))
    )


# --- markup density -------------------------------------------------------

MARKUP_HIGH_MILLI = 600  # tag-char permille at/above which a page is markup-heavy
TEXT_LOW_MILLI = 350     # text-density permille below which a page is boiler-heavy


def q_markup_density(sf_dir: str):
    """Per-page markup/text-density signals — the structural
    boilerplate heuristics (jusText/trafilatura-style) a crawl pipeline
    computes BEFORE committing to full extraction: how much of the raw
    HTML is tags, how much survives as visible text, and how link/
    paragraph-dense the page is.  Emits exact integer permilles and two
    routing flags (``high_markup``: tag chars ≥ 60% of the page;
    ``low_text``: visible text < 35% of the page) — both live in both
    directions at every scale on the synthetic corpus (measured range
    308–937 / 0–683 milli).

    Scale shape: strictly row-local over the pruned ``(url, html,
    text)`` read — one utf8 validation cast, one RE2
    ``replace_substring_regex`` for tag chars, ``pc.count_substring``
    for links/paragraphs; integer ``//`` milli math, no shuffle, and
    the HTML never leaves the task.  Golden oracle (pages table), plus
    an independent DuckDB-regexp cross-check in tests."""
    import glob as _glob

    pages = pages_dir_for(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(f"{pages}/pages-*.parquet")), columns=["url", "html", "text"]
    )

    def density(batch: pa.Table) -> pa.Table:
        # cast validates utf-8; fill_null so a fetch-failure row (null
        # html on real crawl shards) scores 0/0 instead of killing the task
        h = pc.fill_null(pc.cast(batch.column("html"), pa.string()), "")
        t = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        html_chars = np.asarray(pc.utf8_length(h), dtype=np.int64)
        stripped = pc.replace_substring_regex(h, pattern="<[^>]*>", replacement="")
        tag_chars = html_chars - np.asarray(pc.utf8_length(stripped), dtype=np.int64)
        text_chars = np.asarray(pc.utf8_length(t), dtype=np.int64)
        n_links = np.asarray(pc.count_substring(h, pattern="<a "), dtype=np.int64)
        n_paras = np.asarray(pc.count_substring(h, pattern="<p>"), dtype=np.int64)
        denom = np.maximum(html_chars, 1)
        markup_milli = (1000 * tag_chars) // denom
        text_milli = (1000 * text_chars) // denom
        return pa.table(
            {
                "url": batch.column("url"),
                "html_chars": pa.array(html_chars, _I64),
                "tag_chars": pa.array(tag_chars, _I64),
                "n_links": pa.array(n_links, _I64),
                "n_paras": pa.array(n_paras, _I64),
                "markup_milli": pa.array(markup_milli, _I64),
                "text_milli": pa.array(text_milli, _I64),
                "high_markup": pa.array(markup_milli >= MARKUP_HIGH_MILLI),
                "low_text": pa.array(text_milli < TEXT_LOW_MILLI),
            }
        )

    return ds.map_batches(density, batch_format="pyarrow")


# --- tokenizer fertility ---------------------------------------------------

def q_token_fertility(sf_dir: str):
    """Per-language tokenizer fertility QA — the multilingual-fairness
    table (the mT5/XLM-R-era finding: one tokenizer's tokens-per-word
    varies across languages, silently re-weighting any token-budgeted
    data mix): under the SAME committed BPE trainer as q_bpe_train /
    q_vocab_coverage (shared ``_bpe_word_types`` front half — the three
    MUST measure the same tokenizer), per language sum whitespace
    words, BPE tokens and utf-8 text bytes, and report the exact
    integer ratios ``fertility_milli = (1000·n_bpe) // n_words`` and
    ``bytes_per_token_milli = (1000·n_bytes) // n_bpe``.

    Scale shape: the trainer front half is the combiner-bounded
    word-type count (exchange = distinct types × blocks, merge loop on
    the bounded top-V table on the driver); the apply pass is row-local
    encode with the merge table broadcast once (``ray.put``) and a
    per-batch distinct-word cache; a per-batch per-lang combiner then
    emits ONE row per (lang, batch) and a langs-sized groupby + finish
    computes the ratios — nothing corpus-sized moves anywhere.  Golden
    oracle (merge learning is not SQL-expressible)."""
    from textpipe_ray.functions.bpe import token_count

    _, ranks_ref, creg = _bpe_word_types(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        cache: dict[str, int] = {}
        langs = np.asarray(
            pc.fill_null(pc.cast(batch.column("lang"), pa.string()), "").to_pylist(),
            dtype=object,
        )
        text = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        nbytes = np.asarray(pc.binary_length(text), dtype=np.int64)
        n_words = np.zeros(len(langs), np.int64)
        n_bpe = np.zeros(len(langs), np.int64)
        for i, t in enumerate(pc.utf8_lower(text).to_pylist()):
            ws = creg.findall(t or "")
            n_words[i] = len(ws)
            tot = 0
            for w in ws:
                k = cache.get(w)
                if k is None:
                    k = cache[w] = token_count(w, ranks)
                tot += k
            n_bpe[i] = tot
        out_l, out_d, out_w, out_t, out_b = [], [], [], [], []
        for lg in np.unique(langs):
            m = langs == lg
            out_l.append(str(lg))
            out_d.append(int(m.sum()))
            out_w.append(int(n_words[m].sum()))
            out_t.append(int(n_bpe[m].sum()))
            out_b.append(int(nbytes[m].sum()))
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "n_docs": pa.array(out_d, _I64),
                "n_words": pa.array(out_w, _I64),
                "n_bpe_tokens": pa.array(out_t, _I64),
                "n_bytes": pa.array(out_b, _I64),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch.column("n_words"), dtype=np.int64)
        t = np.asarray(batch.column("n_bpe_tokens"), dtype=np.int64)
        b = np.asarray(batch.column("n_bytes"), dtype=np.int64)
        return batch.append_column(
            "fertility_milli", pa.array((1000 * t) // np.maximum(w, 1), _I64)
        ).append_column(
            "bytes_per_token_milli", pa.array((1000 * b) // np.maximum(t, 1), _I64)
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
            Sum("n_bytes", alias_name="n_bytes"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


# --- citation density ------------------------------------------------------

CITE_MOD = 5  # doc_id % 5 == 0 rows get the citation markers planted
CITE_SUFFIX = " As shown in [1] and [12], this holds.[3]"
CITE_REGEX = r"\[[0-9]+\]"
CITE_MIN_HITS = 2  # at/above this many markers a doc is reference-grade


def q_citation_density(sf_dir: str):
    """Citation-marker density — the wiki-style quality prior (pages
    with inline ``[n]`` citations are disproportionately reference
    material, and citation density feeds quality classifiers the way
    ``citation needed`` density feeds Wikipedia's own article scoring):
    per doc, count ``[n]`` markers and normalize to markers per 10k
    chars.  The shipped corpus has no citation markup, so a
    deterministic marker suffix is PLANTED row-locally on every
    ``doc_id % CITE_MOD == 0`` row (the q_nfc_normalize / q_code_detect
    perturbation idiom) — every column and the ``is_reference`` flag
    are live signals in both directions at every scale, and the TRUE
    DuckDB oracle replays the identical plant.

    Scale shape: strictly row-local — one suffix append, one RE2
    ``count_substring_regex`` over the Arrow column, integer per-10k
    math, no shuffle, only (doc_id, text) read."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def cite(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        base = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        sfx = pa.array(
            np.where(ids % CITE_MOD == 0, CITE_SUFFIX, "").tolist(), pa.string()
        )
        t = pc.binary_join_element_wise(base, sfx, "")
        n_cites = np.asarray(
            pc.count_substring_regex(t, pattern=CITE_REGEX), dtype=np.int64
        )
        n_chars = np.asarray(pc.utf8_length(t), dtype=np.int64)
        per_10k = (10_000 * n_cites) // np.maximum(n_chars, 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "n_cites": pa.array(n_cites, _I64),
                "n_chars": pa.array(n_chars, _I64),
                "cites_per_10k": pa.array(per_10k, _I64),
                "is_reference": pa.array(n_cites >= CITE_MIN_HITS),
            }
        )

    return ds.map_batches(cite, batch_format="pyarrow")


# --- k-anonymity release audit ----------------------------------------------

K_ANON = 10  # cells with fewer docs than this are suppressed at release


def q_k_anonymity(sf_dir: str):
    """k-anonymity release audit — the privacy gate a corpus release
    runs over its quasi-identifier cells (here ``(lang, source)``):
    any cell with fewer than ``K_ANON`` documents is flagged
    ``suppressed`` so the release can null or merge it, preventing
    small-cell re-identification of contributors.  Completes the
    privacy family next to ``q_pseudonymize`` (rewrite) and
    ``q_pii_stats`` (incidence).

    Scale shape: per-batch (lang, source, n) combiner → one
    cells-sized groupby (exchange ≤ cells × blocks int rows) →
    row-local flag; nothing corpus-sized moves.  TRUE SQL oracle."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": pc.fill_null(
                        pc.cast(batch.column("lang"), pa.string()), ""
                    ).to_pylist(),
                    "source": pc.fill_null(
                        pc.cast(batch.column("source"), pa.string()), ""
                    ).to_pylist(),
                }
            )
            .groupby(["lang", "source"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64), _I64),
            }
        )

    def flag(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n_docs"), dtype=np.int64)
        return batch.append_column("suppressed", pa.array(n < K_ANON))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .map_batches(flag, batch_format="pyarrow")
    )


# --- crawl frontier discovery -------------------------------------------------

_HOST_RE = r"^[a-z]+://([^/]+)"


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier discovery — the scheduling table a recurring
    crawl derives from its own corpus: every hyperlink TARGET that is
    NOT yet in the corpus, ranked by in-degree (how many corpus links
    point at it) with its distinct-anchor count and whether its host is
    already crawled (``host_pages`` — frontier urls on known hosts are
    cheap politeness-wise; new hosts need discovery budget).

    Scale shape — TWO bounded exchanges, text/HTML never move:
      1. link extraction row-local over the pruned (url, html) read
         with a per-batch (target, anchor, cnt) combiner (the
         q_link_graph plan); the pair partials AND the corpus url set
         co-partition by url hash in ONE tagged exchange, and each
         partition locally aggregates per-target in_degree +
         distinct-anchor count, then drops already-crawled targets
         with a vectorized ``isin`` (the q_validate referential idiom
         — no join operator, output is frontier-sized);
      2. host enrichment: corpus host sizes from a per-batch combiner
         + hosts-sized groupby, LEFT-merged onto the frontier by host
         hash co-partition (unknown hosts keep 0).
    Golden oracle + single-process reference parity test."""
    import glob as _glob
    import re as _re

    import pandas as pd

    pages = pages_dir_for(sf_dir)
    files = sorted(_glob.glob(f"{pages}/pages-*.parquet"))
    # block counts pinned: the parse read wants CPU-width parallelism,
    # the tiny url/partial streams want FEW blocks — near-empty blocks
    # into a Sort cost ~0.1 s each in pure scheduling (the q_pagerank
    # measurement), which dominated this query's first draft (6.9 s)
    ds = ray.data.read_parquet(files, columns=["url", "html"], override_num_blocks=_cpus())
    host_re = _re.compile(_HOST_RE)
    # exchange partitions sized from row-count metadata, not a constant:
    # the frontier table grows with the corpus (each page links at
    # out-of-corpus targets), so the co-partition exchange must widen
    # with it: target ~4k link rows/partition, floor 16 against
    # near-empty-block Sort cost (the q_pagerank measurement), all
    # under the CPU-proportional _join_partitions cap — which binds on
    # SMALL clusters too (the cap wraps the floor, not vice versa).
    # Partition-count changes never change values: per-partition
    # aggregation is keyed by the same hash.
    from textpipe_ray.pipelines.flagship import parquet_rows
    from textpipe_ray.stages.dedup import _join_partitions

    n_pages = parquet_rows(files)
    nparts = int(min(_join_partitions(64), max(16, n_pages // 4_000 + 1)))

    def _parts(strs: list) -> np.ndarray:
        return strhash_part_ids(
            pa.array([s or "" for s in strs], pa.string()), nparts
        ).astype(np.int32)

    def extract(batch: pa.Table) -> pa.Table:
        targets, anchors = [], []
        for _src, tgt, anchor in iter_page_links(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            targets.append(tgt)
            anchors.append(anchor)
        g = (
            pd.DataFrame({"target": targets, "anchor": anchors})
            .groupby(["target", "anchor"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        t = g["target"].tolist()
        return pa.table(
            {
                "target": pa.array(t, pa.string()),
                "anchor": pa.array(g["anchor"].tolist(), pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(dtype=np.int64), _I64),
                "__kind": pa.array(np.ones(len(g), dtype=np.int8), pa.int8()),
                "__jp": pa.array(_parts(t), pa.int32()),
            }
        )

    def tag_urls(batch: pa.Table) -> pa.Table:
        u = batch.column("url").to_pylist()
        return pa.table(
            {
                "target": pa.array(u, pa.string()),
                "anchor": pa.nulls(len(u), pa.string()),
                "cnt": pa.nulls(len(u), _I64),
                "__kind": pa.array(np.zeros(len(u), dtype=np.int8), pa.int8()),
                "__jp": pa.array(_parts(u), pa.int32()),
            }
        )

    def agg_and_anti(t: pd.DataFrame) -> pd.DataFrame:
        known = t.loc[t["__kind"] == 0, "target"].to_numpy(dtype=object)
        cand = t[t["__kind"] == 1]
        if len(cand) == 0:
            return pd.DataFrame(
                {
                    "target": pd.Series(dtype="object"),
                    "in_degree": pd.Series(dtype="int64"),
                    "n_anchors": pd.Series(dtype="int64"),
                }
            )
        g = cand.groupby("target", sort=False).agg(
            in_degree=("cnt", "sum"), n_anchors=("anchor", "nunique")
        )
        out = g[~g.index.isin(known)].reset_index()
        return out.astype({"in_degree": "int64", "n_anchors": "int64"})

    frontier = (
        ds.map_batches(extract, batch_format="pyarrow")
        .union(
            ray.data.read_parquet(
                files, columns=["url"], override_num_blocks=8
            ).map_batches(tag_urls, batch_format="pyarrow")
        )
        .groupby("__jp")
        .map_groups(agg_and_anti, batch_format="pandas")
    )

    # --- 3. host enrichment (LEFT merge by host hash co-partition)
    def host_counts(batch: pa.Table) -> pa.Table:
        hosts = [
            (host_re.match(u or "") or [None, ""])[1]
            for u in batch.column("url").to_pylist()
        ]
        uh, cnt = np.unique(np.asarray(hosts, dtype=object), return_counts=True)
        return pa.table(
            {
                "host": pa.array([str(h) for h in uh], pa.string()),
                "n": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    host_sizes = (
        ray.data.read_parquet(files, columns=["url"], override_num_blocks=8)
        .map_batches(host_counts, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="host_pages"))
    )

    def tag_frontier(batch: pa.Table) -> pa.Table:
        t = batch.column("target").to_pylist()
        hosts = [(host_re.match(u or "") or [None, ""])[1] for u in t]
        return pa.table(
            {
                "target": pa.array(t, pa.string()),
                "in_degree": pc.cast(batch.column("in_degree"), _I64),
                "n_anchors": pc.cast(batch.column("n_anchors"), _I64),
                "host": pa.array(hosts, pa.string()),
                "host_pages": pa.nulls(len(t), _I64),
                "__kind": pa.array(np.ones(len(t), dtype=np.int8), pa.int8()),
                "__jp": pa.array(_parts(hosts), pa.int32()),
            }
        )

    def tag_hosts(batch: pa.Table) -> pa.Table:
        h = batch.column("host").to_pylist()
        return pa.table(
            {
                "target": pa.nulls(len(h), pa.string()),
                "in_degree": pa.nulls(len(h), _I64),
                "n_anchors": pa.nulls(len(h), _I64),
                "host": pa.array(h, pa.string()),
                "host_pages": pc.cast(batch.column("host_pages"), _I64),
                "__kind": pa.array(np.zeros(len(h), dtype=np.int8), pa.int8()),
                "__jp": pa.array(_parts(h), pa.int32()),
            }
        )

    _OUT_DTYPES = {
        "target": "object",
        "in_degree": "int64",
        "n_anchors": "int64",
        "host": "object",
        "host_pages": "int64",
        "host_known": "bool",
    }

    def left_merge(t: pd.DataFrame) -> pd.DataFrame:
        lk = t[t["__kind"] == 0][["host", "host_pages"]]
        rw = t[t["__kind"] == 1][["target", "in_degree", "n_anchors", "host"]]
        if len(rw) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d) for c, d in _OUT_DTYPES.items()})
        m = rw.merge(lk, on="host", how="left", sort=False)
        m["host_pages"] = m["host_pages"].fillna(0)
        m["host_known"] = m["host_pages"] > 0
        return m.astype(_OUT_DTYPES)

    return (
        frontier.map_batches(tag_frontier, batch_format="pyarrow")
        .union(host_sizes.map_batches(tag_hosts, batch_format="pyarrow"))
        .groupby("__jp")
        .map_groups(left_merge, batch_format="pandas")
    )


# --- unigram-LM tokenizer training ------------------------------------------

UNIGRAM_TOP_WORDS = 2000  # EM training vocabulary cap (bounded driver work)
UNIGRAM_MAX_PIECE = 6
UNIGRAM_SEED = 1200
UNIGRAM_V = 800
UNIGRAM_ITERS = 3


def q_unigram_lm(sf_dir: str):
    """Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    unigram model) + corpus apply: the second member of the tokenizer
    family, trained on the SAME distributed word-type table as the BPE
    trainer (shared ``_word_types`` front half, so the two tokenizers
    are directly comparable on identical counts).  Per document the
    output is whitespace words, unigram pieces under the learned vocab
    and UNK fallbacks — the fertility/coverage signal a tokenizer bake-
    off reads.

    Physical plan (the q_bpe_train shape): (1) combiner-bounded
    word-type exchange — distinct types × blocks, never token
    instances; (2) Viterbi-EM on the driver over the top
    ``UNIGRAM_TOP_WORDS`` types (functions/unigram.py: integer expected
    counts, deterministic tie-breaks — constant work); (3) the piece
    log-prob table broadcasts once (``ray.put``) and every batch
    encodes row-locally with a per-batch distinct-word cache.  Golden
    oracle (EM training is not SQL-expressible) + single-process
    reference equality test."""
    from textpipe_ray.functions.unigram import em_train, viterbi_pieces

    types, creg = _word_types(sf_dir)
    top = (
        types.sort(["n", "word"], descending=[True, False])
        .limit(UNIGRAM_TOP_WORDS)
        .take_all()
    )
    logp = em_train(
        [(r["word"], r["n"]) for r in top],
        UNIGRAM_MAX_PIECE,
        UNIGRAM_SEED,
        UNIGRAM_V,
        UNIGRAM_ITERS,
    )
    logp_ref = ray.put(logp)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        lp = ray.get(logp_ref)
        cache: dict[str, tuple[int, int]] = {}
        n_words, n_pieces, n_unk = [], [], []
        for t in pc.utf8_lower(batch.column("text")).to_pylist():
            ws = creg.findall(t or "")
            tot_p = tot_u = 0
            for w in ws:
                v = cache.get(w)
                if v is None:
                    pieces = viterbi_pieces(w, lp, UNIGRAM_MAX_PIECE)
                    v = cache[w] = (
                        len(pieces),
                        sum(1 for p in pieces if p not in lp),
                    )
                tot_p += v[0]
                tot_u += v[1]
            n_words.append(len(ws))
            n_pieces.append(tot_p)
            n_unk.append(tot_u)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "n_words": pa.array(n_words, _I64),
                "n_pieces": pa.array(n_pieces, _I64),
                "n_unk": pa.array(n_unk, _I64),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


# --- DoReMi-style domain reweighting ----------------------------------------

DOREMI_ROUNDS = 4
DOREMI_CLIP_MICRO = 200_000  # per-round multiplicative step clipped to ±0.2
DOREMI_SCALE = 1_000_000
# added to every per-doc micro score so every sum/mean/division operand
# stays positive (DuckDB // truncates, Python // floors — they agree on
# positives); the offset cancels exactly in the signal (a difference of
# means) and is subtracted back out of the reported mean (n·OFF is
# divisible by n, so floor((sum+n·OFF)/n) − OFF = floor(sum/n))
DOREMI_OFFSET = 8_000_000


def q_domain_reweight(sf_dir: str):
    """Multiplicative-weights domain reweighting — the DoReMi (Xie et
    al. 2023) mixing machinery on a SQL-checkable signal: per source
    domain, ``DOREMI_ROUNDS`` rounds of ``w ← w·(1 + clip(signal))``
    where ``signal`` is the domain's mean quality score minus the
    CURRENT weighted corpus mean, so above-average domains tilt up and
    the fixed point re-centers each round (DoReMi's proxy-model excess
    loss is replaced by the learned quality score — the iteration,
    clipping and normalization are the same shape).  All arithmetic is
    exact integer micro units: every division has positive operands
    (eta is folded into the clip bound) because DuckDB's ``//``
    truncates while Python floors — positives make them agree.

    Scale shape: ONE bounded exchange — a per-batch (source, n, sum)
    combiner then a sources-sized groupby — and a driver loop over the
    ~20-row domain table (constant work, the PCA-finisher idiom); no
    row-level data moves.  TRUE SQL oracle: the rounds unroll into
    generated chained CTEs over the same aggregate."""
    from textpipe_ray.functions.quality_score import load_weights

    weights = load_weights()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        micro = _quality_micro(batch, weights) + DOREMI_OFFSET
        if micro.size and int(micro.min()) <= 0:
            # survives python -O: a non-positive operand would silently
            # break the floor-vs-truncate division parity with DuckDB
            raise ValueError("DOREMI_OFFSET too small for this score range")
        src = np.asarray(
            pc.fill_null(pc.cast(batch.column("source"), pa.string()), "").to_pylist(),
            dtype=object,
        )
        out_s, out_n, out_m = [], [], []
        for s in np.unique(src):
            m = src == s
            out_s.append(str(s))
            out_n.append(int(m.sum()))
            out_m.append(int(micro[m].sum()))
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "n_docs": pa.array(out_n, _I64),
                "sum_micro": pa.array(out_m, _I64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_micro", alias_name="sum_micro"),
        )
        .to_pandas()  # sources-sized (~20 rows) — bounded driver collect
        .sort_values("source")
        .reset_index(drop=True)
    )
    srcs = agg["source"].tolist()
    if not srcs:  # empty corpus: match the oracle's empty result
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], _I64),
                "mean_score_micro": pa.array([], _I64),
                "weight_micro": pa.array([], _I64),
            }
        )
    n_docs = [int(v) for v in agg["n_docs"]]
    means_off = [int(s) // int(n) for s, n in zip(agg["sum_micro"], agg["n_docs"])]
    w = [DOREMI_SCALE] * len(srcs)  # python ints: exact, unbounded
    for _ in range(DOREMI_ROUNDS):
        gm = sum(wi * mi for wi, mi in zip(w, means_off)) // sum(w)
        w = [
            wi
            * (
                DOREMI_SCALE
                + max(-DOREMI_CLIP_MICRO, min(DOREMI_CLIP_MICRO, mi - gm))
            )
            // DOREMI_SCALE
            for wi, mi in zip(w, means_off)
        ]
    tot = sum(w)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array(n_docs, _I64),
            "mean_score_micro": pa.array(
                [m - DOREMI_OFFSET for m in means_off], _I64
            ),
            "weight_micro": pa.array([wi * DOREMI_SCALE // tot for wi in w], _I64),
        }
    )


# --- PII pseudonymization ---------------------------------------------------

PSEUDO_MOD = 4  # doc_id % 4 == 0 rows get the email plant
# the email pattern comes from the COMMITTED scrub ruleset so
# q_pseudonymize stays "q_scrub with stable tokens" — the two can't
# silently diverge on what counts as an email (both the engine kernel
# and the generated SQL oracle read this one constant)
PSEUDO_EMAIL_RE = next(
    r["pattern"] for r in load_rules()["rules"] if r["name"] == "email"
)


def q_pseudonymize(sf_dir: str):
    """Keyed PII pseudonymization — the privacy rewrite that plain
    scrubbing (q_scrub's fixed ``<EMAIL>`` token) cannot do: every
    email is replaced by a STABLE pseudonym ``<EMAIL_xxxxxxxx>``
    (first 8 hex of md5 of the matched entity), so post-scrub analyses
    can still count entity frequency and co-occurrence while the raw
    identifier never leaves the task.  The shipped corpus carries no
    emails (checked: zero '@' at every scale), so a deterministic
    per-doc email + a REPEATED global entity (``admin@example.com`` —
    its pseudonym must be identical across every doc, the stability
    property under test) are planted row-locally on every
    ``doc_id % PSEUDO_MOD == 0`` row; the TRUE DuckDB oracle replays
    the plant and rebuilds the interleaved text with the SAME md5.

    Scale shape: strictly row-local — regex split/findall per doc
    (C-level regex), ONE batched md5 over the flattened match list
    (functions/strhash.md5_hex), positional rebuild; no shuffle, only
    (doc_id, text) read."""
    import re

    from textpipe_ray.functions.strhash import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    creg = re.compile(PSEUDO_EMAIL_RE)

    def scrub(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column("doc_id"), _I64), dtype=np.int64)
        base = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        sfx = pa.array(
            [
                f" Contact user{i}@example.com and admin@example.com."
                if i % PSEUDO_MOD == 0
                else ""
                for i in ids
            ],
            pa.string(),
        )
        texts = pc.binary_join_element_wise(base, sfx, "").to_pylist()
        parts_per_row: list[list[str]] = []
        ms_per_row: list[list[str]] = []
        flat: list[str] = []
        for t in texts:
            ms = creg.findall(t)
            parts_per_row.append(creg.split(t))
            ms_per_row.append(ms)
            flat.extend(ms)
        digests = md5_hex(pa.array(flat, pa.string())) if flat else []
        out_text, n_pii, n_distinct = [], [], []
        pos = 0
        for parts, ms in zip(parts_per_row, ms_per_row):
            pieces = [parts[0]]
            for j in range(len(ms)):
                pieces.append(f"<EMAIL_{digests[pos + j][:8]}>")
                pieces.append(parts[j + 1])
            pos += len(ms)
            out_text.append("".join(pieces))
            n_pii.append(len(ms))
            n_distinct.append(len(set(ms)))
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "scrubbed": pa.array(out_text, pa.string()),
                "n_pii": pa.array(n_pii, _I64),
                "n_distinct": pa.array(n_distinct, _I64),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


# --- distributed k-means ----------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5
KMEANS_Q = 1_000_000  # micro fixed-point for centroid sums and distances


def q_kmeans(sf_dir: str):
    """Full-corpus distributed k-means over the embedding table — the
    curation clustering primitive (DataComp/SemDeDup-style corpus
    bucketing, topic balancing, per-cluster sampling) as a first-class
    operator: unlike ``q_semdedup``'s sample-fitted centroids, every
    Lloyd iteration here reduces over EVERY row, with the fixed-point
    integer contract of ``q_embedding_pca`` making the result
    bit-identical under any batching, block order, or cluster size.

    Scale shape:
      1. seeds: ``KMEANS_K`` rows via the hash-uniform bounded sample
         (stages/ann._uniform_sample — survives cluster-sorted
         corpora), one streaming pass;
      2. each of ``KMEANS_ITERS`` iterations: centroids broadcast via
         ``ray.put``; per batch, rows assign to the nearest centroid
         (row-local float64 argmin) and each ROW's embedding quantizes
         to int64 micro BEFORE the per-cell sum — the per-block partial
         is ≤ K rows of (cell, n, 64 int64s), a bounded driver collect
         (K·blocks rows, like the PCA moment pass); empty cells keep
         their previous centroid;
      3. final pass: row-local assignment, emitting
         (vec_id, cell, sqdist_micro).
    The embeddings read is column-pruned and materialized ONCE into
    spillable object-store blocks; the T iteration passes re-read those
    blocks zero-copy instead of re-parsing parquet.  Golden oracle
    (iterative k-means is not SQL-expressible) + single-process
    integer-contract parity test."""
    from textpipe_ray.stages.ann import _uniform_sample

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cents = _uniform_sample(ds, KMEANS_K, "vec_id", "embedding")

    def partial_factory(cents_ref):
        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            x = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            if x.size == 0:
                return pa.table(
                    {
                        "cell": pa.array([], _I64),
                        "n": pa.array([], _I64),
                        "s": pa.array([], pa.list_(pa.int64())),
                    }
                )
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            xi = np.floor(x * KMEANS_Q).astype(np.int64)  # per-ROW quantize
            cells, ns, sums = [], [], []
            for cell in np.unique(assign):
                m = assign == cell
                cells.append(int(cell))
                ns.append(int(m.sum()))
                sums.append(xi[m].sum(axis=0).tolist())
            return pa.table(
                {
                    "cell": pa.array(cells, _I64),
                    "n": pa.array(ns, _I64),
                    "s": pa.array(sums, pa.list_(pa.int64())),
                }
            )

        return partial

    for _ in range(KMEANS_ITERS):
        parts = ds.map_batches(
            partial_factory(ray.put(cents)), batch_format="pyarrow"
        ).to_pandas()  # ≤ K rows per block
        new = cents.copy()
        for cell in range(len(cents)):
            rows = parts[parts["cell"] == cell]
            n = int(rows["n"].sum())
            if n > 0:
                s = np.sum([np.asarray(v, dtype=np.int64) for v in rows["s"]], axis=0)
                new[cell] = (s / KMEANS_Q) / n
        cents = new

    cents_ref = ray.put(cents)

    def finish(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        x = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, c.shape[1]))
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        sq = np.floor(d[np.arange(len(x)), assign] * KMEANS_Q).astype(np.int64)
        return pa.table(
            {
                "vec_id": pc.cast(batch.column("vec_id"), _I64),
                "cell": pa.array(assign.astype(np.int64), _I64),
                "sqdist_micro": pa.array(sq, _I64),
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")
