"""Persisted inverted-index (posting-list) layout + pruned-read BM25.

The lexical-retrieval analog of :mod:`textpipe_ray.stages.ann`'s IVF
layout: the tokenized corpus is written ONCE as posting rows
hive-partitioned by term-hash bucket, and a query then opens ONLY the
bucket partitions its terms hash to — file-level read pruning, the
executable form of "a keyword query touches |query terms| / num_buckets
of the index bytes" that a 100 TB corpus requires (a full-scan BM25
like :func:`~textpipe_ray.pipelines.queries.q_bm25` reads the whole
feature table per query; this layout amortizes ONE build pass across
every subsequent query).

Design points, mirrored from the minhash/IVF index contracts:

* postings are DENORMALIZED — each row carries ``(term, doc_id, tf,
  dl)`` with the document length inline, so scoring after the pruned
  read never joins back to a corpus-sized doc table;
* global corpus stats (``n_docs``, ``sum_dl``) are collected in the
  SAME tokenize pass as per-batch stats rows routed to a reserved
  stats bucket, then folded into ``_meta.json`` — one text pass total,
  and the text never enters a shuffle;
* per-term document frequency is NOT stored: all postings for a term
  live in its bucket, so the pruned read recovers exact ``df`` for the
  query terms by counting rows — stored df would go stale under
  appends;
* ``_meta.json`` records the layout format id, the tokenizer pattern
  and the bucket count, and is written LAST (atomic temp+rename); a
  reader refuses a layout built with a different tokenizer or format
  (the minhash-index kernel-guard pattern — a silently mismatched
  tokenizer would zero out recall);
* ``path`` must be shared storage on a multi-node cluster (same
  contract as the minhash and IVF layouts).

BM25 scoring reproduces ``q_bm25``'s float expression tree exactly
(left-fold over terms in declaration order, same parenthesization,
``floor(score*1e6)`` quantization, doc_id tie-break): missing terms
contribute exactly ``+0.0``, and IEEE ``x + 0.0 == x`` for the
non-negative partial sums here, so folding only the PRESENT terms in
term order is bit-identical to the dense fold — asserted against the
full-scan engine in tests.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from textpipe_ray.functions.strhash import hash64

_I64 = pa.int64()
_F64 = pa.float64()

POSTINGS_FORMAT = "textpipe_ray-postings-v1"


def term_buckets(terms, num_buckets: int) -> np.ndarray:
    """Stable term → bucket ids (the write and read sides MUST agree,
    so both call this one function)."""
    return (hash64(pa.array(list(terms), pa.string())) % np.uint64(num_buckets)).astype(
        np.int64
    )


def _postings_sources(path: str, meta: dict) -> list[str]:
    """Root directories holding committed bucket partitions (base dir
    unless retired by a compaction, plus every committed generation —
    the IVF/minhash generational contract)."""
    roots = [path] if meta.get("base", True) else []
    roots.extend(f"{path}/gen-{g}" for g in meta.get("gens", []))
    return roots


def _write_postings_meta(path: str, meta: dict) -> None:
    """Atomic commit marker: data files first, meta bump LAST, so a
    crashed append/compact is invisible and retries are idempotent."""
    tmp = f"{path}/_meta.json.tmp"
    with open(tmp, "w", encoding="utf8") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/_meta.json")


def _explode_fn(token_pattern: str, num_buckets: int, id_col: str, text_col: str):
    """Tokenize-and-bucket batch fn shared by the base write and every
    append (the same kernel MUST produce both, or generations would
    disagree on bucketing)."""
    import re as _re

    stats_bucket = num_buckets

    def explode(batch: pa.Table) -> pa.Table:
        tok_re = _re.compile(token_pattern)
        ids = np.asarray(pc.cast(batch.column(id_col), _I64), dtype=np.int64)
        texts = batch.column(text_col).to_pylist()
        out_term: list[str] = []
        out_id: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        sum_dl = 0
        for i, t in enumerate(texts):
            toks = tok_re.findall((t or "").lower())
            dl = len(toks)
            sum_dl += dl
            if not toks:
                continue
            uniq, cnt = np.unique(toks, return_counts=True)
            out_term.extend(uniq.tolist())
            out_id.extend([int(ids[i])] * len(uniq))
            out_tf.extend(cnt.tolist())
            out_dl.extend([dl] * len(uniq))
        bucket = term_buckets(out_term, num_buckets) if out_term else np.zeros(0, np.int64)
        # one stats row per batch, routed to the reserved bucket: doc
        # count in tf, token total in dl — the meta fold below reads
        # ONLY this tiny partition, never the postings
        return pa.table(
            {
                "term": pa.array(out_term + [""], pa.string()),
                "doc_id": pa.array(out_id + [-1], _I64),
                "tf": pa.array(out_tf + [len(ids)], _I64),
                "dl": pa.array(out_dl + [sum_dl], _I64),
                "bucket": pa.array(np.concatenate([bucket, [stats_bucket]]).astype(np.int64), _I64),
            }
        )

    return explode


def _fold_stats(root: str, num_buckets: int) -> tuple[int, int]:
    """(n_docs, sum_dl) from a root's reserved stats bucket."""
    stats = ray.data.read_parquet(
        sorted(_glob.glob(f"{root}/bucket={num_buckets}/*.parquet")),
        columns=["tf", "dl"],
    ).take_all()
    return (
        int(sum(int(r["tf"]) for r in stats)),
        int(sum(int(r["dl"]) for r in stats)),
    )


def write_postings_layout(
    ds: "ray.data.Dataset",
    path: str,
    token_pattern: str,
    num_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Tokenize ``ds`` once and persist posting rows partitioned by
    term-hash bucket; returns the committed meta dict.  Bucket
    ``num_buckets`` (one past the last term bucket) holds the per-batch
    corpus-stats rows.  Retry-idempotent like append/compact: a crashed
    earlier build (bucket dirs without a committed meta) is cleared
    first — write_parquet appends files, so stale partials would
    otherwise double-count postings AND stats."""
    import shutil as _sh

    for d in _glob.glob(f"{path}/bucket=*") + _glob.glob(f"{path}/gen-*"):
        _sh.rmtree(d, ignore_errors=True)
    try:
        os.remove(f"{path}/_meta.json")
    except FileNotFoundError:
        pass
    explode = _explode_fn(token_pattern, num_buckets, id_col, text_col)
    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )
    n_docs, sum_dl = _fold_stats(path, num_buckets)
    meta = {
        "format": POSTINGS_FORMAT,
        "token_pattern": token_pattern,
        "num_buckets": num_buckets,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "base": True,
        "gens": [],
    }
    _write_postings_meta(path, meta)
    return meta


def append_postings_layout(
    path: str,
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Grow a persisted postings layout with a new document snapshot —
    the retrieval side of the index LIFECYCLE the minhash and IVF
    layouts already have (write → append generations → compact): the
    snapshot is tokenized with the LAYOUT'S OWN tokenizer and bucket
    count (read from meta, never re-specified — a drifting kernel would
    split a term across buckets) into a fresh ``gen-N`` directory;
    corpus stats accumulate into the meta, committed by the atomic bump
    written LAST.  Queries see base + every committed generation, and
    per-term df stays exact because it is counted from the pruned read,
    never stored.  Returns the new generation id."""
    import shutil as _sh

    meta = postings_meta(path)
    nb = int(meta["num_buckets"])
    gen = max(meta["gens"], default=0) + 1
    # a crashed earlier attempt may have left an UNCOMMITTED gen dir;
    # write_parquet appends files, so clear it for idempotent retries
    _sh.rmtree(f"{path}/gen-{gen}", ignore_errors=True)
    explode = _explode_fn(meta["token_pattern"], nb, id_col, text_col)
    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        f"{path}/gen-{gen}", partition_cols=["bucket"]
    )
    n_docs, sum_dl = _fold_stats(f"{path}/gen-{gen}", nb)
    meta["n_docs"] = int(meta["n_docs"]) + n_docs
    meta["sum_dl"] = int(meta["sum_dl"]) + sum_dl
    meta["gens"] = meta["gens"] + [gen]
    _write_postings_meta(path, meta)
    return gen


def compact_postings_layout(path: str) -> None:
    """Merge base + every committed generation into ONE fresh
    generation and retire the old directories — restores O(buckets)
    read fan-in after many snapshot appends.  A streaming
    bucket-partitioned copy (rows already carry their bucket in the dir
    name — no re-tokenization, no re-hashing); corpus stats are already
    folded in the meta, so stats buckets are simply not copied.  The
    atomic meta swap commits; readers see the old generation set or the
    compacted one, never a mix."""
    import shutil as _sh

    import pyarrow.parquet as _pq

    meta = postings_meta(path)
    if not meta.get("gens"):
        return  # base only — nothing to compact
    nb = int(meta["num_buckets"])
    old_roots = _postings_sources(path, meta)
    files: list[str] = []
    for root in old_roots:
        for bkt in range(nb):  # skip the stats bucket: meta holds totals
            files.extend(sorted(_glob.glob(f"{root}/bucket={bkt}/*.parquet")))
    gen = max(meta["gens"]) + 1
    _sh.rmtree(f"{path}/gen-{gen}", ignore_errors=True)

    def stamp(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("path"), r"bucket=(?P<bucket>\d+)/"),
                "bucket",
            ),
            _I64,
        )
        return batch.drop_columns(["path"]).append_column("bucket", bucket)

    phys_cols = [
        n for n in _pq.ParquetFile(files[0]).schema_arrow.names if n != "bucket"
    ]
    ray.data.read_parquet(files, columns=phys_cols, include_paths=True).map_batches(
        stamp, batch_format="pyarrow"
    ).write_parquet(f"{path}/gen-{gen}", partition_cols=["bucket"])
    meta["gens"] = [gen]
    meta["base"] = False
    _write_postings_meta(path, meta)
    # retirement after the commit point: a crash here only leaks dirs
    for root in old_roots:
        if root == path:
            for d in _glob.glob(f"{path}/bucket=*"):
                _sh.rmtree(d, ignore_errors=True)
        else:
            _sh.rmtree(root, ignore_errors=True)


def postings_meta(path: str, token_pattern: str | None = None) -> dict:
    """Committed-layout manifest; refuses a foreign format or (when the
    caller declares its tokenizer) a mismatched token pattern."""
    with open(f"{path}/_meta.json", "r", encoding="utf8") as f:
        meta = json.load(f)
    if meta.get("format") != POSTINGS_FORMAT:
        raise ValueError(f"not a {POSTINGS_FORMAT} layout: {path}")
    if token_pattern is not None and meta["token_pattern"] != token_pattern:
        raise ValueError(
            "postings layout was built with a different tokenizer: "
            f"{meta['token_pattern']!r} != {token_pattern!r}"
        )
    return meta


def bm25_topk_layout(
    path: str,
    terms: tuple[str, ...] | list[str],
    topk: int,
    k1: float = 1.2,
    b: float = 0.75,
    token_pattern: str | None = None,
) -> "ray.data.Dataset":
    """BM25 top-k over a persisted postings layout, opening ONLY the
    bucket partitions the query terms hash to.  Exchange budget: the
    pruned read streams the query terms' postings (never the corpus);
    per-row term scores move through ONE ``__p`` exchange bounded by
    candidate postings; each partition folds a doc's term scores in
    term-declaration order (bit-equal to the dense left fold, see
    module docstring) and emits a partial top-k, merged in one final
    block.  Returns ``(doc_id, bm25_micro)`` — only docs matching ≥1
    query term appear (a zero-match doc scores exactly 0 and carries no
    posting row)."""
    import pandas as pd

    meta = postings_meta(path, token_pattern)
    nb = int(meta["num_buckets"])
    n_docs = int(meta["n_docs"])
    avgdl = float(meta["sum_dl"]) / float(n_docs)
    terms = list(terms)
    tb = term_buckets(terms, nb)
    need = sorted(set(int(x) for x in tb))
    # committed sources only: base (unless retired by compaction) plus
    # every generation in the meta — in-flight appends are invisible
    files: list[str] = []
    for root in _postings_sources(path, meta):
        for bkt in need:
            files.extend(sorted(_glob.glob(f"{root}/bucket={bkt}/*.parquet")))
    if not files:
        # none of the query terms' buckets exist (corpus contains no
        # query term): the full-scan engine returns zero-score docs,
        # this layout's contract is the ≥1-term restriction → empty
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], _I64), "bm25_micro": pa.array([], _I64)})
        )
    cand = (
        ray.data.read_parquet(files, columns=["term", "doc_id", "tf", "dl"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("term"), pa.array(terms, pa.string()))),
            batch_format="pyarrow",
        )
        .materialize()  # bounded: postings of the query terms only
    )

    # exact df per term from the pruned read (constant-size partials)
    def df_partial(batch: pa.Table) -> pa.Table:
        tcol = batch.column("term").to_pylist()
        u, c = np.unique(tcol, return_counts=True) if tcol else (np.array([]), np.array([]))
        return pa.table(
            {"term": pa.array(u.tolist(), pa.string()), "df": pa.array(c.astype(np.int64), _I64)}
        )

    df = {t: 0 for t in terms}
    for r in cand.map_batches(df_partial, batch_format="pyarrow").take_all():
        df[r["term"]] += int(r["df"])
    dfv = np.array([df[t] for t in terms], dtype=np.float64)
    idf = np.log(1.0 + ((float(n_docs) - dfv) + 0.5) / (dfv + 0.5))
    jmap = {t: j for j, t in enumerate(terms)}
    num_parts = 16

    def row_scores(batch: pa.Table) -> pa.Table:
        j = np.array([jmap[t] for t in batch.column("term").to_pylist()], dtype=np.int64)
        tf = np.asarray(batch.column("tf"), dtype=np.int64).astype(np.float64)
        dl = np.asarray(batch.column("dl"), dtype=np.int64).astype(np.float64)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        norm = k1 * ((1.0 - b) + b * (dl / avgdl))
        s = idf[j] * ((tf * (k1 + 1.0)) / (tf + norm))
        return pa.table(
            {
                "doc_id": pa.array(ids, _I64),
                "j": pa.array(j, _I64),
                "s": pa.array(s, _F64),
                "__p": pa.array(
                    ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def fold_topk(part: "pd.DataFrame") -> "pd.DataFrame":
        # sort (doc, j) then reduceat: left-to-right within each doc ==
        # the dense fold's term-order sum, bit-exactly
        d = part.sort_values(["doc_id", "j"], kind="stable")
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        s = d["s"].to_numpy(dtype=np.float64)
        starts = np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))
        doc = ids[starts]
        tot = np.add.reduceat(s, starts)
        micro = np.floor(tot * 1000000.0).astype(np.int64)
        order = np.lexsort((doc, -micro))[:topk]
        return pd.DataFrame({"doc_id": doc[order], "bm25_micro": micro[order]})

    def merge_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        micro = np.asarray(batch.column("bm25_micro"), dtype=np.int64)
        order = np.lexsort((ids, -micro))[:topk]
        return pa.table(
            {"doc_id": pa.array(ids[order], _I64), "bm25_micro": pa.array(micro[order], _I64)}
        )

    return (
        cand.map_batches(row_scores, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(merge_topk, batch_format="pyarrow")
    )
