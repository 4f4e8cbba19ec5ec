"""Vectorized 64-bit string hashing over Arrow string columns.

The flagship's hottest stage hashes every url (partition id) and every
cleaned text (dedup key) — at 10^12 docs a per-row ``hashlib`` loop is
billions of interpreter iterations in the one stage every byte passes
through.  This module provides:

- :func:`hash64` — a numpy-vectorized polynomial hash computed directly
  on the Arrow string column's UTF-8 data buffer (zero string
  materialization, no per-row Python).  Used wherever the hash only
  needs to be deterministic and well-mixed (partition ids, shuffle
  salts, LSH bucket keys) — NOT where a specific digest is part of the
  output contract.
- :func:`md5_hex` — md5 hex digests via memoryview slices of the same
  buffer (keeps DuckDB ``md5()`` parity for oracle-checked dedup keys
  while skipping the ``to_pylist`` → ``str.encode`` round-trip of the
  naive loop).

Both accept a ``pa.Array``/``pa.ChunkedArray`` of ``string`` or
``large_string``; nulls hash as the empty string.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# FNV-like odd multiplier; wraparound multiplication in uint64 is the
# intended modular arithmetic (numpy emits overflow warnings otherwise,
# hence the errstate guards below)
_MULT = np.uint64(0x9E3779B97F4A7C15)
_OFFSET = np.uint64(0xCBF29CE484222325)


def _flat_utf8(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (byte buffer, per-string starts, per-string ends) for a flat
    string array, as numpy views over the Arrow buffers (zero-copy)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_large_binary(arr.type) else pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offsets[:-1].astype(np.int64), offsets[1:].astype(np.int64)


def hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit polynomial hash per string, fully
    vectorized: ``h(s) = offset·M^len + Σ bytes[i]·M^(len-1-i)``
    (mod 2^64).  The leading offset term separates strings that are
    prefixes of each other; the multiplier mixes all 64 bits.

    MEMORY: the vectorization materializes ~32 bytes of int64/uint64
    temporaries per input BYTE (src_idx, gathered bytes, exponents,
    terms).  Intended for short-string columns (urls, tokens, chunk
    keys); hashing full document-text columns amplifies a 128 MB batch
    to ~4 GB of temporaries — slice such batches to byte-bounded chunks
    first, or hash a bounded prefix."""
    data, starts, ends = _flat_utf8(arr)
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = ends - starts
    total = int(lens.sum())
    out = np.full(n, _OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if total:
            maxlen = int(lens.max())
            # pows[k] = M^k (mod 2^64)
            pows = np.empty(maxlen + 1, dtype=np.uint64)
            pows[0] = np.uint64(1)
            np.multiply.accumulate(
                np.full(maxlen, _MULT, dtype=np.uint64), out=pows[1:]
            )
            nz = lens > 0
            # gather the referenced byte ranges (strings may not be
            # contiguous when the array is sliced)
            within = (
                np.arange(int(lens[nz].sum()), dtype=np.int64)
                - np.repeat(np.cumsum(lens[nz]) - lens[nz], lens[nz])
            )
            src_idx = np.repeat(starts[nz], lens[nz]) + within
            b = data[src_idx].astype(np.uint64)
            # weight of byte i in string s: M^(len_s - 1 - i)
            exp = np.repeat(lens[nz] - 1, lens[nz]) - within
            terms = b * pows[exp]
            seg_starts = np.cumsum(lens[nz]) - lens[nz]
            sums = np.add.reduceat(terms, seg_starts)
            out[nz] = _OFFSET * pows[lens[nz]] + sums
        empty = lens == 0
        if empty.any():
            out[empty] = _OFFSET
    return out


def part_ids(arr: pa.Array | pa.ChunkedArray, num_parts: int) -> np.ndarray:
    """Stable partition ids in [0, num_parts) from :func:`hash64`."""
    return (hash64(arr) % np.uint64(num_parts)).astype(np.int32)


_FIN1 = np.uint64(0xBF58476D1CE4E5B9)
_FIN2 = np.uint64(0x94D049BB133111EB)


def avalanche(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer.  The raw polynomial :func:`hash64` has NO
    output mixing: strings differing only in the final character yield
    SEQUENTIAL hashes (fine for modulo partitioning — adjacent values
    spread round-robin — but fatal for anything reading bit patterns:
    HLL leading-zero ranks, LSH buckets, top-bit indexing).  Apply this
    whenever individual hash BITS must look uniform."""
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(30)
        h *= _FIN1
        h ^= h >> np.uint64(27)
        h *= _FIN2
        h ^= h >> np.uint64(31)
    return h


def hash64_mixed(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """:func:`hash64` + :func:`avalanche` — uniform in every bit."""
    return avalanche(hash64(arr))


_CHUNK_HASH_BYTES = 4 << 20


def hash64_mixed_chunked(
    arr: pa.Array | pa.ChunkedArray, max_bytes: int = _CHUNK_HASH_BYTES
) -> np.ndarray:
    """:func:`hash64_mixed` computed over byte-bounded zero-copy slices
    of the column — bit-identical output, bounded temporaries.

    :func:`hash64` materializes ~32 bytes of int64/uint64 temporaries
    per input BYTE; on a full-document text column a 128 MB batch would
    transiently allocate ~4 GB inside one map task.  Slicing the Arrow
    array (zero-copy) so each slice holds ≤ ``max_bytes`` of string
    data caps the transient at ~32·max_bytes (default 4 MiB → ≤
    ~128 MB) regardless of batch or document size.  Use this form for
    document-text columns; the plain functions stay on short-string
    columns (urls, tokens, chunk keys) where slicing is overhead."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    nbytes = np.asarray(pc.fill_null(pc.binary_length(arr), 0), dtype=np.int64)
    cum = np.cumsum(nbytes)
    if int(cum[-1]) <= max_bytes:
        return hash64_mixed(arr)
    out = np.empty(n, dtype=np.uint64)
    lo = 0
    while lo < n:
        base = int(cum[lo - 1]) if lo else 0
        # furthest hi with ≤ max_bytes of data in [lo, hi); always ≥
        # lo+1 so a single oversized document still makes progress
        hi = max(int(np.searchsorted(cum, base + max_bytes, side="right")), lo + 1)
        out[lo:hi] = hash64_mixed(arr.slice(lo, hi - lo))
        lo = hi
    return out


_RW_BASE = np.uint64(0x100000001B5)  # odd → invertible mod 2^64
_RW_BASE_INV = np.uint64(pow(0x100000001B5, -1, 1 << 64))

# Base-power tables grow once per process and are sliced per call —
# rebuilding them was 4 redundant O(n) cumprods per document in the
# substring-dedup hot kernel.  Safe because map tasks are
# single-threaded per worker process.
_RW_POWS = np.array([1], dtype=np.uint64)
_RW_INV_POWS = np.array([1], dtype=np.uint64)


def _pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    global _RW_POWS, _RW_INV_POWS
    if len(_RW_POWS) < n:
        m = max(n, 2 * len(_RW_POWS))
        with np.errstate(over="ignore"):
            pw = np.empty(m, dtype=np.uint64)
            pw[0] = 1
            np.cumprod(np.full(m - 1, _RW_BASE, dtype=np.uint64), out=pw[1:])
            iv = np.empty(m, dtype=np.uint64)
            iv[0] = 1
            np.cumprod(np.full(m - 1, _RW_BASE_INV, dtype=np.uint64), out=iv[1:])
        _RW_POWS, _RW_INV_POWS = pw, iv
    return _RW_POWS, _RW_INV_POWS


def poly_prefix(codes: np.ndarray) -> np.ndarray:
    """Weighted polynomial prefix sums of one document's codepoints —
    compute ONCE per document, then hash windows of any width at any
    starts with :func:`window_hash64_from_prefix` (the substring-dedup
    kernel hashes anchor grams AND full windows from the same prefix)."""
    n = len(codes)
    pw, _ = _pow_tables(n)
    prefix = np.zeros(n + 1, dtype=np.uint64)
    if n:
        with np.errstate(over="ignore"):
            weighted = codes.astype(np.uint64) * pw[n - 1 :: -1]
            np.cumsum(weighted, out=prefix[1:])
    return prefix


def window_hash64_from_prefix(
    prefix: np.ndarray, starts: np.ndarray, width: int
) -> np.ndarray:
    """Avalanched hashes of ``width``-codepoint windows at ``starts``,
    given :func:`poly_prefix` output: one subtraction plus one multiply
    by the cached inverse power per window."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    n = len(prefix) - 1
    _, iv = _pow_tables(n)
    with np.errstate(over="ignore"):
        diff = prefix[starts + width] - prefix[starts]
        # un-weight: the window at i carries a stray B^(n-width-i) factor
        hashes = diff * iv[n - width - starts]
    return avalanche(hashes)


def rolling_window_hash64(
    codes: np.ndarray, width: int, stride: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of EVERY ``width``-codepoint window at ``stride`` over one
    document's codepoint array, without a per-window loop: →
    (window starts int64, avalanched window hashes uint64).

    Polynomial hash in the ring Z/2^64 (wraparound uint64 arithmetic is
    the modulus).  With reversed base powers P[k] = B^(n-1-k) and the
    weighted prefix sums S of codes·P, every window hash
    ``sum_j codes[i+j]·B^(width-1-j)`` is one subtraction plus one
    multiply by the precomputed inverse power — O(n) total for all
    windows vs O(n·width/stride) naive.  Equal windows hash equal
    regardless of position or document; 64-bit collisions decide
    equality for the substring-dedup caller (non-adversarial input,
    ~2^-64 per pair).  Memory: ~4 temporaries × 8 bytes per codepoint —
    per-document arrays only, never whole batches."""
    n = len(codes)
    if n < width:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    starts = np.arange(0, n - width + 1, stride, dtype=np.int64)
    return starts, window_hash64_at(codes, starts, width)


def window_hash64_at(codes: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Avalanched polynomial hashes of the ``width``-codepoint windows
    at the given (arbitrary, in-bounds) start positions.  Convenience
    wrapper — callers hashing several window families of one document
    should compute :func:`poly_prefix` once instead."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    return window_hash64_from_prefix(poly_prefix(codes), starts, width)


def md5_hex(arr: pa.Array | pa.ChunkedArray) -> list[str]:
    """md5 hex digest per string (DuckDB ``md5()``-compatible), hashing
    memoryview slices of the Arrow UTF-8 buffer — no per-row string
    decode/encode round-trip."""
    data, starts, ends = _flat_utf8(arr)
    mv = memoryview(data)
    md5 = hashlib.md5
    return [md5(mv[s:e]).hexdigest() for s, e in zip(starts.tolist(), ends.tolist())]
