"""MinHash / SimHash sketches + LSH banding for near-duplicate detection.

The MinHash here is digest-compatible with the ``datasketch`` library's
default configuration, which the reference uses (``Doc.find_minhash``,
/root/reference/textpipe/doc.py:456-497: 128 permutations, seed 1,
sha1-32 token hashing).  Golden check: the reference doctest digests
``[407326892, 814360600, 1099082245, 1176349439, 1735256]`` for
'Sentence for computing the minhash' and pairwise Jaccard 0.7265625
(doc.py:462-489) — pinned in tests/test_minhash.py.

The datasketch scheme is public: h'(x) = ((a*h(x)+b) mod p) & 0xFFFFFFFF
with p = 2^61-1, (a, b) drawn from numpy RandomState(seed), h = first 4
little-endian bytes of SHA1.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)
DEFAULT_NUM_PERM = 128
DEFAULT_SEED = 1


def _permutations(num_perm: int = DEFAULT_NUM_PERM, seed: int = DEFAULT_SEED):
    gen = np.random.RandomState(seed)
    return np.array(
        [
            (
                gen.randint(1, _MERSENNE_PRIME, dtype=np.uint64),
                gen.randint(0, _MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T


# Module-level: computed once per worker process, shared by every batch.
_PERM_A, _PERM_B = _permutations()


def sha1_hash32(data: bytes) -> int:
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def minhash_from_hashes(hvs: np.ndarray, num_perm: int = DEFAULT_NUM_PERM) -> np.ndarray:
    """Signature from precomputed 32-bit element hashes (uint64 array)."""
    if num_perm == DEFAULT_NUM_PERM:
        a, b = _PERM_A, _PERM_B
    else:
        a, b = _permutations(num_perm)
    if len(hvs) == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    # (T, P) permuted hashes → column-min; uint64 mul wraps mod 2^64 which
    # matches datasketch (operands < 2^61 so a*hv < 2^93 — datasketch
    # relies on the same numpy wrap, making digests identical).
    phv = np.bitwise_and((hvs[:, None] * a[None, :] + b[None, :]) % _MERSENNE_PRIME, _MAX_HASH)
    return phv.min(axis=0)


def minhash_signature(tokens: list[str], num_perm: int = DEFAULT_NUM_PERM) -> np.ndarray:
    """uint64[num_perm] signature over the token multiset (set semantics,
    sha1-32 element hashing — digest-identical to datasketch)."""
    if not tokens:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    hvs = np.array(
        sorted({sha1_hash32(t.encode("utf8")) for t in tokens}), dtype=np.uint64
    )
    return minhash_from_hashes(hvs, num_perm)


def minhash_signatures_from_token_sets(
    doc_tokens: list[set[str]], num_perm: int = DEFAULT_NUM_PERM
) -> np.ndarray:
    """(D, num_perm) signatures for a batch of documents' TOKEN SETS:
    each unique token across the batch is sha1-hashed ONCE (tokens
    repeat heavily across docs), then one chunked permute computes all
    signatures.  The shared front half of ``op_minhash`` and
    ``minhash_batch`` — digest-identical to the per-doc kernel."""
    tok_hash = (
        {t: sha1_hash32(t.encode("utf8")) for t in set().union(*doc_tokens)}
        if doc_tokens
        else {}
    )
    docs_hvs = [
        np.unique(
            np.fromiter((tok_hash[t] for t in toks), dtype=np.uint64, count=len(toks))
        )
        for toks in doc_tokens
    ]
    return minhash_signatures_batch(docs_hvs, num_perm)


def minhash_signatures_batch(
    docs_hvs: list[np.ndarray], num_perm: int = DEFAULT_NUM_PERM
) -> np.ndarray:
    """(D, num_perm) signatures for a BATCH of documents' precomputed
    element-hash arrays in one chunked matrix pass — digest-identical
    to calling :func:`minhash_from_hashes` per doc, but the (T, P)
    permute runs over ~64k hashes at a time with
    ``np.minimum.reduceat`` collapsing doc boundaries, instead of D
    small matmul-shaped kernels.  Empty docs get the MAX_HASH row."""
    if num_perm == DEFAULT_NUM_PERM:
        a, b = _PERM_A, _PERM_B
    else:
        a, b = _permutations(num_perm)
    out = np.full((len(docs_hvs), num_perm), _MAX_HASH, dtype=np.uint64)
    chunk_docs: list[int] = []
    chunk_rows = 0

    def flush():
        nonlocal chunk_docs, chunk_rows
        if not chunk_docs:
            return
        cat = np.concatenate([docs_hvs[i] for i in chunk_docs])
        phv = np.bitwise_and(
            (cat[:, None] * a[None, :] + b[None, :]) % _MERSENNE_PRIME, _MAX_HASH
        )
        starts = np.cumsum([0] + [len(docs_hvs[i]) for i in chunk_docs[:-1]])
        mins = np.minimum.reduceat(phv, starts, axis=0)
        out[np.array(chunk_docs)] = mins
        chunk_docs, chunk_rows = [], 0

    for i, hvs in enumerate(docs_hvs):
        if len(hvs) == 0:
            continue
        if chunk_rows + len(hvs) > 65536 and chunk_docs:
            flush()
        chunk_docs.append(i)
        chunk_rows += len(hvs)
    flush()
    return out


_POLY_B = np.uint64(1000003)


def shingle_hashes32(text: str, n: int = 5) -> np.ndarray:
    """Vectorized 32-bit rolling polynomial hashes of the utf8-byte
    n-gram shingles of ``text`` (unique, sorted).  ~100× faster than
    per-shingle sha1 — the near-dup fast path; NOT datasketch-digest
    compatible (use :func:`minhash_signature` for that)."""
    b = np.frombuffer(text.encode("utf8"), dtype=np.uint8).astype(np.uint64)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(b) < n:
        n = len(b)
    L = len(b) - n + 1
    h = np.zeros(L, dtype=np.uint64)
    for j in range(n):
        h = h * _POLY_B + b[j : j + L]
    return np.unique(h & _MAX_HASH)


def minhash_signature_shingles(text: str, n: int = 5, num_perm: int = DEFAULT_NUM_PERM) -> np.ndarray:
    return minhash_from_hashes(shingle_hashes32(text, n), num_perm)


def jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Estimated Jaccard similarity of two equal-length signatures."""
    return float(np.count_nonzero(sig1 == sig2)) / float(len(sig1))


_BAND_OFFSET = np.uint64(0xCBF29CE484222325)
_BAND_MULT = np.uint64(0x100000001B3)  # FNV-1a 64 prime

# Identifies the band-hash kernel persisted indexes were built with
# (write_minhash_index stamps it; near_dup_against_index refuses an
# index whose kernel differs).  BUMP THIS whenever the bucket values
# produced by lsh_band_hashes_matrix change.
BAND_HASH_KERNEL = "fnv64-splitmix-v1"


def lsh_band_hashes_matrix(sigs: np.ndarray, num_bands: int = 32) -> np.ndarray:
    """(n, num_perm) uint64 signature matrix → (n, num_bands) int64
    bucket keys, fully vectorized: an FNV-style xor-multiply fold over
    each band's lanes (one numpy op per lane, vectorized over
    n × num_bands) + the splitmix finalizer so every output bit is
    uniform for bucket-modulo partitioning.  Equal band slices hash
    equal — the LSH requirement; bucket keys are internal (candidate
    generation only), the verified pair sets are what goldens pin."""
    from textpipe_ray.functions.strhash import avalanche

    sigs = np.asarray(sigs, dtype=np.uint64)
    n, num_perm = sigs.shape
    rows = num_perm // num_bands
    bands = sigs[:, : rows * num_bands].reshape(n, num_bands, rows)
    with np.errstate(over="ignore"):
        acc = np.full((n, num_bands), _BAND_OFFSET, dtype=np.uint64)
        for r in range(rows):  # loop bounded by rows-per-band (e.g. 8)
            acc ^= bands[:, :, r]
            acc *= _BAND_MULT
        out = avalanche(acc.reshape(-1)).reshape(n, num_bands)
    return out.view(np.int64)


def lsh_band_hashes(sig: np.ndarray, num_bands: int = 32) -> list[int]:
    """Single-signature convenience wrapper of
    :func:`lsh_band_hashes_matrix` (same values by construction)."""
    return lsh_band_hashes_matrix(
        np.asarray(sig, dtype=np.uint64)[None, :], num_bands
    )[0].tolist()


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token frequency weights."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    shifts = np.arange(64, dtype=np.uint64)
    for tok, cnt in Counter(tokens).items():
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode("utf8"), digest_size=8).digest(), "little")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, cnt, -cnt)
    return sum(1 << i for i in range(64) if acc[i] > 0)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def char_ngrams(text: str, n: int = 5) -> set[str]:
    """Character shingles (for n-gram Jaccard dedup)."""
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def ngram_jaccard(text1: str, text2: str, n: int = 5) -> float:
    """Exact Jaccard over character n-gram shingle sets."""
    s1, s2 = char_ngrams(text1, n), char_ngrams(text2, n)
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)
