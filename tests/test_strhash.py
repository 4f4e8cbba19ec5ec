"""functions/strhash.py: vectorized string hashing over Arrow buffers."""

import hashlib

import numpy as np
import pyarrow as pa


def _ref_hash64(s: str) -> int:
    """Scalar reference: h = OFFSET; h = h*M + byte for each utf-8 byte."""
    M, OFF, mod = 0x9E3779B97F4A7C15, 0xCBF29CE484222325, 1 << 64
    h = OFF
    for b in s.encode("utf8"):
        h = (h * M + b) % mod
    return h


CASES = ["", "a", "ab", "hello world", "a" * 1000, "ünïcode ☃ text", None, "x", "a b\tc\nd"]


def test_hash64_matches_scalar_reference():
    from textpipe_ray.functions.strhash import hash64

    arr = pa.array(CASES, pa.string())
    exp = [_ref_hash64(s if s is not None else "") for s in CASES]
    assert list(hash64(arr)) == exp


def test_hash64_sliced_chunked_large_string():
    from textpipe_ray.functions.strhash import hash64

    arr = pa.array(CASES, pa.string())
    exp = [_ref_hash64(s if s is not None else "") for s in CASES]
    assert list(hash64(arr.slice(2, 4))) == exp[2:6]  # nonzero offset
    assert list(hash64(pa.chunked_array([arr[:3], arr[3:]]))) == exp
    assert list(hash64(arr.cast(pa.large_string()))) == exp


def test_hash64_prefix_strings_differ():
    from textpipe_ray.functions.strhash import hash64

    arr = pa.array(["ab", "abc", "abcd", "", "\x00", "\x00\x00"], pa.string())
    h = list(hash64(arr))
    assert len(set(h)) == len(h)  # length term separates prefixes / NULs


def test_md5_hex_matches_hashlib():
    from textpipe_ray.functions.strhash import md5_hex

    arr = pa.array(CASES, pa.string())
    exp = [hashlib.md5((s or "").encode("utf8")).hexdigest() for s in CASES]
    assert md5_hex(arr) == exp
    assert md5_hex(arr.slice(1, 3)) == exp[1:4]


def test_part_ids_stable_and_bounded():
    from textpipe_ray.functions.strhash import part_ids

    urls = pa.array([f"http://h{i}.example.com/{i}" for i in range(1000)])
    p = part_ids(urls, 64)
    assert p.min() >= 0 and p.max() < 64
    q = part_ids(urls, 64)
    assert (p == q).all()
    # reasonable balance: no partition holds more than 4x the mean
    assert np.bincount(p, minlength=64).max() < 4 * (1000 / 64)


def test_rolling_window_hash_matches_naive_and_position_independent():
    """Window hashes equal the per-window naive polynomial, and equal
    window CONTENT hashes equal at any position in any array."""
    import numpy as np

    from textpipe_ray.functions.strhash import (
        _RW_BASE,
        avalanche,
        rolling_window_hash64,
        window_hash64_at,
    )

    rng = np.random.RandomState(3)
    codes = rng.randint(32, 5000, 120).astype(np.uint32)
    starts, hashes = rolling_window_hash64(codes, 13, 5)
    for s, h in zip(starts, hashes):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for j in range(13):
                acc = acc * _RW_BASE + np.uint64(codes[s + j])
        assert avalanche(np.array([acc]))[0] == h
    # position independence across documents
    c1 = np.frombuffer("xxxxabcdefghijkl".encode("utf-32-le"), dtype=np.uint32)
    c2 = np.frombuffer("abcdefghijklyyyyyyy".encode("utf-32-le"), dtype=np.uint32)
    h1 = window_hash64_at(c1, np.array([4]), 12)
    h2 = window_hash64_at(c2, np.array([0]), 12)
    assert h1[0] == h2[0]
    # and different content differs
    h3 = window_hash64_at(c2, np.array([1]), 12)
    assert h3[0] != h2[0]


def test_hash64_mixed_chunked_equals_unchunked():
    """Byte-bounded slicing is an internal detail: output must be
    bit-identical to the one-shot hash for any max_bytes, including
    bounds smaller than a single string (one-row slices) and slice
    boundaries landing mid-array; nulls hash as empty."""
    from textpipe_ray.functions.strhash import hash64_mixed, hash64_mixed_chunked

    vals = ["alpha", None, "", "b" * 300, "mid", "ünïcode ☃" * 40, "z", "q" * 7]
    arr = pa.array(vals, pa.string())
    exp = list(hash64_mixed(arr))
    for max_bytes in (1, 8, 64, 301, 1 << 20):
        assert list(hash64_mixed_chunked(arr, max_bytes=max_bytes)) == exp
    # chunked array + empty input
    ch = pa.chunked_array([pa.array(vals[:3], pa.string()), pa.array(vals[3:], pa.string())])
    assert list(hash64_mixed_chunked(ch, max_bytes=16)) == exp
    assert len(hash64_mixed_chunked(pa.array([], pa.string()))) == 0
