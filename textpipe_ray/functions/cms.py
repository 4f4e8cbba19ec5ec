"""Count-Min-Sketch kernel (Cormode & Muthukrishnan 2005, "An improved
data stream summary: the count-min sketch and its applications").

A CMS is a (depth × width) integer matrix; each item hash increments
one bucket per depth row, and the frequency estimate is the MIN over
the depth rows — always an overestimate, with error ≤ 2N/width at
probability 1 - 2^-depth.  Because each row is a pure SUM over items,
the sketch is mergeable in any order: per-batch partial sketches sum
into the global sketch regardless of block layout, which makes it the
constant-size-exchange answer to "frequencies of a key space too large
to count exactly" (the HLL idiom of q_distinct_sketch, for counts
instead of cardinality).

Buckets derive from a single 64-bit item hash via the splitmix64
finalizer under per-depth salts (strhash.avalanche) — vectorized, no
per-item Python in the hot path.
"""

from __future__ import annotations

import numpy as np

from textpipe_ray.functions.strhash import avalanche

CMS_DEPTH = 4
CMS_WIDTH = 8192

# arbitrary fixed odd salts; one independent-looking hash per depth row
_SALTS = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0xD6E8FEB86659FD93,
    ],
    dtype=np.uint64,
)


def cms_buckets(hashes: np.ndarray) -> np.ndarray:
    """(CMS_DEPTH, n) bucket ids in [0, CMS_WIDTH) for 64-bit item
    hashes.  Depth rows use distinct salts through the splitmix64
    finalizer so the same item lands in independent buckets per row."""
    h = hashes.astype(np.uint64, copy=False)
    out = np.empty((CMS_DEPTH, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(CMS_DEPTH):
            out[j] = (avalanche(h + _SALTS[j]) % np.uint64(CMS_WIDTH)).astype(
                np.int64
            )
    return out


def cms_dense(hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """One batch's partial sketch as a dense (CMS_DEPTH, CMS_WIDTH)
    int64 array — shipped as CMS_DEPTH list rows per block (the
    q_distinct_sketch register idiom: exchange size is per-BLOCK
    constant, independent of both the item count and the width).
    Integer accumulation (np.add.at), so partials merge exactly by
    element-wise addition in any order."""
    bk = cms_buckets(hashes)
    cnt = counts.astype(np.int64, copy=False)
    acc = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for j in range(CMS_DEPTH):
        np.add.at(acc[j], bk[j], cnt)
    return acc


def cms_estimate(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point frequency estimates: min over depth rows.  ``cms`` is the
    merged (CMS_DEPTH, CMS_WIDTH) int64 sketch."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.int64)
    bk = cms_buckets(hashes)
    est = cms[0, bk[0]]
    for j in range(1, CMS_DEPTH):
        est = np.minimum(est, cms[j, bk[j]])
    return est.astype(np.int64)
