"""MinHash digest-compatibility with the reference (datasketch defaults;
pins from /root/reference/textpipe/doc.py:462-465,485-489)."""

import numpy as np

from textpipe_ray.functions.minhash import (
    char_ngrams,
    hamming64,
    jaccard,
    lsh_band_hashes,
    minhash_signature,
    ngram_jaccard,
    simhash64,
)
from textpipe_ray.functions.tokenize import words


def _toks(t):
    return [w for w, _ in words(t)]


def test_reference_digests():
    sig = minhash_signature(_toks("Sentence for computing the minhash"))
    assert list(sig[:5]) == [407326892, 814360600, 1099082245, 1176349439, 1735256]


def test_reference_similarity():
    s1 = minhash_signature(_toks("Sentence for computing the minhash"))
    s2 = minhash_signature(_toks("Sentence for computing the similarity"))
    assert jaccard(s1, s2) == 0.7265625


def test_empty_and_identical():
    e = minhash_signature([])
    assert jaccard(e, e) == 1.0
    s = minhash_signature(_toks("a b c"))
    assert jaccard(s, minhash_signature(_toks("c b a"))) == 1.0  # set semantics


def test_lsh_bands():
    s1 = minhash_signature(_toks("the quick brown fox jumps over the lazy dog"))
    s2 = minhash_signature(_toks("the quick brown fox jumps over the lazy cat"))
    b1, b2 = lsh_band_hashes(s1), lsh_band_hashes(s2)
    assert len(b1) == 32
    # highly similar docs share at least one band bucket
    assert any(x == y for x, y in zip(b1, b2))
    # dissimilar docs share none
    b3 = lsh_band_hashes(minhash_signature(_toks("completely different words entirely")))
    assert not any(x == y for x, y in zip(b1, b3))


def test_simhash():
    a = simhash64(_toks("the quick brown fox jumps over the lazy dog"))
    b = simhash64(_toks("the quick brown fox jumps over the lazy cat"))
    c = simhash64(_toks("unrelated text about astronomy and planets"))
    assert 0 <= a < 2**64
    assert hamming64(a, b) < hamming64(a, c)
    assert simhash64([]) == 0


def test_ngram_jaccard():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("", "") == 1.0
    assert 0.0 < ngram_jaccard("abcdefgh", "abcdefxx") < 1.0
    assert char_ngrams("abc", 5) == {"abc"}


def test_batch_signatures_match_per_doc_kernel():
    """minhash_signatures_batch must be digest-identical to the per-doc
    kernel (incl. empty docs → MAX_HASH rows) across chunk boundaries."""
    import numpy as np

    from textpipe_ray.functions.minhash import (
        _MAX_HASH,
        minhash_from_hashes,
        minhash_signatures_batch,
    )

    rng = np.random.RandomState(5)
    docs = []
    for i in range(40):
        n = [0, 1, 3, 700, 2500][i % 5]
        docs.append(
            np.unique(rng.randint(0, 2**32, size=n).astype(np.uint64))
        )
    got = minhash_signatures_batch(docs, 128)
    for i, hvs in enumerate(docs):
        want = (
            np.full(128, _MAX_HASH, dtype=np.uint64)
            if len(hvs) == 0
            else minhash_from_hashes(hvs, 128)
        )
        assert (got[i] == want).all(), i
