"""Word / document vectors with the reference's aggregation semantics.

The reference exposes (a) spaCy per-token vectors with
``{has_vector, vector_norm, is_oov, vector}`` (doc.py:499-538), (b)
mean/sum/var aggregation with normalize / exclude_oov options
(doc.py:540-602), and (c) idf-weighted gensim document embeddings with
'naive'/'log' weighting (doc.py:641-703).  This engine keeps every
option and exception contract but backs them with a deterministic
hash-seeded vector table trained from the seed corpora — the same
"bring your own model" stance as the reference (README.md:20): swap
``HashVectorModel`` for a real embedding table per actor and nothing
else changes.
"""

from __future__ import annotations

import functools
import hashlib
import re
from collections import Counter

import numpy as np

from textpipe_ray.data.seed_corpora import SEED_CORPORA

DIM = 96
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


class MissingModelException(Exception):
    pass


class IDFWeightingMismatchException(Exception):
    pass


def _hash_vector_uncached(word: str, dim: int = DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.blake2b(word.encode("utf8"), digest_size=4).digest(), "little")
    return np.random.RandomState(seed).standard_normal(dim).astype(np.float64)


@functools.lru_cache(maxsize=1 << 18)
def _hash_vector(word: str, dim: int = DIM) -> np.ndarray:
    """Memoized per process: RandomState construction is ~10µs/word and
    web-corpus tokens repeat heavily (callers copy via np.stack /
    arithmetic, so sharing the cached array is safe)."""
    return _hash_vector_uncached(word, dim)


class HashVectorModel:
    """Deterministic stand-in for a KeyedVectors table: vocabulary +
    token counts from the language's seed corpus, vectors hash-seeded.
    Words outside the vocabulary are OOV (still embeddable, like spaCy
    sm-model context tensors — ``is_oov`` stays True, doc.py:521-527)."""

    def __init__(self, lang: str = "en", dim: int = DIM):
        text = SEED_CORPORA.get(lang)
        if text is None:
            raise MissingModelException(f'Vector model for language "{lang}" is not available.')
        self.dim = dim
        self.counts = Counter(w.lower() for w in _WORD_RE.findall(text))
        self.nr_train_tokens = sum(self.counts.values())

    def __contains__(self, word: str) -> bool:
        return word in self.counts

    def vector(self, word: str) -> np.ndarray:
        return _hash_vector(word, self.dim)

    def count(self, word: str) -> int:
        return self.counts.get(word, 0)


def word_vectors(text: str, model: HashVectorModel) -> dict[str, dict]:
    """Per-token vector record dict (reference doc.py:507-538 shape)."""
    out: dict[str, dict] = {}
    for m in _WORD_RE.finditer(text or ""):
        tok = m.group()
        if tok in out:
            continue
        vec = model.vector(tok.lower())
        out[tok] = {
            "has_vector": tok.lower() in model,
            "vector_norm": float(np.sqrt((vec * vec).sum())),
            "is_oov": True,
            "vector": vec.tolist(),
        }
    return out


def aggregate_word_vectors(
    text: str,
    model: HashVectorModel,
    aggregation: str = "mean",
    normalize: bool = False,
    exclude_oov: bool = False,
) -> list[float]:
    """Reference doc.py:554-602 semantics, incl. the NotImplementedError
    contract for unknown aggregations."""
    toks = [m.group() for m in _WORD_RE.finditer(text or "")]
    if exclude_oov:
        toks = [t for t in toks if t.lower() in model]
    if not toks:
        return []
    vecs = []
    for t in toks:
        v = model.vector(t.lower())
        if normalize:
            n = np.sqrt((v * v).sum())
            v = v / n if n else v
        vecs.append(v)
    arr = np.stack(vecs)
    if aggregation == "mean":
        return arr.mean(axis=0).tolist()
    if aggregation == "sum":
        return arr.sum(axis=0).tolist()
    if aggregation == "var":
        return arr.var(axis=0).tolist()
    raise NotImplementedError(f"Aggregation method {aggregation} is not implemented.")


def document_embedding(
    text: str,
    model: HashVectorModel,
    lowercase: bool = True,
    idf_weighting: str = "naive",
) -> list[float]:
    """tf×(1/idf)-weighted embedding (reference doc.py:641-703): naive
    idf = train count; log idf = log(N/(count+1))+1; [] when no token is
    in vocabulary; ValueError on unknown weighting."""
    counts = Counter(
        (m.group().lower() if lowercase else m.group()) for m in _WORD_RE.finditer(text or "")
    )
    pairs = [(w, c) for w, c in counts.items() if w in model]
    if not pairs:
        return []
    vecs = []
    for w, c in pairs:
        if idf_weighting == "naive":
            idf = model.count(w)
        elif idf_weighting == "log":
            idf = np.log(model.nr_train_tokens / (model.count(w) + 1)) + 1
        else:
            raise ValueError(
                f'idf_weighting "{idf_weighting}" not available; use "naive" or "log"'
            )
        vecs.append(model.vector(w) * (c / idf))
    return list(sum(vecs))
