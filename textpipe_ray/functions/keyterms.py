"""Keyterm extraction: TextRank over a word co-occurrence graph.

The reference proxies to textacy's rankers with the contract
``extract_keyterms(ranker, n_terms) → [(term, score)]``, empty for
empty docs, ``ValueError`` listing the valid rankers on an unknown name
(/root/reference/textpipe/doc.py:405-439).  This engine implements
TextRank (the default ranker) from the public algorithm: PageRank on a
sliding-window co-occurrence graph of candidate words, plus adjacent
top-word merging into multiword terms; 'singlerank' is the
window-weighted variant.  The textacy-specific 'sgrank'/'scake'/'yake'
names are accepted in the error contract but resolve to textrank
scoring with their own candidate windows (documented stand-in,
SURVEY.md §7.0).
"""

from __future__ import annotations

import re

import numpy as np

from textpipe_ray.data.seed_corpora import STOPWORDS

RANKERS = ["textrank", "sgrank", "scake", "yake"]
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _tokens_and_candidates(text: str, lang: str) -> tuple[list[str], list[str]]:
    """(all word tokens lowered, candidate subset) — stopwords/short
    words break term adjacency but stay in the full sequence."""
    from textpipe_ray.functions.tokenize import sents as _sents

    stop = set(STOPWORDS.get(lang, STOPWORDS["en"]))
    all_words: list[str] = []
    for s, _ in _sents(text or ""):
        all_words.extend(m.group().lower() for m in _WORD_RE.finditer(s))
        all_words.append("")  # sentence boundary: breaks term adjacency
    return all_words, [w for w in all_words if w and w not in stop and len(w) > 2]


def _pagerank(adj: np.ndarray, damping: float = 0.85, iters: int = 40) -> np.ndarray:
    n = adj.shape[0]
    if n == 0:
        return np.empty(0)
    deg = adj.sum(axis=1)
    deg[deg == 0] = 1.0
    m = adj / deg[:, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (m.T @ r)
    return r


def extract_keyterms(
    text: str, lang: str = "en", ranker: str = "textrank", n_terms: int = 10, window: int = 2
) -> list[tuple[str, float]]:
    """→ top-``n_terms`` (term, score); [] for wordless docs; ValueError
    with the reference's message shape for unknown rankers."""
    if ranker not in RANKERS:
        raise ValueError(f'ranker "{ranker}" not available; use one of {RANKERS}')
    all_words, words = _tokens_and_candidates(text, lang)
    if not words:
        return []
    if ranker in ("sgrank", "yake"):
        window = 4
    elif ranker == "scake":
        window = 3
    vocab = sorted(set(words))
    idx = {w: i for i, w in enumerate(vocab)}
    adj = np.zeros((len(vocab), len(vocab)))
    for i, w in enumerate(words):
        for j in range(i + 1, min(i + 1 + window, len(words))):
            a, b = idx[w], idx[words[j]]
            if a != b:
                adj[a, b] += 1.0
                adj[b, a] += 1.0
    scores = _pagerank(adj)
    # merge top words that are adjacent IN THE ORIGINAL token sequence
    # into multiword terms (textrank post-pass; stopwords break runs)
    top = {vocab[i] for i in np.argsort(-scores)[: max(n_terms, 5)]}
    terms: dict[str, float] = {}
    i = 0
    while i < len(all_words):
        if all_words[i] in top:
            j = i
            while j + 1 < len(all_words) and all_words[j + 1] in top:
                j += 1
            term = " ".join(all_words[i : j + 1])
            score = float(sum(scores[idx[w]] for w in all_words[i : j + 1]))
            terms[term] = max(terms.get(term, 0.0), score)
            i = j + 1
        else:
            i += 1
    ranked = sorted(terms.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(t, s) for t, s in ranked[:n_terms]]
