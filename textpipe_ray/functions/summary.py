"""Extractive TextRank summarisation (gensim-summarizer contract).

The reference wraps gensim's ``summarize`` with ``ratio``/``word_count``
options, ``split=True`` (list of sentence strings), and returns ``[]``
when the text cannot be compressed — fewer than 2 sentences
(/root/reference/textpipe/doc.py:705-755).  This is the public BM25/
TextRank sentence-graph algorithm reimplemented: sentence similarity =
token overlap / (log|a|+log|b|), PageRank, top sentences re-emitted in
document order.
"""

from __future__ import annotations

import math
import re

import numpy as np

from textpipe_ray.functions.keyterms import _pagerank
from textpipe_ray.functions.tokenize import sents

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _tokens(s: str) -> set[str]:
    return {w.lower() for w in _WORD_RE.findall(s)}


def textrank_summary(
    text: str, ratio: float = 0.2, word_count: int | None = None
) -> list[str]:
    """→ selected sentence texts in document order; [] if uncompressible.
    If both ratio and word_count are given, ratio is ignored (reference
    doc.py:710)."""
    sentences = [s for s, _ in sents(text or "")]
    if len(sentences) < 2:
        return []
    toks = [_tokens(s) for s in sentences]
    n = len(sentences)
    adj = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(toks[i] & toks[j])
            if inter == 0:
                continue
            denom = math.log(len(toks[i]) + 1) + math.log(len(toks[j]) + 1)
            if denom > 0:
                adj[i, j] = adj[j, i] = inter / denom
    if not adj.any():
        return []
    scores = _pagerank(adj)
    order = np.argsort(-scores)
    picked: list[int] = []
    if word_count is not None:
        total = 0
        for i in order:
            w = len(sentences[i].split())
            if picked and total + w > word_count:
                break
            picked.append(int(i))
            total += w
    else:
        k = max(1, int(round(n * ratio)))
        picked = [int(i) for i in order[:k]]
    return [sentences[i] for i in sorted(picked)]
