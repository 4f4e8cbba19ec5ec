"""Trained multinomial Naive Bayes text categorizer.

The reference's ``Categories`` op runs a spaCy textcat statistical
model (/root/reference/textpipe/operation.py:430-448, doc.py:783-802);
the term-list ``TextcatModel`` stand-in (registry.py) matches the
output shape but learns nothing.  This module adds a TRAINED NB
categorizer whose sufficient statistics — per-(label, token) counts
over a bounded top-V vocabulary — are exactly what a Ray Data
``map_batches``-partial + ``groupby().sum`` computes with an exchange
∝ distinct (label, token) pairs (the BPE word-TYPE-table pattern); see
``q_trained_models`` for the distributed fit.

Model file type ``textcat_nb`` loads through the registry as kind
``textcat`` with the same ``predict(text) → {label: prob}`` contract
(all labels always present), so ``Categories`` pipelines are untouched.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"[0-9a-z_]+")
NB_ALPHA = 1.0  # Laplace smoothing
NB_VOCAB_TOPK = 2048


def nb_fit(
    pair_counts: dict[tuple[str, str], int],
    label_docs: dict[str, int],
    vocab: list[str],
    alpha: float = NB_ALPHA,
) -> dict:
    """Model dict from aggregated sufficient statistics:
    ``pair_counts[(label, token)]`` token occurrences (vocab tokens
    only), ``label_docs[label]`` doc counts.  Pure arithmetic on the
    already-reduced counts — where the counts were computed (one
    process or a cluster-wide groupby) does not change the model."""
    labels = sorted(label_docs)
    vocab = sorted(vocab)
    vidx = {t: i for i, t in enumerate(vocab)}
    n_docs = sum(label_docs.values())
    log_prior = {lb: float(np.log(label_docs[lb] / n_docs)) for lb in labels}
    log_lik: dict[str, list[float]] = {}
    for lb in labels:
        counts = np.full(len(vocab), alpha, dtype=np.float64)
        for (l, t), n in pair_counts.items():
            if l == lb and t in vidx:
                counts[vidx[t]] += n
        log_lik[lb] = list(np.log(counts / counts.sum()))
    return {
        "type": "textcat_nb",
        "labels": labels,
        "vocab": vocab,
        "log_prior": log_prior,
        "log_lik": log_lik,
    }


class NBTextcatModel:
    """``predict(text) → {label: posterior}`` (softmax over per-label
    log scores; all labels present — the reference textcat's
    all-labels dict shape).  Deterministic: token counts fold through
    one fixed-order dot product per label."""

    def __init__(self, obj: dict):
        self.labels = list(obj["labels"])
        self.vocab = list(obj["vocab"])
        self._vidx = {t: i for i, t in enumerate(self.vocab)}
        self._prior = np.array(
            [obj["log_prior"][lb] for lb in self.labels], dtype=np.float64
        )
        self._lik = np.array(
            [obj["log_lik"][lb] for lb in self.labels], dtype=np.float64
        )

    def _count_vec(self, text: str) -> np.ndarray:
        v = np.zeros(len(self.vocab), dtype=np.float64)
        for t in TOKEN_RE.findall((text or "").lower()):
            i = self._vidx.get(t)
            if i is not None:
                v[i] += 1.0
        return v

    def log_scores(self, text: str) -> np.ndarray:
        return self._prior + self._lik @ self._count_vec(text)

    def predict(self, text: str) -> dict[str, float]:
        z = self.log_scores(text)
        z = z - z.max()
        p = np.exp(z)
        p /= p.sum()
        return {lb: float(p[i]) for i, lb in enumerate(self.labels)}
