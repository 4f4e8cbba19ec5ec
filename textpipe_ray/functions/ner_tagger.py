"""Trained statistical NER stand-in (surface + context features).

The reference delegates NER to spaCy statistical models
(/root/reference/textpipe/doc.py:220-244, operation.py:203-224); the
sandbox has no spaCy, so this module trains a tiny one-vs-rest logistic
span classifier from a deterministic seed corpus
(:mod:`textpipe_ray.data.ner_names` templates) — hashed character
n-grams of the span, hashed context words and shape features — and tags
by classifying maximal capitalised-token runs.  Unlike the gazetteer
stand-in it GENERALISES: held-out names it never saw in training are
tagged by suffix/context evidence (accuracy asserted in
tests/test_ner_tagger.py).

Training runs through the repo's existing distributed IRLS trainer
(``_train_quality_classifier`` — per-block integer-quantized
gradient/Hessian partials, bit-identical under any block order), one
binary head per entity label; see ``q_trained_models``.

Model file type ``ner_tagger`` loads through the same
``models=[(name, lang, path)]`` registry seam as every other custom
model (registry.py).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from textpipe_ray.data.ner_names import (
    FIRST_NAMES,
    GPE_NAMES,
    LAST_NAMES,
    ORG_BASES,
    ORG_SUFFIXES,
    PLAIN_WORDS,
    split_half,
)

NER_LABELS = ["GPE", "ORG", "PERSON"]  # sorted; 'O' = no head fires
NER_HASH_DIM = 56  # hashed char-ngram / context-word bins
NER_DIM = NER_HASH_DIM + 8  # + shape features
_TOKEN_RE = re.compile(r"[^\W\d_][\w]*", re.UNICODE)
_CAP_RE = re.compile(r"^[A-Z]")


def _hbin(s: str, salt: str) -> int:
    return zlib.crc32((salt + "\x00" + s).encode("utf8")) % NER_HASH_DIM


def span_features(span: str, prev: str, nxt: str) -> np.ndarray:
    """(NER_DIM,) float64 feature vector for one candidate span in
    context — surface evidence only (char n-grams, context words,
    shape), no name-list membership, so generalisation is learned."""
    v = np.zeros(NER_DIM, dtype=np.float64)
    toks = span.split()
    low = span.lower()
    for t in toks:
        marked = f"^{t.lower()}$"
        for n in (2, 3, 4):
            for i in range(len(marked) - n + 1):
                v[_hbin(marked[i : i + n], "c")] += 1.0
    v[_hbin(prev.lower(), "p")] += 2.0
    v[_hbin(nxt.lower(), "n")] += 2.0
    base = NER_HASH_DIM
    v[base + 0] = float(len(toks))
    v[base + 1] = min(len(low), 24) / 8.0
    v[base + 2] = 1.0 if toks and toks[-1] in ORG_SUFFIXES else 0.0
    v[base + 3] = 1.0 if prev.lower() in ("in", "at", "from", "to") else 0.0
    v[base + 4] = 1.0 if prev.lower() in ("by", "with", "according") else 0.0
    v[base + 5] = 1.0 if nxt.lower() in ("said", "joined", "wrote") else 0.0
    v[base + 6] = 1.0 if nxt.lower() in ("announced", "shares", "hired") else 0.0
    v[base + 7] = 1.0 if len(toks) >= 2 else 0.0
    return v


_PERSON_TMPL = [
    ("{} said the plan would continue.", "", "said"),
    ("The report was written by {} last week.", "by", "last"),
    ("{} joined the board in March.", "", "joined"),
    ("According to {} the results improved.", "to", "the"),
    ("Critics praised {} for the decision.", "praised", "for"),
]
_ORG_TMPL = [
    ("{} announced record revenue.", "", "announced"),
    ("Shares of {} fell sharply.", "of", "fell"),
    ("{} hired two hundred engineers.", "", "hired"),
    ("The merger with {} closed in May.", "with", "closed"),
    ("Regulators fined {} on Tuesday.", "fined", "on"),
]
_GPE_TMPL = [
    ("The conference was held in {} this year.", "in", "this"),
    ("Officials from {} attended the summit.", "from", "attended"),
    ("Prices in {} rose again.", "in", "rose"),
    ("{} announced new regulations.", "", "announced"),
    ("Exports to {} doubled last year.", "to", "doubled"),
]
_PLAIN_TMPL = [
    ("{} the markets were calm.", "", "the"),
    ("Traders said {} trading slowed.", "said", "trading"),
    ("{} results were mixed.", "", "results"),
]


def _person_names(names_first, names_last):
    return [f"{f} {l}" for f, l in zip(names_first, names_last)]


def _org_names(bases):
    return [f"{b} {ORG_SUFFIXES[i % len(ORG_SUFFIXES)]}" for i, b in enumerate(bases)]


def make_span_corpus(held_out: bool = False) -> list[tuple[str, str, str, str]]:
    """Deterministic labeled (span, prev, next, label) rows from the
    template grid.  ``held_out=False`` → the TRAIN name halves;
    ``held_out=True`` → names the trained model has never seen."""
    idx = 1 if held_out else 0
    first = split_half(FIRST_NAMES)[idx]
    last = split_half(LAST_NAMES)[idx]
    orgs = _org_names(split_half(ORG_BASES)[idx])
    gpes = split_half(GPE_NAMES)[idx]
    plains = split_half(PLAIN_WORDS)[idx]
    rows: list[tuple[str, str, str, str]] = []
    for names, tmpls, label in (
        (_person_names(first, last), _PERSON_TMPL, "PERSON"),
        (orgs, _ORG_TMPL, "ORG"),
        (gpes, _GPE_TMPL, "GPE"),
        (plains, _PLAIN_TMPL, "O"),
    ):
        for name in names:
            for _, prev, nxt in tmpls:
                rows.append((name, prev, nxt, label))
    return rows


def eval_sentence_for(i: int) -> tuple[str, str, str]:
    """Deterministic held-out eval example by index: (sentence,
    planted_span, label).  Names come from the held-out halves — the
    trained model has never seen them."""
    first = split_half(FIRST_NAMES)[1]
    last = split_half(LAST_NAMES)[1]
    pools = [
        (_person_names(first, last), _PERSON_TMPL, "PERSON"),
        (_org_names(split_half(ORG_BASES)[1]), _ORG_TMPL, "ORG"),
        (split_half(GPE_NAMES)[1], _GPE_TMPL, "GPE"),
    ]
    names, tmpls, label = pools[i % 3]
    name = names[(i // 3) % len(names)]
    tmpl = tmpls[(i // 7) % len(tmpls)][0]
    return tmpl.format(name), name, label


class NerTaggerModel:
    """One-vs-rest logistic heads over :func:`span_features`;
    ``tag(text)`` classifies maximal capitalised-token runs and drops
    spans where no head fires (label 'O')."""

    def __init__(self, obj: dict):
        self.labels = list(obj["labels"])
        self.mu = np.asarray(obj["mu"], dtype=np.float64)
        self.sd = np.asarray(obj["sd"], dtype=np.float64)
        # (L, D+1): intercept first, standardized scale
        self.weights = np.array(
            [obj["weights"][lb] for lb in self.labels], dtype=np.float64
        )

    def margins(self, span: str, prev: str, nxt: str) -> np.ndarray:
        x = (span_features(span, prev, nxt) - self.mu) / self.sd
        return self.weights[:, 0] + self.weights[:, 1:] @ x

    def classify(self, span: str, prev: str, nxt: str) -> str:
        z = self.margins(span, prev, nxt)
        best = int(np.argmax(z))
        return self.labels[best] if z[best] > 0.0 else "O"

    def tag(self, text: str) -> list[tuple[str, str, int, int]]:
        """[(span_text, label, start_char, end_char)] for spans
        classified as entities, in document order."""
        toks = [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text or "")]
        out: list[tuple[str, str, int, int]] = []
        i = 0
        while i < len(toks):
            if not _CAP_RE.match(toks[i][0]):
                i += 1
                continue
            j = i
            while j + 1 < len(toks) and _CAP_RE.match(toks[j + 1][0]):
                j += 1
            start, end = toks[i][1], toks[j][2]
            span = text[start:end]
            prev = toks[i - 1][0] if i > 0 else ""
            nxt = toks[j + 1][0] if j + 1 < len(toks) else ""
            label = self.classify(span, prev, nxt)
            if label != "O":
                out.append((span, label, start, end))
            i = j + 1
        return out

    def find_ents(
        self, text: str, ent_attributes: tuple[str, ...] = ("text", "label_")
    ) -> list[tuple]:
        """Same contract as the gazetteer path: deduped projected
        tuples, sorted (functions/entities.find_ents)."""
        attr_map = {"text": 0, "label_": 1, "start_char": 2, "end_char": 3}
        seen = {
            tuple(t[attr_map[a]] for a in ent_attributes) for t in self.tag(text)
        }
        return sorted(seen, key=lambda tup: tuple(str(x) for x in tup))
