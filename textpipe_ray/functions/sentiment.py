"""Lexicon sentiment: (polarity, subjectivity) per document.

The reference proxies to the pattern library's per-language lexicons
for en/nl/fr/it and raises ``TextpipeMissingModelException`` otherwise
(/root/reference/textpipe/doc.py:374-403).  This engine keeps the exact
I/O contract — ``(polarity −1..1, subjectivity 0..1)``, same four
languages, same exception on others — over small built-in lexicons
(word → (polarity, subjectivity)), averaged over lexicon hits the way
pattern's ``avg`` scoring works.
"""

from __future__ import annotations

import re

from textpipe_ray.functions.langid import strip_mc_categories  # noqa: F401  (re-export site)


class MissingModelException(Exception):
    """Mirror of the reference's TextpipeMissingModelException."""


_LEX: dict[str, dict[str, tuple[float, float]]] = {
    "en": {
        "good": (0.7, 0.6), "great": (0.8, 0.75), "excellent": (1.0, 1.0),
        "nice": (0.6, 0.9), "happy": (0.8, 1.0), "love": (0.5, 0.6),
        "wonderful": (1.0, 1.0), "best": (1.0, 0.3), "useful": (0.3, 0.0),
        "bad": (-0.7, 0.667), "terrible": (-1.0, 1.0), "awful": (-1.0, 1.0),
        "sad": (-0.5, 1.0), "hate": (-0.8, 0.9), "worst": (-1.0, 1.0),
        "poor": (-0.4, 0.6), "boring": (-1.0, 1.0), "wrong": (-0.5, 0.5),
    },
    "nl": {
        "goed": (0.6, 0.9), "geweldig": (0.8, 0.9), "leuk": (0.6, 0.9666666666666667),
        "mooi": (0.7, 0.9), "blij": (0.8, 1.0), "nuttig": (0.3, 0.0),
        "slecht": (-0.7, 0.9), "verschrikkelijk": (-1.0, 1.0),
        "saai": (-0.9, 1.0), "droevig": (-0.6, 1.0), "fout": (-0.5, 0.5),
    },
    "fr": {
        "bon": (0.7, 0.8), "excellent": (1.0, 1.0), "heureux": (0.8, 1.0),
        "beau": (0.7, 0.9), "utile": (0.3, 0.0), "agréable": (0.7, 0.9),
        "mauvais": (-0.7, 0.8), "terrible": (-1.0, 1.0), "triste": (-0.6, 1.0),
        "ennuyeux": (-0.9, 1.0), "pire": (-1.0, 1.0),
    },
    "it": {
        "buono": (0.7, 0.8), "ottimo": (1.0, 1.0), "felice": (0.8, 1.0),
        "bello": (0.7, 0.9), "utile": (0.3, 0.0),
        "cattivo": (-0.7, 0.8), "terribile": (-1.0, 1.0), "triste": (-0.6, 1.0),
        "noioso": (-0.9, 1.0), "peggiore": (-1.0, 1.0),
    },
}

_NEGATORS = {"not", "no", "never", "niet", "geen", "ne", "pas", "non"}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

SUPPORTED_LANGS = tuple(sorted(_LEX))


def sentiment(text: str, lang: str) -> tuple[float, float]:
    """→ (polarity, subjectivity); raises MissingModelException for an
    unsupported language (reference doc.py:403)."""
    lex = _LEX.get(lang)
    if lex is None:
        raise MissingModelException(f"No sentiment model for {lang}")
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    pols, subs = [], []
    for i, w in enumerate(words):
        hit = lex.get(w)
        if hit is None:
            continue
        p, s = hit
        if i > 0 and words[i - 1] in _NEGATORS:
            p = -p
        pols.append(p)
        subs.append(s)
    if not pols:
        return (0.0, 0.0)
    return (sum(pols) / len(pols), sum(subs) / len(subs))
