"""Character-ngram language identification (fastText-style, self-trained).

Replaces the reference's cld2 call (``Doc.detect_language``,
/root/reference/textpipe/doc.py:103-134) with a trainable char-trigram
multinomial scorer while keeping the reference's exact I/O contract:

* input preprocessing strips Unicode ``M*``/``C*`` category chars from
  the *clean* text (doc.py:125-126) before detection;
* returns ``(is_reliable, lang)`` with ``(False, 'un')`` for empty /
  letterless / unrecognisable input (doc.py:131-132);
* a ``hint_language`` biases the decision the way cld2's
  ``hintLanguage`` does — ambiguous short inputs resolve to the hint
  (doc.py doctests: ``Doc('Test').detect_language('nl')`` → ``(True, 'nl')``).

The model is a committed artifact (``models/langid.json``), trained
deterministically from ``textpipe_ray.data.seed_corpora`` by
``scripts/train_models.py`` — the same committed-tiny-model strategy as
the reference's ``tests/models/*.kv``.
"""

from __future__ import annotations

import json
import math
import sys
import unicodedata
from pathlib import Path

DEFAULT_MODEL_PATH = Path(__file__).resolve().parents[2] / "models" / "langid.json"
# cld2-style bestEffort guard: only the first MAX_CHARS chars are scored.
MAX_CHARS = 1000
ALPHA = 0.5          # add-alpha smoothing
HINT_BONUS = 0.6     # per-trigram log-score bonus for the hint language
RELIABLE_MARGIN = 0.08  # per-trigram (top1 - top2) margin for reliability
MIN_LETTERS = 3
# below this fraction of in-vocabulary trigrams the text is an unknown
# script/gibberish → (False, 'un'), mirroring cld2's 'un' fallback
MIN_COVERAGE = 0.3


def strip_mc_categories(text: str) -> str:
    """Drop Unicode mark/control/format category chars (doc.py:125-126)."""
    return "".join(c for c in text if unicodedata.category(c)[0] not in ("M", "C"))


def _trigrams(text: str) -> list[str]:
    padded = " " + text.lower()[:MAX_CHARS] + " "
    return [padded[i : i + 3] for i in range(len(padded) - 2)]


def train(corpora: dict[str, str]) -> dict:
    """Train trigram count tables from per-language corpora."""
    counts: dict[str, dict[str, int]] = {}
    for lang, text in sorted(corpora.items()):
        table: dict[str, int] = {}
        for tri in _trigrams(strip_mc_categories(text)):
            table[tri] = table.get(tri, 0) + 1
        counts[lang] = table
    return {"version": 1, "counts": counts}


class LangIdModel:
    """Loaded scorer.  Construction cost (log-prob table build) is paid
    once per actor in the stage's ``__init__`` — never per batch."""

    def __init__(self, model: dict):
        counts = model["counts"]
        self.langs: list[str] = sorted(counts)
        vocab = set()
        for table in counts.values():
            vocab.update(table)
        v = len(vocab)
        self._logprob: dict[str, list[float]] = {}
        self._unk: list[float] = []
        for li, lang in enumerate(self.langs):
            table = counts[lang]
            total = sum(table.values())
            denom = total + ALPHA * (v + 1)
            self._unk.append(math.log(ALPHA / denom))
            for tri, c in table.items():
                row = self._logprob.setdefault(tri, [0.0] * len(self.langs))
                row[li] = math.log((c + ALPHA) / denom)
        # fill zeros (unseen-in-this-lang) with that lang's unk score
        for tri, row in self._logprob.items():
            for li in range(len(self.langs)):
                if row[li] == 0.0:
                    row[li] = self._unk[li]

    @classmethod
    def load(cls, path: str | Path = DEFAULT_MODEL_PATH) -> "LangIdModel":
        with open(path, "r", encoding="utf8") as f:
            return cls(json.load(f))

    def detect(self, clean: str, hint_language: str | None = None) -> tuple[bool, str, float]:
        """→ (is_reliable, lang, margin).  ``clean`` is the post-clean text."""
        stripped = strip_mc_categories(clean)
        if not any(unicodedata.category(c)[0] == "L" for c in stripped):
            return (False, "un", 0.0)
        tris = _trigrams(stripped)
        n = len(tris)
        scores = [0.0] * len(self.langs)
        logprob, unk = self._logprob, self._unk
        known = 0
        for tri in tris:
            row = logprob.get(tri)
            if row is None:
                row = unk
            else:
                known += 1
            for li in range(len(scores)):
                scores[li] += row[li]
        if known < MIN_COVERAGE * n:
            return (False, "un", 0.0)
        if hint_language in self._lang_index():
            scores[self._lang_index()[hint_language]] += HINT_BONUS * n
        order = sorted(range(len(scores)), key=scores.__getitem__, reverse=True)
        best, second = order[0], order[1] if len(order) > 1 else order[0]
        margin = (scores[best] - scores[second]) / max(1, n)
        lang = self.langs[best]
        reliable = margin >= RELIABLE_MARGIN and sum(
            1 for c in stripped if unicodedata.category(c)[0] == "L"
        ) >= MIN_LETTERS
        return (reliable, lang, margin)

    def _lang_index(self) -> dict[str, int]:
        idx = getattr(self, "_idx", None)
        if idx is None:
            idx = {l: i for i, l in enumerate(self.langs)}
            self._idx = idx
        return idx


def main() -> None:  # pragma: no cover  (exercised via scripts/train_models.py)
    from textpipe_ray.data.seed_corpora import SEED_CORPORA

    model = train(SEED_CORPORA)
    out = sys.argv[1] if len(sys.argv) > 1 else str(DEFAULT_MODEL_PATH)
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf8") as f:
        json.dump(model, f, ensure_ascii=False, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":  # pragma: no cover
    main()
