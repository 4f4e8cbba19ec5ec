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

import numpy as np

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


# code-point mixing constants: 0x110000 > max code point, so the key
# c0*K2 + c1*K1 + c2 is collision-free and < 2^63
_K1 = np.uint64(0x110000)
_K2 = np.uint64(0x110000) * np.uint64(0x110000)

# Vectorized per-char Unicode class: one uint8 per code point
# (0=other, 1=strip: M*/C* mark/control, 2=letter).  Built lazily once
# per process (~1 s, 1.1 MB) — per-actor init cost, never per batch;
# replaces a per-char python loop that dominated langid profile time.
_STRIP, _LETTER = 1, 2
_CLS_TABLE: np.ndarray | None = None


def _cls_table() -> np.ndarray:
    global _CLS_TABLE
    if _CLS_TABLE is None:
        table = np.zeros(0x110000, dtype=np.uint8)
        cat = unicodedata.category
        for cp in range(0x110000):
            c0 = cat(chr(cp))[0]
            if c0 in ("M", "C"):
                table[cp] = _STRIP
            elif c0 == "L":
                table[cp] = _LETTER
        _CLS_TABLE = table
    return _CLS_TABLE


class LangIdModel:
    """Loaded scorer.  Construction cost (log-prob table build) is paid
    once per actor in the stage's ``__init__`` — never per batch.
    Scoring is vectorized: trigram keys → ``np.searchsorted`` into a
    sorted key array → one matrix gather + column sum per document."""

    def __init__(self, model: dict):
        _cls_table()  # build the char-class table here, not mid-batch
        counts = model["counts"]
        self.langs: list[str] = sorted(counts)
        nl = len(self.langs)
        vocab = sorted({tri for table in counts.values() for tri in table})
        v = len(vocab)
        tri_index = {tri: i for i, tri in enumerate(vocab)}
        self._unk = np.empty(nl, dtype=np.float64)
        mat = np.empty((v, nl), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            table = counts[lang]
            total = sum(table.values())
            denom = total + ALPHA * (v + 1)
            self._unk[li] = math.log(ALPHA / denom)
            col = np.full(v, self._unk[li])
            for tri, c in table.items():
                col[tri_index[tri]] = math.log((c + ALPHA) / denom)
            mat[:, li] = col
        keys = np.array(
            [
                int(_K2) * ord(t[0]) + int(_K1) * ord(t[1]) + ord(t[2])
                for t in vocab
            ],
            dtype=np.uint64,
        )
        order = np.argsort(keys)
        self._keys = keys[order]
        self._mat = mat[order]
        self._idx = {l: i for i, l in enumerate(self.langs)}

    @classmethod
    def load(cls, path: str | Path = DEFAULT_MODEL_PATH) -> "LangIdModel":
        with open(path, "r", encoding="utf8") as f:
            return cls(json.load(f))

    def _trigram_keys(self, stripped: str) -> np.ndarray:
        padded = " " + stripped.lower()[:MAX_CHARS] + " "
        codes = np.frombuffer(padded.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        return codes[:-2] * _K2 + codes[1:-1] * _K1 + codes[2:]

    def detect(self, clean: str, hint_language: str | None = None) -> tuple[bool, str, float]:
        """→ (is_reliable, lang, margin).  ``clean`` is the post-clean text."""
        cls = _cls_table()
        # surrogatepass: JSON sources can legally deliver lone surrogates
        # (category Cs → class C → stripped below, matching the old
        # per-char path); a strict encode would kill the whole batch
        codes = np.frombuffer(clean.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
        cc = cls[codes]
        n_letters = int((cc == _LETTER).sum())
        if n_letters == 0:
            return (False, "un", 0.0)
        stripped = codes[cc != _STRIP].tobytes().decode("utf-32-le")
        keys = self._trigram_keys(stripped)
        n = len(keys)
        pos = np.searchsorted(self._keys, keys)
        pos_c = np.minimum(pos, len(self._keys) - 1)
        found = self._keys[pos_c] == keys
        known = int(found.sum())
        if known < MIN_COVERAGE * n:
            return (False, "un", 0.0)
        scores = self._mat[pos_c[found]].sum(axis=0) + (n - known) * self._unk
        if hint_language in self._idx:
            scores = scores.copy()
            scores[self._idx[hint_language]] += HINT_BONUS * n
        # stable: on an exact score tie the lowest lang index wins,
        # deterministically across numpy versions
        order = np.argsort(-scores, kind="stable")
        best = int(order[0])
        second = int(order[1]) if len(order) > 1 else best
        margin = float(scores[best] - scores[second]) / max(1, n)
        lang = self.langs[best]
        reliable = margin >= RELIABLE_MARGIN and n_letters >= MIN_LETTERS
        return (reliable, lang, margin)

    # Chunk size for detect_many: keeps the (keys × langs) gathered
    # score block L2/L3-resident.  Unchunked concatenation of a large
    # batch materializes ~100s of MB and goes memory-bandwidth-bound —
    # measured 10× SLOWER than the per-doc path; at 128 docs the
    # batched path matches the cache-resident per-doc rate.
    DETECT_CHUNK = 128

    def detect_many(
        self, texts: list, hints: list
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched :meth:`detect` — same per-document decisions, one
        table-lookup pass per cache-sized chunk (the ``perplexity_many``
        concatenation pattern, functions/perplexity.py:135-182):
        stripped texts are concatenated, trigram keys are built and
        searchsorted once per chunk, and per-doc score vectors come from
        ``np.add.reduceat`` over segment boundaries.  Summation grouping
        differs from ``detect``'s per-doc ``.sum(axis=0)`` by at most a
        few ulps (asserted in tests); decisions are identical away from
        exact thresholds.

        → (reliable: bool[n], lang: object[n], margin: float64[n])."""
        cs = self.DETECT_CHUNK
        if len(texts) > cs:
            parts = [
                self.detect_many(texts[i : i + cs], hints[i : i + cs])
                for i in range(0, len(texts), cs)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
        cls = _cls_table()
        n_docs = len(texts)
        langs_out = np.full(n_docs, "un", dtype=object)
        reliable_out = np.zeros(n_docs, dtype=bool)
        margins_out = np.zeros(n_docs, dtype=np.float64)
        kept: list[int] = []
        pieces: list[np.ndarray] = []
        letters: list[int] = []
        for i, text in enumerate(texts):
            codes = np.frombuffer(
                (text or "").encode("utf-32-le", "surrogatepass"), dtype=np.uint32
            )
            cc = cls[codes]
            n_letters = int((cc == _LETTER).sum())
            if n_letters == 0:
                continue
            stripped = codes[cc != _STRIP].tobytes().decode("utf-32-le")
            padded = " " + stripped.lower()[:MAX_CHARS] + " "
            pieces.append(
                np.frombuffer(padded.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            )
            kept.append(i)
            letters.append(n_letters)
        if not kept:
            return reliable_out, langs_out, margins_out
        lens = np.array([len(p) - 2 for p in pieces], dtype=np.int64)  # keys per doc
        codes_cat = np.concatenate(pieces)
        keys_all = codes_cat[:-2] * _K2 + codes_cat[1:-1] * _K1 + codes_cat[2:]
        # doc k's own keys are [o_k, o_k + len_k) in key-space; positions
        # beyond that span doc boundaries and are excluded by reduceat
        starts = np.concatenate(([0], np.cumsum(lens + 2)[:-1]))
        bounds = np.empty(2 * len(lens), dtype=np.int64)
        bounds[0::2] = starts
        bounds[1::2] = starts + lens
        pos = np.searchsorted(self._keys, keys_all)
        pos_c = np.minimum(pos, len(self._keys) - 1)
        found = self._keys[pos_c] == keys_all
        # per-doc known counts (reduceat over the 0/1 mask; sentinel
        # keeps the final bound valid — same trick as perplexity_many)
        found_i = found.astype(np.int64)
        known = np.add.reduceat(np.append(found_i, 0), bounds)[0::2]
        # per-doc per-lang sums over FOUND rows only: compact the found
        # positions, convert each doc's bound to its rank among found
        gathered = self._mat[pos_c[found]]  # (n_found, n_langs)
        cum_found = np.concatenate(([0], np.cumsum(found_i)))
        fbounds = cum_found[bounds]
        scores = np.add.reduceat(
            np.vstack([gathered, np.zeros((1, len(self.langs)))]), fbounds, axis=0
        )[0::2]
        scores += (lens - known)[:, None] * self._unk[None, :]
        # coverage + hint + argmax, vectorized across docs
        kept_a = np.asarray(kept, dtype=np.int64)
        letters_a = np.asarray(letters, dtype=np.int64)
        covered = known >= MIN_COVERAGE * lens
        hint_idx = np.array(
            [self._idx.get(hints[i] if hints[i] is not None else "", -1) for i in kept],
            dtype=np.int64,
        )
        has_hint = hint_idx >= 0
        rows = np.flatnonzero(has_hint)
        scores[rows, hint_idx[rows]] += HINT_BONUS * lens[rows]
        order = np.argsort(-scores, axis=1, kind="stable")
        best = order[:, 0]
        second = order[:, 1] if scores.shape[1] > 1 else best
        r = np.arange(len(kept))
        margins = (scores[r, best] - scores[r, second]) / np.maximum(1, lens)
        langs_arr = np.asarray(self.langs, dtype=object)[best]
        reliable = (margins >= RELIABLE_MARGIN) & (letters_a >= MIN_LETTERS)
        # uncovered docs → (False, 'un', 0.0), same as detect()
        langs_arr = np.where(covered, langs_arr, "un")
        reliable = reliable & covered
        margins = np.where(covered, margins, 0.0)
        langs_out[kept_a] = langs_arr
        reliable_out[kept_a] = reliable
        margins_out[kept_a] = margins
        return reliable_out, langs_out, margins_out


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
