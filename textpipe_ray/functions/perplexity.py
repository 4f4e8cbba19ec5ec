"""KenLM-style character n-gram perplexity scorer (self-trained).

The north rule calls for a perplexity quality signal (the reference's
only text-quality score is Flesch complexity, doc.py:356-372; the
perplexity stage is a new-engine addition per SURVEY.md §2.4).  This is
an interpolated order-3 character LM:

    P(c | h2 h1) = l3*P3 + l2*P2 + l1*P1 + l0*U

with fixed interpolation weights and add-alpha smoothed maximum
likelihood tables, trained per language on the deterministic seed
corpora and committed to ``models/lm.json``.  Perplexity is
``exp(-mean log P)`` over the characters of the (lowercased, truncated)
text.  Natural in-language text scores low; shuffled-character
gibberish scores high — that separation is what the keep/drop rule
thresholds (models/quality_thresholds.json) rely on.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

DEFAULT_MODEL_PATH = Path(__file__).resolve().parents[2] / "models" / "lm.json"
MAX_CHARS = 2000
LAMBDAS = (0.55, 0.25, 0.15, 0.05)  # trigram, bigram, unigram, uniform
UNIFORM = 1.0 / 10000.0
ALPHA = 0.1


def _norm(text: str) -> str:
    return " ".join(text.lower().split())[:MAX_CHARS]


def train(corpora: dict[str, str]) -> dict:
    out: dict[str, dict] = {}
    for lang, text in sorted(corpora.items()):
        t = _norm(text)
        padded = "  " + t + " "
        tri: dict[str, int] = {}
        bi: dict[str, int] = {}
        uni: dict[str, int] = {}
        for i in range(2, len(padded)):
            tri_key = padded[i - 2 : i + 1]
            bi_key = padded[i - 1 : i + 1]
            tri[tri_key] = tri.get(tri_key, 0) + 1
            bi[bi_key] = bi.get(bi_key, 0) + 1
            uni[padded[i]] = uni.get(padded[i], 0) + 1
        out[lang] = {"tri": tri, "bi": bi, "uni": uni}
    return {"version": 1, "tables": out}


import numpy as np

_K1 = np.uint64(0x110000)
_K2 = np.uint64(0x110000) * np.uint64(0x110000)


def _key_arrays(table: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
    """(sorted uint64 keys, aligned counts) for an n-gram count dict;
    keys mix code points collision-free (cp < 0x110000)."""
    keys = np.array(
        [sum(int(_K1) ** (len(k) - 1 - i) * ord(ch) for i, ch in enumerate(k)) for k in table],
        dtype=np.uint64,
    )
    counts = np.array(list(table.values()), dtype=np.float64)
    order = np.argsort(keys)
    return keys[order], counts[order]


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray, q: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(q))
    pos = np.minimum(np.searchsorted(sorted_keys, q), len(sorted_keys) - 1)
    out = counts[pos]
    out[sorted_keys[pos] != q] = 0.0
    return out


class PerplexityModel:
    """Per-language char-LM scorer; tables are converted once (per
    actor ``__init__``) to sorted key arrays so a document scores with
    five vectorized ``searchsorted`` lookups instead of a per-char
    python loop."""

    # dense log-prob tables are built only while D^3 stays small (all
    # Latin-alphabet langs qualify; pt is the largest at ~51k cells).
    # Past the bound the sparse searchsorted path wins: zh's 172-char
    # alphabet would cost 5.1M cells / ~0.1 s per actor init and its
    # sparse tables are tiny (247 trigrams) anyway.
    DENSE_MAX_CELLS = 100_000

    def __init__(self, model: dict):
        self.tables = {}
        self.dense: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
        for lang, t in model["tables"].items():
            tri, bi, uni = t["tri"], t["bi"], t["uni"]
            tri_ctx: dict[str, int] = {}
            for k, c in tri.items():
                tri_ctx[k[:2]] = tri_ctx.get(k[:2], 0) + c
            bi_ctx: dict[str, int] = {}
            for k, c in bi.items():
                bi_ctx[k[:1]] = bi_ctx.get(k[:1], 0) + c
            uni_total = float(sum(uni.values()))
            vocab = len(uni) + 1
            self.tables[lang] = (
                _key_arrays(tri),
                _key_arrays(tri_ctx),
                _key_arrays(bi),
                _key_arrays(bi_ctx),
                _key_arrays(uni),
                uni_total,
                vocab,
            )
            dense = self._build_dense(tri, tri_ctx, bi, bi_ctx, uni, uni_total, vocab)
            if dense is not None:
                self.dense[lang] = dense
        self.langs = sorted(self.tables)

    @classmethod
    def _build_dense(cls, tri, tri_ctx, bi, bi_ctx, uni, uni_total, vocab):
        """Precompute ``log(l3·P3 + l2·P2 + l1·P1 + l0·U)`` for every
        dense-alphabet (c0, c1, c2) triple, so scoring is ONE gather per
        character instead of five ``searchsorted`` lookups.  The
        alphabet is exactly ``uni``'s keys (training guarantees every
        n-gram char appears there) plus one OOV id whose cells stay 0 —
        matching the sparse path's miss-as-zero, so results are
        BIT-IDENTICAL: every count, smoothing term and interpolation is
        computed in the same IEEE-double expression order."""
        alphabet = sorted(uni)
        D = len(alphabet) + 1  # last id = OOV
        if D**3 > cls.DENSE_MAX_CELLS:
            return None
        cid = {ch: j for j, ch in enumerate(alphabet)}
        if any(ch not in cid for k in tri for ch in k) or any(
            ch not in cid for k in bi for ch in k
        ):
            return None  # defensive: never alias distinct OOV chars
        oov = D - 1
        max_cp = max(ord(ch) for ch in alphabet)
        cmap = np.full(max_cp + 2, oov, dtype=np.int64)
        for ch, j in cid.items():
            cmap[ord(ch)] = j

        tri_c = np.zeros((D, D, D), dtype=np.float64)
        for k, c in tri.items():
            tri_c[cid[k[0]], cid[k[1]], cid[k[2]]] = c
        tri_ctx_c = np.zeros((D, D), dtype=np.float64)
        for k, c in tri_ctx.items():
            tri_ctx_c[cid[k[0]], cid[k[1]]] = c
        bi_c = np.zeros((D, D), dtype=np.float64)
        for k, c in bi.items():
            bi_c[cid[k[0]], cid[k[1]]] = c
        bi_ctx_c = np.zeros(D, dtype=np.float64)
        for k, c in bi_ctx.items():
            bi_ctx_c[cid[k]] = c
        uni_c = np.zeros(D, dtype=np.float64)
        for k, c in uni.items():
            uni_c[cid[k]] = c

        l3, l2, l1, l0 = LAMBDAS
        p3 = (tri_c + ALPHA) / (tri_ctx_c[:, :, None] + ALPHA * vocab)
        p2 = (bi_c + ALPHA) / (bi_ctx_c[:, None] + ALPHA * vocab)
        p1 = (uni_c + ALPHA) / (uni_total + ALPHA * vocab)
        logp = np.log(l3 * p3 + l2 * p2[None, :, :] + l1 * p1[None, None, :] + l0 * UNIFORM)
        return cmap, np.ascontiguousarray(logp.reshape(-1)), D

    @classmethod
    def load(cls, path: str | Path = DEFAULT_MODEL_PATH) -> "PerplexityModel":
        with open(path, "r", encoding="utf8") as f:
            return cls(json.load(f))

    def perplexity(self, text: str, lang: str) -> float:
        """Per-char perplexity under ``lang``'s LM (fallback: 'en')."""
        lang_t = self.tables.get(lang) or self.tables.get("en")
        if lang_t is None:
            lang_t = self.tables[self.langs[0]]
        t = _norm(text)
        if not t:
            return float(1.0 / UNIFORM)  # empty = maximally surprising
        (tri, tri_ctx, bi, bi_ctx, uni, uni_total, vocab) = lang_t
        padded = "  " + t
        codes = np.frombuffer(padded.encode("utf-32-le", "surrogatepass"), dtype=np.uint32).astype(np.uint64)
        c0, c1, c2 = codes[:-2], codes[1:-1], codes[2:]
        l3, l2, l1, l0 = LAMBDAS
        p3 = (_lookup(*tri, c0 * _K2 + c1 * _K1 + c2) + ALPHA) / (
            _lookup(*tri_ctx, c0 * _K1 + c1) + ALPHA * vocab
        )
        p2 = (_lookup(*bi, c1 * _K1 + c2) + ALPHA) / (_lookup(*bi_ctx, c1) + ALPHA * vocab)
        p1 = (_lookup(*uni, c2) + ALPHA) / (uni_total + ALPHA * vocab)
        logp = np.log(l3 * p3 + l2 * p2 + l1 * p1 + l0 * UNIFORM).sum()
        return float(math.exp(-logp / len(c2)))

    def perplexity_many(self, texts: list[str], langs: list[str]) -> np.ndarray:
        """Batched scoring: docs grouped by language, each group's padded
        texts concatenated so the five n-gram table lookups run ONCE per
        (lang, batch) over one long array instead of five ``searchsorted``
        calls per document.  Per-position arithmetic is identical to
        :meth:`perplexity`; results agree to ~1 ulp (only the log-prob
        summation grouping differs — asserted in tests).  Per-doc sums
        come from ``np.add.reduceat`` over segment boundaries that
        exclude the inter-doc pad positions."""
        n = len(texts)
        out = np.full(n, float(1.0 / UNIFORM), dtype=np.float64)
        by_lang: dict[str, list[int]] = {}
        for i, lang in enumerate(langs):
            key = lang if lang in self.tables else ("en" if "en" in self.tables else self.langs[0])
            by_lang.setdefault(key, []).append(i)
        l3, l2, l1, l0 = LAMBDAS
        for lang, idxs in by_lang.items():
            (tri, tri_ctx, bi, bi_ctx, uni, uni_total, vocab) = self.tables[lang]
            normed = [_norm(texts[i] or "") for i in idxs]
            keep = [(i, t) for i, t in zip(idxs, normed) if t]
            if not keep:
                continue
            lens = np.array([len(t) for _, t in keep], dtype=np.int64)
            concat = "".join("  " + t for _, t in keep)
            codes = np.frombuffer(concat.encode("utf-32-le", "surrogatepass"), dtype=np.uint32).astype(np.uint64)
            dense = self.dense.get(lang)
            if dense is not None:
                # one gather per char position (bit-identical to the
                # sparse expression — see _build_dense)
                cmap, logp_flat, D = dense
                ids = cmap[np.minimum(codes, np.uint64(len(cmap) - 1)).astype(np.int64)]
                idx = (ids[:-2] * D + ids[1:-1]) * D + ids[2:]
                logp = logp_flat[idx]
            else:
                c0, c1, c2 = codes[:-2], codes[1:-1], codes[2:]
                p3 = (_lookup(*tri, c0 * _K2 + c1 * _K1 + c2) + ALPHA) / (
                    _lookup(*tri_ctx, c0 * _K1 + c1) + ALPHA * vocab
                )
                p2 = (_lookup(*bi, c1 * _K1 + c2) + ALPHA) / (_lookup(*bi_ctx, c1) + ALPHA * vocab)
                p1 = (_lookup(*uni, c2) + ALPHA) / (uni_total + ALPHA * vocab)
                logp = np.log(l3 * p3 + l2 * p2 + l1 * p1 + l0 * UNIFORM)
            # doc k (2 pad + len chars) starts at offset o_k in c2-space;
            # its own trigram positions are [o_k, o_k + len_k)
            starts = np.concatenate(([0], np.cumsum(lens + 2)[:-1]))
            bounds = np.empty(2 * len(lens), dtype=np.int64)
            bounds[0::2] = starts
            bounds[1::2] = starts + lens
            # reduceat requires every bound < len(array); the final doc's
            # end bound equals len(logp), so append one 0.0 sentinel —
            # each doc's sum is then a plain sequential reduceat segment,
            # bit-identical regardless of where the doc sits in the batch
            # (physical layout / shuffle cannot perturb values)
            sums = np.add.reduceat(np.append(logp, 0.0), bounds)[0::2]
            ppl = np.exp(-sums / lens)
            out[np.array([i for i, _ in keep], dtype=np.int64)] = ppl
        return out


def main() -> None:  # pragma: no cover
    import sys

    from textpipe_ray.data.seed_corpora import SEED_CORPORA

    model = train(SEED_CORPORA)
    out = sys.argv[1] if len(sys.argv) > 1 else str(DEFAULT_MODEL_PATH)
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf8") as f:
        json.dump(model, f, ensure_ascii=False, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":  # pragma: no cover
    main()
