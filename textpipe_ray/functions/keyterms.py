"""Keyterm extraction: TextRank and YAKE rankers.

The reference proxies to textacy's rankers with the contract
``extract_keyterms(ranker, n_terms) → [(term, score)]``, empty for
empty docs, ``ValueError`` listing the valid rankers on an unknown name
(/root/reference/textpipe/doc.py:405-439).  This engine implements:

- ``textrank`` (the default ranker) from the public algorithm:
  PageRank on a sliding-window co-occurrence graph of candidate words,
  plus adjacent top-word merging into multiword terms;
- ``yake`` from the published statistics-only algorithm (Campos et
  al. 2020, "YAKE! Keyword extraction from single documents using
  multiple local features", Information Sciences 509): per-word
  casing/position/frequency/relatedness/dispersion features composed
  into S(w), n-gram candidates scored prod(S)/(TF·(1+ΣS)) —
  LOWER score = better — with similarity dedup;
- ``sgrank`` from the published hybrid algorithm (Danesh, Sumner &
  Fischer, *SEM 2015): subsumption-adjusted statistical stage-1
  ranking, then weighted PageRank over a distance-weighted
  co-occurrence graph of the top candidates (single-document idf≡1);
- ``scake`` remains a window-tweaked textrank STAND-IN (its published
  form relies on external semantic connectivity); selecting it emits a
  one-time ``UserWarning`` naming the substitution (SURVEY.md §7.0).
"""

from __future__ import annotations

import re
import warnings

import numpy as np

from textpipe_ray.data.seed_corpora import STOPWORDS

RANKERS = ["textrank", "sgrank", "scake", "yake"]
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_STANDIN_WARNED: set[str] = set()


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


def _yake(
    text: str,
    lang: str,
    n_terms: int,
    ngram_max: int = 3,
    window: int = 1,
    dedup_lim: float = 0.9,
) -> list[tuple[str, float]]:
    """YAKE (Campos et al. 2020) — statistics-only single-document
    keyword extraction; LOWER score = more important, results ascending.

    Per-word features over case-preserving sentence tokens:
    ``TCase`` (acronym/proper-noun evidence), ``TPos``
    (log-log of median sentence offset), ``TFNorm`` (frequency against
    mean+std of non-stopword words), ``TRel`` (left/right co-occurrence
    dispersion in a ±``window``), ``TSent`` (sentence spread), composed
    as S(w) = TPos·TRel / (TCase + TFNorm/TRel + TSent/TRel); candidate
    1..3-grams (no stopword/short-word edges) score
    S(kw) = ΠS(w) / (TF(kw)·(1+ΣS(w))), then similarity dedup keeps the
    best surface forms."""
    from difflib import SequenceMatcher
    from statistics import median

    from textpipe_ray.functions.tokenize import sents as _sents

    stop = set(STOPWORDS.get(lang, STOPWORDS["en"]))
    sentences: list[list[str]] = []
    for s, _ in _sents(text or ""):
        toks = [m.group() for m in _WORD_RE.finditer(s)]
        if toks:
            sentences.append(toks)
    if not sentences:
        return []

    tf: dict[str, int] = {}
    tf_acr: dict[str, int] = {}
    tf_upper: dict[str, int] = {}
    sent_ids: dict[str, set[int]] = {}
    offsets: dict[str, list[int]] = {}
    left_tot: dict[str, int] = {}
    left_dis: dict[str, set[str]] = {}
    right_tot: dict[str, int] = {}
    right_dis: dict[str, set[str]] = {}
    for si, toks in enumerate(sentences):
        low = [t.lower() for t in toks]
        for i, (t, w) in enumerate(zip(toks, low)):
            tf[w] = tf.get(w, 0) + 1
            if t.isupper() and len(t) > 1:
                tf_acr[w] = tf_acr.get(w, 0) + 1
            elif t[0].isupper() and i > 0:
                tf_upper[w] = tf_upper.get(w, 0) + 1
            sent_ids.setdefault(w, set()).add(si)
            offsets.setdefault(w, []).append(si)
            for j in range(max(0, i - window), i):
                left_tot[w] = left_tot.get(w, 0) + 1
                left_dis.setdefault(w, set()).add(low[j])
                right_tot[low[j]] = right_tot.get(low[j], 0) + 1
                right_dis.setdefault(low[j], set()).add(w)

    valid_tfs = np.array(
        [n for w, n in tf.items() if w not in stop], dtype=np.float64
    )
    if len(valid_tfs) == 0:
        return []
    mean_tf, std_tf = float(valid_tfs.mean()), float(valid_tfs.std())
    max_tf = float(max(tf.values()))

    def s_word(w: str) -> float:
        f = float(tf[w])
        t_case = max(tf_acr.get(w, 0), tf_upper.get(w, 0)) / (1.0 + np.log(f))
        t_pos = float(np.log(np.log(3.0 + median(offsets[w]))))
        t_fnorm = f / (mean_tf + std_tf) if (mean_tf + std_tf) > 0 else f
        dl = len(left_dis.get(w, ())) / left_tot[w] if left_tot.get(w) else 0.0
        dr = len(right_dis.get(w, ())) / right_tot[w] if right_tot.get(w) else 0.0
        t_rel = 1.0 + (dl + dr) * f / max_tf
        t_sent = len(sent_ids[w]) / len(sentences)
        return (t_pos * t_rel) / (t_case + t_fnorm / t_rel + t_sent / t_rel)

    sw = {w: s_word(w) for w in tf}

    cand_tf: dict[str, tuple[float, ...]] = {}
    counts: dict[str, int] = {}
    for toks in sentences:
        low = [t.lower() for t in toks]
        for n in range(1, ngram_max + 1):
            for i in range(len(low) - n + 1):
                gram = low[i : i + n]
                if gram[0] in stop or gram[-1] in stop:
                    continue
                if len(gram[0]) < 3 or len(gram[-1]) < 3:
                    continue
                key = " ".join(gram)
                counts[key] = counts.get(key, 0) + 1
                cand_tf.setdefault(key, tuple(sw[w] for w in gram))

    scored = []
    for key, ws in cand_tf.items():
        s = float(np.prod(ws)) / (counts[key] * (1.0 + float(sum(ws))))
        scored.append((key, s))
    scored.sort(key=lambda kv: (kv[1], kv[0]))  # ascending: lower = better

    kept: list[tuple[str, float]] = []
    for term, s in scored:
        if any(
            SequenceMatcher(None, term, k).ratio() >= dedup_lim for k, _ in kept
        ):
            continue
        kept.append((term, s))
        if len(kept) >= n_terms:
            break
    return kept


def extract_keyterms(
    text: str, lang: str = "en", ranker: str = "textrank", n_terms: int = 10, window: int = 2
) -> list[tuple[str, float]]:
    """→ top-``n_terms`` (term, score); [] for wordless docs; ValueError
    with the reference's message shape for unknown rankers.  ``yake``
    runs the real published algorithm (scores ascending, lower=better);
    ``sgrank`` runs the real published algorithm (scores descending);
    only ``scake`` is a documented textrank stand-in and warns once
    per process."""
    if ranker not in RANKERS:
        raise ValueError(f'ranker "{ranker}" not available; use one of {RANKERS}')
    if ranker == "yake":
        return _yake(text, lang, n_terms)
    if ranker == "sgrank":
        return _sgrank(text, lang, n_terms)
    all_words, words = _tokens_and_candidates(text, lang)
    if not words:
        return []
    if ranker == "scake":
        if ranker not in _STANDIN_WARNED:
            _STANDIN_WARNED.add(ranker)
            warnings.warn(
                f'ranker "{ranker}" is a textrank-based stand-in in this engine '
                "(textacy's algorithm is not reimplemented; see SURVEY.md §7.0)",
                UserWarning,
                stacklevel=2,
            )
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


def _sgrank(
    text: str,
    lang: str,
    n_terms: int,
    ngram_max: int = 6,
    top_t: int = 100,
    window: int = 100,
) -> list[tuple[str, float]]:
    """SGRank (Danesh, Sumner & Fischer, *SEM 2015) — the statistical +
    graph hybrid, single-document setting (idf ≡ 1):

    1. candidates: 1..6-gram alpha spans with no stopword/short-word
       edges, counted with FIRST-occurrence token position;
    2. subsumption-adjusted counts: tf'(c) = tf(c) − Σ tf(d) over
       longer candidates d that contain c (a unigram inside a kept
       bigram is not double-counted);
    3. stage-1 statistical score: S1 = tf'(c) · TL(c) ·
       PFO(c) where TL = term word length and PFO =
       log(cutoff / first_pos) position-of-first-occurrence factor
       (cutoff = max(500, doc tokens), floor 1);
    4. top-``top_t`` candidates form a graph whose edge weights sum
       (1/distance) over co-occurrences within a ``window``-token
       window, scaled by both endpoints' S1 (the paper's stat-weighted
       edges); weighted PageRank re-ranks them.

    Scores descending (higher = better), matching textrank's contract.
    """
    from textpipe_ray.functions.tokenize import sents as _sents

    stop = set(STOPWORDS.get(lang, STOPWORDS["en"]))
    sent_toks: list[list[str]] = []
    n_tok = 0
    for s, _ in _sents(text or ""):
        ws = [m.group().lower() for m in _WORD_RE.finditer(s)]
        if ws:
            sent_toks.append(ws)
            n_tok += len(ws)
    if n_tok == 0:
        return []

    # candidates never cross sentence boundaries and are stopword-free
    # THROUGHOUT (textacy's filter_stops over the whole n-gram — this,
    # not an edge check, is what keeps one-off glue-word spans out);
    # positions are global token indices.  Multiword candidates need
    # tf ≥ 2 on non-trivial docs (the paper's frequency pruning).
    min_multi_tf = 2 if n_tok >= 60 else 1
    tf: dict[tuple[str, ...], int] = {}
    first: dict[tuple[str, ...], int] = {}
    positions: dict[tuple[str, ...], list[int]] = {}
    base = 0
    for ws in sent_toks:
        ok = [w not in stop and len(w) >= 3 for w in ws]
        for n in range(1, ngram_max + 1):
            for i in range(len(ws) - n + 1):
                if not all(ok[i : i + n]):
                    continue
                gram = tuple(ws[i : i + n])
                tf[gram] = tf.get(gram, 0) + 1
                positions.setdefault(gram, []).append(base + i)
                if gram not in first:
                    first[gram] = base + i
        base += len(ws)

    if min_multi_tf > 1:
        for g in list(tf):
            if len(g) > 1 and tf[g] < min_multi_tf:
                del tf[g], positions[g], first[g]
    if not tf:
        return []
    # subsumption adjustment: subtract each longer candidate's count
    # from every shorter candidate it contains
    tf_adj = dict(tf)
    for gram, cnt in tf.items():
        if len(gram) == 1:
            continue
        for n in range(1, len(gram)):
            for i in range(len(gram) - n + 1):
                sub = gram[i : i + n]
                if sub in tf_adj:
                    tf_adj[sub] -= cnt
    cutoff = max(500.0, float(n_tok))
    s1 = {
        g: max(tf_adj[g], 0.25)
        * len(g)
        * max(1.0, np.log(cutoff / (first[g] + 1.0)))
        for g in tf
    }
    cands = sorted(s1, key=lambda g: (-s1[g], g))[:top_t]
    cidx = {g: k for k, g in enumerate(cands)}

    # distance-weighted co-occurrence graph over the top candidates,
    # edges scaled by both endpoints' stage-1 weights
    m = len(cands)
    adj = np.zeros((m, m))
    occ = sorted(
        (p, g) for g in cands for p in positions[g]
    )
    for a in range(len(occ)):
        pa, ga = occ[a]
        for b in range(a + 1, len(occ)):
            pb, gb = occ[b]
            d = pb - pa
            if d > window:
                break
            if ga == gb:
                continue
            w = (1.0 / max(d, 1)) * np.sqrt(s1[ga] * s1[gb])
            ia, ib = cidx[ga], cidx[gb]
            adj[ia, ib] += w
            adj[ib, ia] += w
    pr = _pagerank(adj)
    out = sorted(
        ((" ".join(g), float(pr[cidx[g]])) for g in cands),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return out[:n_terms]
