"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
model) from a word-TYPE frequency table.

Same contract as :mod:`textpipe_ray.functions.bpe`: the trainer
consumes the bounded ``(word, count)`` type table — never token
instances — so the distributed half of training is exactly the
combiner-bounded word-count exchange, and the EM loop runs on the
driver over a few thousand rows.  Viterbi-EM (hard assignments) instead
of full forward-backward: the expected counts become exact integers
(type counts), so the only float state is the log-prob table computed
single-threaded from integer counts — deterministic across runs and
block layouts.

Determinism contract:
- seed selection and the final vocab cap break ties by
  (count desc, piece asc);
- the Viterbi DP scans split points ascending and keeps strictly-better
  scores only, so ties resolve to the longest leading piece;
- unknown single characters segment as themselves at ``UNK_LOGP``.
"""

from __future__ import annotations

import math

UNK_LOGP = -20.0


def seed_vocab(
    types: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, int]:
    """Occurrence-weighted substring counts over the type table: all
    single characters (coverage) + the ``seed_size`` most frequent
    multi-character substrings up to ``max_piece_len``."""
    from collections import Counter

    singles: Counter = Counter()
    multis: Counter = Counter()
    for word, cnt in types:
        n = len(word)
        for i in range(n):
            singles[word[i]] += cnt
            for j in range(i + 2, min(i + max_piece_len, n) + 1):
                multis[word[i:j]] += cnt
    top = sorted(multis.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(singles)
    out.update(top)
    return out


def viterbi_pieces(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` under the piece log-probs; unknown
    single chars fall back to ``UNK_LOGP``."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j != 1:
                    continue
                lp = UNK_LOGP
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def em_train(
    types: list[tuple[str, int]],
    max_piece_len: int,
    seed_size: int,
    vocab_size: int,
    iters: int,
) -> dict[str, float]:
    """Viterbi-EM over the type table → final piece log-prob dict of at
    most ``vocab_size`` pieces (all surviving single chars always
    kept)."""
    counts = seed_vocab(types, max_piece_len, seed_size)

    def to_logp(c: dict[str, int]) -> dict[str, float]:
        total = sum(c.values())
        return {p: math.log(v) - math.log(total) for p, v in c.items() if v > 0}

    logp = to_logp(counts)
    for _ in range(iters):
        new: dict[str, int] = {}
        for word, cnt in types:
            for piece in viterbi_pieces(word, logp, max_piece_len):
                new[piece] = new.get(piece, 0) + cnt
        # coverage floor: a single char of the type table never drops
        # out entirely, or later encodes lose determinism to UNK paths
        for p in counts:
            if len(p) == 1 and p not in new:
                new[p] = 1
        counts = new
        logp = to_logp(counts)
    # final cap: keep all single chars + top multi-char pieces
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - len(singles))]
    final = dict(singles)
    final.update(multis)
    return to_logp(final)
