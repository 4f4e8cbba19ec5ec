"""Byte-pair-encoding tokenizer training over word-type frequencies.

Sennrich-et-al-2016 BPE learns merges from the WORD-FREQUENCY table,
not from raw running text — which is exactly what makes it cheap to
distribute: the corpus-sized work is one combiner-bounded word count
(exchange moves distinct word types × blocks, never token instances),
the merge loop itself runs on the bounded top-V type table on the
driver (the k-means-on-a-bounded-sample idiom), and applying the
learned merges is a row-local encode pass with the merge table
broadcast once.

Everything is deterministic: merge selection breaks count ties by
lexicographically smallest pair, so the learned tokenizer — and every
downstream token count — is bit-stable across runs, batchings and
engines (golden-oracle requirement).

The reference has no tokenizer training (its tokens come from spaCy,
doc.py:294-334); this is part of the engine's tokenizer-prep layer
next to ``q_char_coverage`` (SentencePiece coverage statistic).
"""

from __future__ import annotations

from collections import Counter

END = "</w>"  # end-of-word marker (Sennrich 2016)


def learn_bpe(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from (word, count) types.

    Deterministic: the best pair each round is max by (count, then
    lexicographically smallest pair); stops early when no pair occurs
    at least twice."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if w:
            vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        maxc = max(pairs.values())
        if maxc < 2:
            break
        # count desc, then lexicographically smallest pair — deterministic
        a, b = min(p for p, c in pairs.items() if c == maxc)
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encode of one word (lowest-rank adjacent
    pair merges first — the standard inference loop)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def token_count(word: str, ranks: dict[tuple[str, str], int]) -> int:
    return len(encode_word(word, ranks))
