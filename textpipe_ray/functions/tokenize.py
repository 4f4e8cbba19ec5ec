"""Deterministic regex tokenizer / sentencizer + readability kernels.

The reference delegates tokenization to spaCy (words/sents/nwords/
nsents, /root/reference/textpipe/doc.py:282-334) and readability to
textacy's Flesch reading ease (doc.py:356-372).  spaCy is not a
dependency of this engine, so these kernels define the engine's own
deterministic tokenizer contract.  All patterns are RE2-compatible so
the very same regexes run (a) scalar here, (b) vectorized via
``pyarrow.compute.count_substring_regex`` in the Arrow stages, and
(c) in DuckDB oracle SQL — three implementations, one definition.

Divergence from the reference is intentional and documented: spaCy
splits "She's" → ["She", "'s"]; this tokenizer yields
["She", "'", "s"].  The keep/drop oracle is defined over THIS
tokenizer (SURVEY.md §7.0).
"""

from __future__ import annotations

import re
from collections import Counter

# Word tokens: word-char runs, or a single non-word non-space char.
# Reproduces the reference's simple-text doctests, e.g.
# 'Test sentence for testing text.' → [..., ('text', 26), ('.', 30)].
WORD_PATTERN = r"\w+|[^\w\s]"
# ASCII \w for RE2/DuckDB parity on the oracle-checked tables.
WORD_PATTERN_ASCII = r"[0-9A-Za-z_]+|[^0-9A-Za-z_\s]"
# Sentence segments: a run of non-terminal chars plus trailing terminals.
SENT_PATTERN = r"[^.!?]+[.!?]*"
# Alphabetic words (syllable counting / readability).
ALPHA_WORD_PATTERN = r"[a-z]+"
VOWEL_GROUP_PATTERN = r"[aeiouy]+"

# GPT-2-style BPE pretokenizer, lookahead-free so it runs identically
# under RE2 (Arrow / DuckDB) and python-regex: English contractions,
# letter runs, digit runs and symbol runs, each with an optional single
# leading space, plus residual whitespace runs.  Counting matches of
# this pattern approximates a BPE tokenizer's pre-split token budget.
BPE_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\p{L}\p{N}\t\n\f\r ]+"
    r"|[\t\n\f\r ]+"
)

_RE_WORD = re.compile(WORD_PATTERN)
_RE_SENT = re.compile(SENT_PATTERN)
_RE_ALPHA_WORD = re.compile(ALPHA_WORD_PATTERN)
_RE_VOWEL_GROUP = re.compile(VOWEL_GROUP_PATTERN)

# 25 high-frequency English function words; used by the stopword-ratio
# quality rule over the oracle-checked `documents` table, and (with
# per-language lists from models/langid seed corpora) by the pages
# pipeline.  Frozen — changing it changes keep/drop semantics.
EN_STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they at"
).split()


def assert_plain_terms(terms, where: str) -> None:
    """Guard for term lists joined into ``|``-alternations: a term
    containing a regex metachar (``.``, ``?``, ``(``...) would silently
    change match semantics across all three engines (python-regex /
    Arrow / DuckDB) and shift keep/drop labels.  Fail loudly at load
    time instead."""
    meta = set(".^$*+?()[]{}|\\")
    for t in terms:
        bad = meta.intersection(t)
        if bad:
            raise ValueError(
                f"{where}: term {t!r} contains regex metacharacter(s) {sorted(bad)}; "
                "escape it or keep terms to word characters"
            )


def words(text: str) -> list[tuple[str, int]]:
    """Tokens with character offsets (reference: doc.py:323-334).

    >>> words('Test sentence for testing text.')
    [('Test', 0), ('sentence', 5), ('for', 14), ('testing', 18), ('text', 26), ('.', 30)]
    """
    return [(m.group(), m.start()) for m in _RE_WORD.finditer(text)]


def nwords(text: str) -> int:
    return sum(1 for _ in _RE_WORD.finditer(text))


def sents(text: str) -> list[tuple[str, int]]:
    """Sentence segments with character offsets (reference: doc.py:294-309).

    >>> sents('Test sentence for testing text. And another one! And stuff.')
    [('Test sentence for testing text.', 0), ('And another one!', 32), ('And stuff.', 49)]
    """
    out = []
    for m in _RE_SENT.finditer(text):
        seg = m.group()
        stripped = seg.strip()
        if not stripped:
            continue
        out.append((stripped, m.start() + (len(seg) - len(seg.lstrip()))))
    return out


def nsents(text: str) -> int:
    """Count of SENT_PATTERN matches — the exact definition the Arrow
    stage and the DuckDB oracle share (whitespace-only text cleans to
    '' upstream, so the whitespace-only-segment edge never differs)."""
    return sum(1 for _ in _RE_SENT.finditer(text))


def word_counts(text: str) -> dict[str, int]:
    """Per-document term frequency (reference: doc.py:336-354)."""
    return dict(Counter(m.group() for m in _RE_WORD.finditer(text)))


def syllables(word: str) -> int:
    """Vowel-group syllable estimate; ≥1 for any alphabetic word."""
    return max(1, len(_RE_VOWEL_GROUP.findall(word)))


def flesch_reading_ease(text: str) -> float:
    """Flesch reading ease over THIS tokenizer's counts (reference
    semantics doc.py:356-372: returns 100 when there are no syllables).

    Defined with plain float ops in a fixed order so the DuckDB oracle
    (same expression over doubles) is bit-identical.
    """
    lowered = text.lower()
    wrds = _RE_ALPHA_WORD.findall(lowered)
    n_words = len(wrds)
    n_sents = nsents(text)
    n_syll = sum(syllables(w) for w in wrds)
    if n_syll == 0 or n_words == 0 or n_sents == 0:
        return 100.0
    return 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words)


def extract_lead(text: str, n: int = 3) -> list[str]:
    """Lead-N sentence texts (reference: doc.py:757-776)."""
    return [s for s, _ in sents(text)[:n]]
