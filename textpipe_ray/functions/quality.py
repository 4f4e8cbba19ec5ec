"""Heuristic quality features + keep/drop rule assembly.

The reference supplies the *features* a quality filter consumes
(nwords/nsents doc.py:282-334, Flesch complexity doc.py:356-372,
char-category filtering idea doc.py:125-126) but never drops documents;
keep/drop is the north-rule extension (SURVEY.md §2.4).

Parity-by-construction: every count feature is defined ONCE as an RE2
pattern in ``RE2_PATTERNS`` and evaluated three ways from the same
string —

* vectorized over Arrow batches via ``pyarrow.compute.count_substring_regex``
  (Arrow's regex engine is RE2),
* in DuckDB oracle SQL via ``len(regexp_extract_all(...))`` (DuckDB's
  regex engine is also RE2),
* scalar in Python via the installed ``regex`` module (supports
  ``\\p{L}`` like RE2) for unit tests.

Ratios and the keep rule are plain double arithmetic in a fixed
operation order, so Ray results and DuckDB oracle results are
bit-identical.  Thresholds live in ``models/quality_thresholds.json``
(versioned; its hash is recorded in partition lineage).
"""

from __future__ import annotations

import functools as _functools

import json
from pathlib import Path

import regex as _regex

from textpipe_ray.functions.tokenize import EN_STOPWORDS

THRESHOLDS_PATH = Path(__file__).resolve().parents[2] / "models" / "quality_thresholds.json"

from textpipe_ray.functions.tokenize import assert_plain_terms

assert_plain_terms(EN_STOPWORDS, "EN_STOPWORDS")
_STOPWORD_ALT = "|".join(EN_STOPWORDS)

# One definition, three engines (Arrow / DuckDB / python-regex).
RE2_PATTERNS: dict[str, str] = {
    # word tokens: letter/number/underscore runs, or one symbol char
    # NOTE: explicit ASCII whitespace class, NOT \s — RE2 (DuckDB/Arrow)
    # treats \s as ASCII-only while python's `regex` treats it as
    # Unicode; spelling it out makes every engine tokenize identically
    # (NBSP and other Unicode spaces count as symbol tokens everywhere)
    "nwords": r"[\p{L}\p{N}_]+|[^\p{L}\p{N}_\t\n\f\r ]",
    # sentence segments (shared with tokenize.SENT_PATTERN semantics)
    "nsents": r"[^.!?]+[.!?]*",
    "n_alpha": r"\p{L}",
    "n_digit": r"\p{N}",
    "n_upper": r"\p{Lu}",
    "n_space": r" ",
    # tokens ≥16 chars — boilerplate/URL junk indicator
    "n_long_words": r"[\p{L}\p{N}_]{16,}",
    # English stopword hits, counted on lower(text)
    "n_stopwords": rf"\b(?:{_STOPWORD_ALT})\b",
}
# features counted on the lowercased text
LOWERED_FEATURES = {"n_stopwords"}

FEATURE_ORDER = list(RE2_PATTERNS)

_COMPILED = {name: _regex.compile(pat) for name, pat in RE2_PATTERNS.items()}


@_functools.lru_cache(maxsize=8)
def load_thresholds(path: str | Path = THRESHOLDS_PATH) -> dict:
    with open(path, "r", encoding="utf8") as f:
        return json.load(f)


def count_features(text: str) -> dict[str, int]:
    """Scalar evaluation of every RE2 count feature (tests / row debug)."""
    out = {"n_chars": len(text)}
    for name, creg in _COMPILED.items():
        target = text.lower() if name in LOWERED_FEATURES else text
        out[name] = sum(1 for _ in creg.finditer(target))
    return out


def derived_features(f: dict[str, float]) -> dict[str, float]:
    """Ratio features; fixed expression order == the oracle SQL."""
    n_chars = f["n_chars"]
    nwords = f["nwords"]
    return {
        "alpha_ratio": f["n_alpha"] / n_chars if n_chars > 0 else 0.0,
        "digit_ratio": f["n_digit"] / n_chars if n_chars > 0 else 0.0,
        "upper_ratio": f["n_upper"] / n_chars if n_chars > 0 else 0.0,
        "symbol_ratio": (n_chars - f["n_alpha"] - f["n_digit"] - f["n_space"]) / n_chars
        if n_chars > 0
        else 0.0,
        "stopword_ratio": f["n_stopwords"] / nwords if nwords > 0 else 0.0,
        "mean_word_len": f["n_alpha"] / nwords if nwords > 0 else 0.0,
    }


def keep_rule(f: dict[str, float], t: dict) -> bool:
    """The text-feature half of keep/drop (lang/perplexity conjuncts are
    added by the pages pipeline; this half is the DuckDB-checkable one)."""
    return (
        f["nwords"] >= t["min_words"]
        and f["nwords"] <= t["max_words"]
        and f["nsents"] >= t["min_sents"]
        and f["mean_word_len"] >= t["min_mean_word_len"]
        and f["mean_word_len"] <= t["max_mean_word_len"]
        and f["n_stopwords"] >= t["min_stopwords"]
        and f["symbol_ratio"] <= t["max_symbol_ratio"]
        and f["digit_ratio"] <= t["max_digit_ratio"]
        and f["n_long_words"] <= t["max_long_words"]
    )


def quality_features(text: str) -> dict[str, float]:
    """All features for one doc (scalar path)."""
    f = dict(count_features(text))
    f.update(derived_features(f))
    return f


DEFAULT_THRESHOLDS = {
    "version": 1,
    "min_words": 8,
    "max_words": 200000,
    "min_sents": 1,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "min_stopwords": 2,
    "max_symbol_ratio": 0.30,
    "max_digit_ratio": 0.30,
    "max_long_words": 4,
    # pages-pipeline-only conjuncts (not SQL-checkable: model outputs)
    "require_reliable_lang": True,
    "allowed_langs": ["en", "nl", "fr", "es", "de", "it", "pt", "zh"],
    "max_perplexity": 26.0,
    "max_toxic_hits": 2,
}


def main() -> None:  # pragma: no cover
    THRESHOLDS_PATH.parent.mkdir(parents=True, exist_ok=True)
    with open(THRESHOLDS_PATH, "w", encoding="utf8") as f:
        json.dump(DEFAULT_THRESHOLDS, f, indent=2, sort_keys=True)
    print(f"wrote {THRESHOLDS_PATH}")


if __name__ == "__main__":  # pragma: no cover
    main()
