"""Stateless vectorized text stages (clean / quality / scrub / readability).

The quality and scrub stages never loop over rows: they evaluate the
shared RE2 patterns (``functions.quality.RE2_PATTERNS``,
``models/scrub_rules.json``) with ``pyarrow.compute`` string kernels,
which is also what makes them bit-identical to the DuckDB oracle SQL
(both engines are RE2 + IEEE doubles; see functions/quality.py).

The clean stage is necessarily per-row (an HTML parse is not a regex)
but uses only compiled stdlib machinery and is CPU-bound C-ish work;
it is the flagship pipeline's main compute stage and scales by tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from textpipe_ray import schema as S
from textpipe_ray.functions.clean import html_to_text, normalize_texts
from textpipe_ray.functions.quality import (
    FEATURE_ORDER,
    LOWERED_FEATURES,
    RE2_PATTERNS,
    load_thresholds,
)
from textpipe_ray.functions.scrub import load_rules
from textpipe_ray.functions.strhash import md5_hex

# ---------------------------------------------------------------------------
# clean / extract
# ---------------------------------------------------------------------------


def clean_batch(batch: pa.Table, source_col: str = S.HTML, out_col: str = S.CLEAN) -> pa.Table:
    """html→text extraction + normalisation (reference doc.py:193-218).

    Reads ``source_col`` (binary html or string text), appends ``clean``.
    """
    col = batch.column(source_col)
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = pc.cast(col, pa.string())
    vals = col.to_pylist()
    extracted = [html_to_text(v) if v is not None else "" for v in vals]
    cleaned = normalize_texts(extracted)
    return batch.append_column(out_col, pa.array(cleaned, type=pa.string()))


def normalize_batch(batch: pa.Table, text_col: str = "text", out_col: str = S.CLEAN) -> pa.Table:
    """The clean kernel minus HTML removal (dots → quotes → whitespace),
    fully vectorized — the plain-text counterpart of :func:`clean_batch`
    and the exact mirror of ``oracle.clean_norm_expr``."""
    from textpipe_ray.functions.clean import (
        DOTS_PATTERN,
        DOUBLE_QUOTES_PATTERN,
        SINGLE_QUOTES_PATTERN,
        WHITESPACE_PATTERN,
    )

    col = batch.column(text_col)
    col = pc.replace_substring_regex(col, DOTS_PATTERN, "...")
    col = pc.replace_substring_regex(col, SINGLE_QUOTES_PATTERN, "'")
    col = pc.replace_substring_regex(col, DOUBLE_QUOTES_PATTERN, '"')
    col = pc.replace_substring_regex(col, WHITESPACE_PATTERN, " ")
    col = pc.utf8_trim(col, " ")
    return batch.append_column(out_col, col)


def content_hash_batch(batch: pa.Table, text_col: str = S.CLEAN) -> pa.Table:
    """md5 hex of the text — exact-dedup key (matches DuckDB ``md5()``).

    Digests are computed over memoryview slices of the Arrow UTF-8
    buffer (functions/strhash.py) — same md5 values as the naive
    ``to_pylist`` + ``encode`` loop at ~1.7× the throughput in the one
    stage every byte passes through."""
    hashes = md5_hex(batch.column(text_col))
    return batch.append_column(S.CONTENT_HASH, pa.array(hashes, type=pa.string()))


# ---------------------------------------------------------------------------
# quality features + keep/drop
# ---------------------------------------------------------------------------

_F64 = pa.float64()


def _counts(text: pa.ChunkedArray | pa.Array, lowered) -> dict[str, pa.ChunkedArray]:
    out = {"n_chars": pc.cast(pc.utf8_length(text), _F64)}
    for name in FEATURE_ORDER:
        target = lowered if name in LOWERED_FEATURES else text
        # two implementation substitutions with provably identical
        # counts (RE2 count cost scales with MATCHES, and these two
        # patterns match nearly every char):
        if name == "n_alpha":
            # every codepoint is \p{L} or not → n_alpha = len − n_non_alpha;
            # the complement has ~5× fewer matches (42 → 9 µs/doc)
            non = pc.count_substring_regex(target, r"[^\p{L}]")
            out[name] = pc.cast(pc.subtract(pc.utf8_length(target), non), _F64)
        elif name == "n_space":
            # the pattern is the literal ' ' → memchr-speed literal count
            out[name] = pc.cast(pc.count_substring(target, pattern=" "), _F64)
        else:
            out[name] = pc.cast(pc.count_substring_regex(target, RE2_PATTERNS[name]), _F64)
    return out


def quality_batch(
    batch: pa.Table,
    text_col: str = S.CLEAN,
    thresholds: dict | None = None,
    stopword_counts: pa.Array | None = None,
) -> pa.Table:
    """Append count features, ratio features, ``keep`` and ``drop_reason``.

    ``keep`` here is the text-feature half of the rule; the pages
    pipeline ANDs in the lang/perplexity conjuncts afterwards.
    ``stopword_counts`` (float64 array) overrides the default
    English-list count — the pages pipeline passes per-resolved-language
    counts from :func:`stopword_counts_by_lang`.
    """
    t = thresholds if thresholds is not None else load_thresholds()
    text = batch.column(text_col)
    lowered = pc.utf8_lower(text)
    f = _counts(text, lowered)
    if stopword_counts is not None:
        f["n_stopwords"] = stopword_counts

    safe_chars = pc.max_element_wise(f["n_chars"], pa.scalar(1.0, _F64))
    safe_words = pc.max_element_wise(f["nwords"], pa.scalar(1.0, _F64))
    f["alpha_ratio"] = pc.divide(f["n_alpha"], safe_chars)
    f["digit_ratio"] = pc.divide(f["n_digit"], safe_chars)
    f["upper_ratio"] = pc.divide(f["n_upper"], safe_chars)
    f["symbol_ratio"] = pc.divide(
        pc.subtract(pc.subtract(pc.subtract(f["n_chars"], f["n_alpha"]), f["n_digit"]), f["n_space"]),
        safe_chars,
    )
    f["stopword_ratio"] = pc.divide(f["n_stopwords"], safe_words)
    f["mean_word_len"] = pc.divide(f["n_alpha"], safe_words)

    # ordered rule list: (name, boolean "violated" array)
    rules = [
        ("too_few_words", pc.less(f["nwords"], t["min_words"])),
        ("too_many_words", pc.greater(f["nwords"], t["max_words"])),
        ("too_few_sents", pc.less(f["nsents"], t["min_sents"])),
        ("word_len_low", pc.less(f["mean_word_len"], t["min_mean_word_len"])),
        ("word_len_high", pc.greater(f["mean_word_len"], t["max_mean_word_len"])),
        ("too_few_stopwords", pc.less(f["n_stopwords"], t["min_stopwords"])),
        ("symbol_heavy", pc.greater(f["symbol_ratio"], t["max_symbol_ratio"])),
        ("digit_heavy", pc.greater(f["digit_ratio"], t["max_digit_ratio"])),
        ("long_word_junk", pc.greater(f["n_long_words"], t["max_long_words"])),
    ]
    keep = None
    for _, violated in rules:
        ok = pc.invert(violated)
        keep = ok if keep is None else pc.and_(keep, ok)

    # first failing rule name ('' if kept) — numpy select, small arrays
    conds = [np.asarray(v) for _, v in rules]
    names = [n for n, _ in rules]
    reason = np.select(conds, names, default="")

    for name in list(f):
        batch = batch.append_column(name, f[name])
    batch = batch.append_column(S.KEEP, keep)
    batch = batch.append_column(S.DROP_REASON, pa.array(reason.tolist(), type=pa.string()))
    return batch


def _lang_stopword_pattern(lang: str) -> str | None:
    """NOTE: RE2 has no lookarounds and its \b is ASCII-only, so
    stopwords whose edge characters are non-ASCII letters ('à', 'è')
    never match the \b boundary — they contribute 0 to n_stopwords on
    every engine (Ray and the DuckDB oracle agree, keeping parity and
    keep/drop deterministic, but fr/it stopword counts are biased low).
    A token-based counter would fix the bias at the cost of a second
    tokenize pass."""
    from textpipe_ray.data.seed_corpora import STOPWORDS

    terms = STOPWORDS.get(lang)
    if not terms:
        return None
    from textpipe_ray.functions.tokenize import assert_plain_terms

    assert_plain_terms(terms, f"STOPWORDS[{lang}]")
    alt = "|".join(terms)
    # \b is a \w-relative anchor (ASCII in RE2) — unusable for CJK chars,
    # which are not \w; count bare occurrences for zh instead.
    return rf"(?:{alt})" if lang == "zh" else rf"\b(?:{alt})\b"


def stopword_counts_by_lang(
    batch: pa.Table, text_col: str = S.CLEAN, lang_col: str = S.RESOLVED_LANG
) -> pa.Array:
    """Per-row stopword count under each row's own language list.

    Vectorized as one full-column regex pass per language present in the
    batch, then a per-row select — languages are few, rows are many.
    """
    text = batch.column(text_col)
    lowered = pc.utf8_lower(text)
    langs = np.asarray(batch.column(lang_col))
    out = np.zeros(len(batch), dtype=np.float64)
    for lang in np.unique(langs):
        pat = _lang_stopword_pattern(str(lang))
        if pat is None:
            pat = _lang_stopword_pattern("en")
        counts = np.asarray(pc.cast(pc.count_substring_regex(lowered, pat), _F64))
        mask = langs == lang
        out[mask] = counts[mask]
    return pa.array(out, type=_F64)


# ---------------------------------------------------------------------------
# readability (Flesch; reference doc.py:356-372 '100 on no syllables')
# ---------------------------------------------------------------------------

ALPHA_WORD_RE2 = r"[a-z]+"
VOWEL_GROUP_RE2 = r"[aeiouy]+"
CONSONANT_WORD_RE2 = r"\b[b-df-hj-np-tv-xz]+\b"
SENT_RE2 = RE2_PATTERNS["nsents"]


def complexity_batch(batch: pa.Table, text_col: str = S.CLEAN) -> pa.Table:
    """NOTE: this RE2 syllable approximation differs from the scalar
    ``tokenize.flesch_reading_ease`` on edge tokens (vowel-free words
    adjacent to digits miss the \b consonant-word pattern here), so the
    flagship/oracle complexity and the Pipeline 'Complexity' op are two
    documented estimators of the same quantity, each internally
    consistent with its own oracle/golden tests.

    Vectorized Flesch reading ease over this engine's tokenizer counts."""
    text = batch.column(text_col)
    lowered = pc.utf8_lower(text)
    w = pc.cast(pc.count_substring_regex(lowered, ALPHA_WORD_RE2), _F64)
    vg = pc.cast(pc.count_substring_regex(lowered, VOWEL_GROUP_RE2), _F64)
    cw = pc.cast(pc.count_substring_regex(lowered, CONSONANT_WORD_RE2), _F64)
    s = pc.cast(pc.count_substring_regex(text, SENT_RE2), _F64)
    syl = pc.add(vg, cw)
    ws = pc.max_element_wise(w, pa.scalar(1.0, _F64))
    ss = pc.max_element_wise(s, pa.scalar(1.0, _F64))
    raw = pc.subtract(
        pc.subtract(pa.scalar(206.835, _F64), pc.multiply(pa.scalar(1.015, _F64), pc.divide(w, ss))),
        pc.multiply(pa.scalar(84.6, _F64), pc.divide(syl, ws)),
    )
    degenerate = pc.or_(pc.or_(pc.equal(syl, 0.0), pc.equal(w, 0.0)), pc.equal(s, 0.0))
    flesch = pc.if_else(degenerate, pa.scalar(100.0, _F64), raw)
    return batch.append_column("complexity", flesch)


# ---------------------------------------------------------------------------
# scrub
# ---------------------------------------------------------------------------


def scrub_batch(
    batch: pa.Table,
    text_col: str = S.CLEAN,
    out_col: str = S.SCRUBBED,
    rules: dict | None = None,
    with_counts: bool = True,
) -> pa.Table:
    """Sequential vectorized regex scrub; appends per-rule match counts
    (columns ``scrub_<rule>``) and the scrubbed text."""
    r = rules if rules is not None else load_rules()
    current = batch.column(text_col)
    for rule in r["rules"]:
        if with_counts:
            cnt = pc.cast(pc.count_substring_regex(current, rule["pattern"]), pa.int64())
            batch = batch.append_column(f"scrub_{rule['name']}", cnt)
        current = pc.replace_substring_regex(current, rule["pattern"], rule["replacement"])
    return batch.append_column(out_col, current)
