"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Shape fixed by the north rule (BASELINE.json ``input_hint``):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Content modeled on the reference's test corpus (TEXT_1/2/4/7,
/root/reference/tests/test_doc.py:15-55): nested tags, entities, curly
quotes, ellipses, whitespace runs, control chars, ``<<First Name>>``
placeholders — plus planted quality/PII/dup variation with KNOWN
expected keep/drop outcomes, which is what the F1≥0.99 gate measures
against.

Everything is seeded (seed=42); host choice is Zipf-skewed over 20
domains to exercise url-hash partitioning against host skew.

``text`` holds the ground-truth extraction: the generator asserts
``clean_text(html) == text`` at build time (the HTML wrapping must be
losslessly reversible by the clean kernel; handcrafted adversarial
cases are covered separately in tests/test_clean.py).
"""

from __future__ import annotations

import random
import re
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from textpipe_ray.data.seed_corpora import SEED_CORPORA
from textpipe_ray.functions.clean import clean_text

SEED = 42
PAGE_LANGS = ["en", "nl", "fr", "es", "de"]
HOSTS = [f"host{i:02d}.example.{tld}" for i, tld in enumerate(
    ["com", "org", "net", "io", "dev"] * 4
)]

# row categories with their planted expectations
# (category, weight, expected_keep)
CATEGORIES = [
    ("good", 0.50, True),
    ("short", 0.08, False),
    ("gibberish", 0.08, False),
    ("digit_heavy", 0.06, False),
    ("symbol_heavy", 0.04, False),
    ("pii", 0.08, True),          # kept, but scrub counters > 0
    ("toxic", 0.05, False),       # > max_toxic_hits
    ("empty_un", 0.04, False),    # '', '...', digits → lang 'un'
    ("dup_exact", 0.04, True),    # duplicate of a good row (kept; dedup finds it)
    ("dup_near", 0.03, True),
]

_SENTS: dict[str, list[str]] = {
    lang: [s.strip() + "." for s in re.split(r"(?<=[.。])\s+", text) if s.strip()]
    for lang, text in SEED_CORPORA.items()
}
# per-language vocabulary for the unique-suffix sentence that keeps
# non-duplicate docs genuinely distinct (shingle Jaccard well below the
# near-dup threshold) even though they sample the same sentence pool
_VOCAB: dict[str, list[str]] = {
    lang: sorted({w for w in re.findall(r"[^\W\d_]+", text.lower()) if len(w) > 2})
    for lang, text in SEED_CORPORA.items()
}


def _unique_suffix(rng: random.Random, lang: str) -> str:
    vocab = _VOCAB[lang]
    k = min(14, len(vocab))
    return " ".join(rng.sample(vocab, k)) + "."

_TOXIC = ["idiot", "stupid", "moron"]
_PII_SNIPPETS = [
    "Contact me at john.doe{i}@example.com for details.",
    "Call +1 (555) 123-45{i:02d} any time.",
    "My card is 4111 1111 1111 11{i:02d}.",
    "Server at 10.0.{i}.25 is down.",
]


def _make_text(rng: random.Random, lang: str, category: str, i: int) -> tuple[str, str]:
    """→ (plain_text, final_category).  plain_text is single-spaced prose."""
    sents = _SENTS[lang]
    if category == "good":
        k = rng.randint(4, 9)
        picks = [sents[rng.randrange(len(sents))] for _ in range(k)]
        picks.append(_unique_suffix(rng, lang))
        return " ".join(picks), category
    if category == "short":
        # genuinely short under the engine's tokenizer contract
        # (apostrophes split into extra tokens, so cap by token count)
        from textpipe_ray.functions.tokenize import nwords as _nwords

        words = sents[rng.randrange(len(sents))].split()
        budget = rng.randint(2, 5)
        out: list[str] = []
        for w in words:
            if _nwords(" ".join(out + [w])) > budget:
                break
            out.append(w)
        return " ".join(out or words[:1]), category
    if category == "gibberish":
        # consonant-heavy shuffled junk: no stopwords, high perplexity
        base = "".join(rng.choice("bcdfghjklmnpqrstvwxz") for _ in range(rng.randint(80, 160)))
        return " ".join(base[j : j + rng.randint(3, 7)] for j in range(0, len(base), 6)), category
    if category == "digit_heavy":
        nums = " ".join(str(rng.randint(100, 99999)) for _ in range(rng.randint(20, 40)))
        return f"table of values {nums}", category
    if category == "symbol_heavy":
        syms = " ".join("#$%^&*@!" for _ in range(rng.randint(15, 30)))
        return f"menu {syms} footer", category
    if category == "pii":
        k = rng.randint(4, 7)
        picks = [sents[rng.randrange(len(sents))] for _ in range(k)]
        picks.insert(rng.randrange(len(picks)), _PII_SNIPPETS[i % len(_PII_SNIPPETS)].format(i=i % 100))
        picks.append(_unique_suffix(rng, lang))
        return " ".join(picks), category
    if category == "toxic":
        k = rng.randint(4, 7)
        picks = [sents[rng.randrange(len(sents))] for _ in range(k)]
        for t in _TOXIC:
            picks.insert(rng.randrange(len(picks)), f"You are a {t} and a {t}.")
        picks.append(_unique_suffix(rng, lang))
        return " ".join(picks), category
    if category == "empty_un":
        return rng.choice(["", "...", "12 34 56 78 90", "!!! ??? !!!"]), category
    raise ValueError(category)


def _wrap_html(rng: random.Random, text: str) -> str:
    """Deterministically wrap plain text in HTML that the clean kernel
    extracts back to exactly ``clean_text`` of the plain text."""
    words = text.split(" ")
    parts: list[str] = ['<!DOCTYPE html>\n<html>\n<head><meta charset="utf-8"/></head>\n<body>\n']
    parts.append("<!-- boilerplate comment -->\n")
    para: list[str] = []
    for w, word in enumerate(words):
        esc = word.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        r = rng.random()
        if r < 0.08:
            esc = f"<b>{esc}</b>"
        elif r < 0.14:
            esc = f"<i>{esc}</i>"
        elif r < 0.20:
            esc = f'<a href="/wiki/{w}" title="link">{esc}</a>'
        para.append(esc)
        if rng.random() < 0.12 and para:
            parts.append("<p>" + " ".join(para) + "</p>\n")
            para = []
    if para:
        parts.append("<p>" + " ".join(para) + "</p>\n")
    parts.append("</body>\n</html>\n")
    return "".join(parts)


def generate_pages(num_rows: int, seed: int = SEED, base_index: int = 0) -> pa.Table:
    """One shard of the pages table.  ``base_index`` offsets urls and
    timestamps so shards generated independently (in parallel, each
    from its own derived seed) never collide."""
    rng = random.Random(seed)
    host_weights = np.array([1.0 / (i + 1) for i in range(len(HOSTS))])
    host_weights /= host_weights.sum()
    host_rng = np.random.RandomState(seed)
    host_idx = host_rng.choice(len(HOSTS), size=num_rows, p=host_weights)

    cat_names = [c for c, _, _ in CATEGORIES]
    cat_weights = [w for _, w, _ in CATEGORIES]
    cat_keep = {c: k for c, _, k in CATEGORIES}

    urls, tss, htmls, texts, langs = [], [], [], [], []
    exp_keep, exp_cat = [], []
    good_rows: list[tuple[str, str, str]] = []  # (text, html, lang) pool for dups

    epoch_us = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z
    for i in range(num_rows):
        cat = rng.choices(cat_names, weights=cat_weights, k=1)[0]
        lang = rng.choice(PAGE_LANGS)
        if cat in ("dup_exact", "dup_near") and good_rows:
            src_text, src_html, src_lang = good_rows[rng.randrange(len(good_rows))]
            if cat == "dup_near":
                words = src_text.split(" ")
                if len(words) > 5:
                    words[rng.randrange(len(words))] = "changed"
                src_text = " ".join(words)
                src_html = _wrap_html(random.Random(seed * 7 + i), src_text)
            text, html, lang = src_text, src_html, src_lang
        else:
            if cat in ("dup_exact", "dup_near"):
                cat = "good"
            text, cat = _make_text(rng, lang, cat, i)
            html = _wrap_html(random.Random(seed * 13 + i), text)
            if cat == "good":
                good_rows.append((text, html, lang))
        expected = clean_text(text, remove_html=False)
        got = clean_text(html)
        assert got == expected, f"row {i}: extraction mismatch\n{got!r}\n{expected!r}"
        urls.append(f"https://{HOSTS[host_idx[i]]}/page/{base_index + i:08d}")
        tss.append(epoch_us + (base_index + i) * 1_000_000)
        htmls.append(html.encode("utf8"))
        texts.append(expected)
        langs.append(lang if cat != "empty_un" else "un")
        exp_keep.append(cat_keep.get(cat, True) if cat != "good" else True)
        exp_cat.append(cat)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # ground-truth side columns (not part of the north-rule input
            # schema; written to a sidecar file, not pages.parquet)
            "expected_keep": pa.array(exp_keep, pa.bool_()),
            "category": pa.array(exp_cat, pa.string()),
        }
    )


def _shard_spec(num_rows: int, num_files: int, seed: int):
    rows_per = (num_rows + num_files - 1) // num_files
    out = []
    for f in range(num_files):
        lo = f * rows_per
        hi = min(num_rows, lo + rows_per)
        if lo >= hi:
            break
        # independent derived seed per shard → shards are generatable in
        # parallel and individually deterministic
        out.append((f, hi - lo, seed + 7919 * (f + 1), lo))
    return out


def write_pages(out_dir: str | Path, num_rows: int, seed: int = SEED, num_files: int = 4) -> Path:
    """Write pages.parquet shards + expected.parquet sidecar; idempotent.
    Shards generate in parallel as Ray tasks when a Ray session is up."""
    out = Path(out_dir)
    marker = out / f".complete-v2-{num_rows}-{seed}-{num_files}"
    if marker.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    # a different config wrote here before: clear its shards AND marker,
    # or a smaller num_files would leave stale extra shards behind that
    # a glob would silently mix into the new table
    for stale in list(out.glob("pages-*.parquet")) + list(out.glob(".complete-*")):
        stale.unlink()
    shards = _shard_spec(num_rows, num_files, seed)

    def build(n, s, base):
        t = generate_pages(n, s, base)
        return t.select(["url", "warc_ts", "html", "text", "lang"]), t.select(
            ["url", "expected_keep", "category"]
        )

    try:
        import ray

        use_ray = ray.is_initialized() and num_rows >= 5000
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        gen = ray.remote(num_cpus=1)(build)
        results = ray.get([gen.remote(n, s, base) for _, n, s, base in shards])
    else:
        results = [build(n, s, base) for _, n, s, base in shards]

    expected_parts = []
    for (f, _, _, _), (pages, expected) in zip(shards, results):
        pq.write_table(pages, out / f"pages-{f:04d}.parquet")
        expected_parts.append(expected)
    pq.write_table(pa.concat_tables(expected_parts), out / "expected.parquet")
    marker.touch()
    return out
