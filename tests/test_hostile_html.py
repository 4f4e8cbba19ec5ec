"""Hostile-HTML extraction goldens (goldens/hostile_html.json).

The clean kernel's supported-HTML profile is "bs4 ``get_text()`` over
the stdlib ``html.parser`` tokenizer" (reference doc.py:206 runs
``BeautifulSoup(text, 'html.parser').get_text()``; this engine
reimplements it on the SAME stdlib tokenizer, functions/clean.py:34).
These cases pin the profile's behavior on real-web pathologies — CDATA
sections, unclosed tags, double-escaped entities, interleaved
script/style, comments containing markup, EOF inside a tag — so any
kernel change that shifts a byte gets flagged.

Documented profile notes (intentional, matching the stdlib tokenizer
bs4's html.parser builder wraps):
- ``<script>``/``<style>`` RAW CONTENTS are kept (they are string nodes
  in the tree model, and get_text concatenates all string nodes);
- a CDATA section's contents are kept as a string node;
- an UNTERMINATED comment or tag at EOF is flushed as literal data on
  close() — the raw ``<!--``/``<a href="...`` bytes appear in the text;
- ``<textarea>`` is NOT an RCDATA element for this tokenizer (browsers
  differ): markup inside it is parsed as markup;
- out-of-range numeric charrefs become U+FFFD; unknown named entities
  stay literal.
"""

import json
from pathlib import Path

import pytest

GOLDEN = Path(__file__).resolve().parents[1] / "goldens" / "hostile_html.json"
CASES = json.loads(GOLDEN.read_text(encoding="utf8"))


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_hostile_html_extraction_golden(case):
    from textpipe_ray.functions.clean import html_to_text

    assert html_to_text(case["html"]) == case["text"], case["name"]


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_hostile_html_clean_golden(case):
    """End-to-end clean (extraction + dots/quotes/whitespace passes)."""
    from textpipe_ray.functions.clean import clean_text

    assert clean_text(case["html"]) == case["clean"], case["name"]


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_hostile_html_fastpath_equivalence(case):
    """The simple-HTML fast path must either reject hostile input or
    produce byte-identical output to the full parser."""
    from textpipe_ray.functions import clean as C

    full = C._TextExtractor()
    try:
        full.feed(case["html"])
        full.close()
        expected = full.text()
    except Exception:
        import re

        expected = re.sub(r"<[^>]*>", "", case["html"])
    assert C.html_to_text(case["html"]) == expected
