"""Golden tests for the clean/extract kernel.

Pins the reference's doctest values (/root/reference/textpipe/doc.py:186-218,
README.md:77-80) and the behaviors its test corpus exercises
(tests/test_doc.py:15-55,110-117)."""

from textpipe_ray.functions.clean import clean_text, html_to_text, resolve_lang

TEXT_4 = "this is a paragraph\nthis is a paragraph\n"


def test_reference_doctests():
    assert clean_text("“Please clean this piece… of text</b>„") == '"Please clean this piece... of text"'
    assert clean_text("Sample text! <!DOCTYPE>") == "Sample text!"
    # flags-off returns raw (doc.py:201-202)
    raw = "“raw…  <b>x</b>„"
    assert clean_text(raw, False, False, False, False) == raw


def test_newline_paragraphs():
    # reference test_doc.py:116-117
    assert clean_text(TEXT_4) == " ".join(TEXT_4.split())


def test_html_extraction_profile():
    # nested tags, attributes, entities
    html = '<p><b>Text mining</b>, from <a href="/wiki/X" title="X">text</a> &amp; data.</p>'
    assert clean_text(html) == "Text mining, from text & data."
    # numeric entity
    assert clean_text("a&#8230;b") == "a...b"
    # comments and doctype are dropped
    assert clean_text("<!DOCTYPE html><!-- hidden -->visible") == "visible"
    # script/style contents are string nodes (bs4 get_text keeps them)
    assert clean_text("<style>b{}</style>x") == "b{}x"
    # CDATA kept as text
    assert html_to_text("<![CDATA[in cdata]]>x").startswith("in cdata")
    # stray close tag dropped
    assert clean_text("text</b> end") == "text end"


def test_quote_classes_exact():
    # single-quote class (doc.py:213)
    assert clean_text("`a‘b’c‛d⸂e⸃f⸌g⸍h⸜i⸝j", remove_html=False) == "'a'b'c'd'e'f'g'h'i'j"
    # double-quote class — note ” is NOT replaced (doc.py:214)
    assert clean_text("„a“b''c,,d”e", remove_html=False) == '"a"b"c"d”e'


def test_whitespace_and_controls():
    assert clean_text("a \t\n\xa0 b") == "a b"
    assert clean_text("  lead and trail  ") == "lead and trail"
    assert clean_text("") == ""


def test_clean_shorter_than_raw():
    # reference test_doc.py:110-113 (length monotonic on HTML input)
    html = "<p><b>Hello</b> <i>world</i></p>\n\n"
    assert len(clean_text(html)) <= len(html)


def test_resolve_lang_rule():
    assert resolve_lang("nl", True, "en") == "nl"
    assert resolve_lang("nl", False, "en") == "en"


def test_fast_path_matches_parser():
    """The simple-HTML fast path must be byte-identical to the
    HTMLParser path on everything it accepts; tricky constructs must
    fall back (and thus also match trivially)."""
    import re

    from textpipe_ray.functions.clean import _SIMPLE_HTML, _TextExtractor, html_to_text

    def parser_text(raw):
        p = _TextExtractor()
        p.feed(raw)
        p.close()
        return p.text()

    simple = [
        "<p>hello <b>world</b></p>",
        '<a href="x?a=1&b=2">link</a> tail',
        "<br/>line<BR>two",
        "<div class='c'>text</div>",
        "plain no tags at all",
        "<p>multi\nline <i>text</i>\t here</p>",
        "<p>unclosed",  # unclosed ELEMENT is fine; the tag itself is complete
        "",
        # charrefs, comments and simple declarations stay on the fast path
        "<p>a & b</p>",
        "<p>&amp; &lt; &#65; &#x41; &quot;</p>",
        "a&am<b>p;b",                          # entity split by a tag must NOT merge
        "a&am<!-- c -->p;d",                   # ...nor across a comment
        "<!-- comment -->text",
        "<!-- has < and > inside -->x",
        "<!DOCTYPE html><p>x</p>",
        "<!DOCTYPE html>\n<html><head><meta charset='utf-8'/></head><body>t</body></html>",
    ]
    for raw in simple:
        assert html_to_text(raw) == parser_text(raw), raw

    tricky = [
        "<script>var a = 1 < 2;</script>after",
        "<script>a<b>c</script>",             # cdata: <b> is literal data
        "<style>p>span{}</style>t",
        '<a title="a>b">x</a>',               # '>' inside quoted attr
        "a < b and c > d",                    # stray angle brackets
        "< notatag>x",
        "<![CDATA[kept]]>t",                  # CDATA content is a text node
        "<!DOCTYPE html [ <!ENTITY x 'y'> ]>t",  # internal subset
        "<!-- unterminated comment",
    ]
    for raw in tricky:
        # all must route through the parser path...
        assert not (_SIMPLE_HTML.match(raw) and not re.search(r"<(?:script|style)", raw, re.I)), raw
        assert html_to_text(raw) == parser_text(raw), raw


def test_fast_path_corpus_equivalence():
    """Every synthetic page the fast path accepts yields the same bytes
    as the parser path."""
    from textpipe_ray.functions.clean import (
        _CDATA_ELEM,
        _SIMPLE_HTML,
        _TextExtractor,
        html_to_text,
    )
    from textpipe_ray.sources.pages import generate_pages

    t = generate_pages(300, seed=99)
    n_fast = 0
    for h in t.column("html").to_pylist():
        raw = h.decode("utf8")
        if _SIMPLE_HTML.match(raw) and not _CDATA_ELEM.search(raw):
            n_fast += 1
            p = _TextExtractor()
            p.feed(raw)
            p.close()
            assert html_to_text(raw) == p.text()
    # the synthetic corpus should mostly hit the fast path, else the
    # optimization is dead weight
    assert n_fast > 0
    print(f"fast-path coverage: {n_fast}/300")


def test_fast_path_fuzz():
    """Property: html_to_text equals the pure-parser extraction on
    arbitrary markup-ish strings (the fast path may only ever change
    speed, never bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from textpipe_ray.functions.clean import _TextExtractor, html_to_text

    alphabet = st.sampled_from(list("<>&\"'!-abc /=;#xA9") + ["<p>", "</p>", "<!--", "-->", "&amp;", "&#65;"])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=30).map("".join))
    def check(raw):
        p = _TextExtractor()
        try:
            p.feed(raw)
            p.close()
            want = p.text()
        except Exception:
            return  # parser fallback path, nothing to compare
        assert html_to_text(raw) == want, raw

    check()


def test_normalize_texts_batched_equivalence():
    """Property: the batched NUL-join normalisation is byte-identical to
    per-doc clean_text(remove_html=False) — including the str.replace
    substitution for the quote regexes and str.split() for \\s+ collapse."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from textpipe_ray.functions.clean import clean_text, normalize_texts

    assert normalize_texts([]) == []
    # NUL in input takes the per-doc fallback
    assert normalize_texts(["a\0b…"]) == [clean_text("a\0b…", remove_html=False)]

    alphabet = st.sampled_from(list("a'b,\t\n `‘’‛⸂⸃⸌⸍⸜⸝„“…\"x\x1c\x1d\xa0 ") + ["''", ",,", "  "])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.lists(alphabet, max_size=20).map("".join), min_size=1, max_size=6))
    def check(batch):
        assert normalize_texts(batch) == [clean_text(t, remove_html=False) for t in batch]

    check()


def test_counts_complement_trick_exact():
    """n_alpha via length-minus-complement and n_space via literal count
    must equal the direct RE2 pattern counts on adversarial unicode."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from textpipe_ray.functions.quality import FEATURE_ORDER, LOWERED_FEATURES, RE2_PATTERNS
    from textpipe_ray.stages.text import _F64, _counts

    texts = [
        "",
        "abc def",
        "ĄŻÓŁĆ gęślą jaźń 123",
        "汉字 テスト 한글",
        "a b c\td",
        "ALL CAPS!!! 999 ___",
        "é" * 50 + " " * 10,
    ]
    arr = pa.array(texts, type=pa.string())
    lowered = pc.utf8_lower(arr)
    got = _counts(arr, lowered)
    for name in FEATURE_ORDER:
        target = lowered if name in LOWERED_FEATURES else arr
        want = pc.cast(pc.count_substring_regex(target, RE2_PATTERNS[name]), _F64)
        assert got[name].to_pylist() == want.to_pylist(), name


def test_html_to_paragraphs():
    from textpipe_ray.functions.clean import html_to_paragraphs

    # block tags delimit; inline tags don't; empties dropped; per-para
    # normalisation applies the dots/quotes/whitespace passes
    html = (
        "<html><body><p>One  two… three.</p><div>Four <b>five</b>!</div>"
        "<p>   </p><ul><li>item one here</li><li>item two</li></ul>"
        "A tail “quoted„ bit</body></html>"
    )
    assert html_to_paragraphs(html) == [
        "One two... three.",
        "Four five!",
        "item one here",
        "item two",
        'A tail "quoted" bit',
    ]
    # <br> splits; malformed input degrades to the single-para clean
    assert html_to_paragraphs("a<br/>b") == ["a", "b"]
    assert html_to_paragraphs("") == []


def test_html_paragraphs_flat():
    from textpipe_ray.functions.clean import html_paragraphs_flat, html_to_paragraphs

    docs = ["<p>a b.</p><p>c d!</p>", b"<div>bytes doc</div>", "", b"\xff<p>x</p>"]
    paras, offsets = html_paragraphs_flat(docs)
    # offsets[i]:offsets[i+1] spans doc i, matching per-doc extraction
    assert offsets[0] == 0 and offsets[-1] == len(paras)
    for i, d in enumerate(docs):
        raw = d.decode("utf8", "replace") if isinstance(d, bytes) else d
        assert paras[offsets[i] : offsets[i + 1]] == html_to_paragraphs(raw)


def test_paragraph_rules_consistent_with_query_constants():
    import re

    from textpipe_ray.pipelines.queries import PARA_MIN_WORDS, PARA_TERMINAL_RE

    assert PARA_MIN_WORDS == 5
    keep = "this line has five words."
    drop_short = "too few words."
    drop_nopunct = "this line has five words"
    drop_brace = "this line has five {words}."
    for s, want in [(keep, True), (drop_short, False), (drop_nopunct, False), (drop_brace, False)]:
        ok = (
            len(re.findall(r"\S+", s)) >= PARA_MIN_WORDS
            and re.search(PARA_TERMINAL_RE, s) is not None
            and "{" not in s
        )
        assert ok == want, s
