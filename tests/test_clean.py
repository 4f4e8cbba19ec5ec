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
