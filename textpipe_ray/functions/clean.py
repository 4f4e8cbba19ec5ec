"""HTML→text extraction + punctuation/whitespace normalisation kernel.

Semantics follow the reference's ``Doc.clean_text``
(/root/reference/textpipe/doc.py:193-218): (1) strip HTML via an
html.parser-backed text extraction (the reference uses
``BeautifulSoup(text, 'html.parser').get_text()``, whose tree builder
delegates to the same stdlib parser); (2) ``…`` → ``...``; (3) quote
normalisation; (4) whitespace collapse.  The north rule requires the
extracted text to be byte-identical per url to the reference, so the
regex passes below use the reference's exact character classes and
order of application.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Exact regexes from the reference kernel (doc.py:210-216; originally
# adapted there from Blendle's public cleaner.py).  NOTE: the right
# double quote '”' is intentionally NOT in the class — the
# reference does not replace it.  The pattern strings are exported so
# the Arrow stage and the DuckDB oracle SQL use literally these.
DOTS_PATTERN = "…"
SINGLE_QUOTES_PATTERN = "[`‘’‛⸂⸃⸌⸍⸜⸝]"
DOUBLE_QUOTES_PATTERN = "[„“]|('')|(,,)"
WHITESPACE_PATTERN = r"\s+"
_RE_DOTS = re.compile(DOTS_PATTERN)
_RE_SINGLE_QUOTES = re.compile(SINGLE_QUOTES_PATTERN)
_RE_DOUBLE_QUOTES = re.compile(DOUBLE_QUOTES_PATTERN)
_RE_WHITESPACE = re.compile(WHITESPACE_PATTERN)


class _TextExtractor(HTMLParser):
    """Collects the text nodes of an HTML document.

    Mirrors bs4 ``get_text()`` over an ``html.parser`` tree: character
    references converted (convert_charrefs=True), comments / doctype /
    processing instructions dropped, <script>/<style> raw contents and
    CDATA sections kept (they are plain string nodes in that model).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []

    def handle_data(self, data: str) -> None:
        self._chunks.append(data)

    def unknown_decl(self, data: str) -> None:
        # bs4 keeps CDATA section contents as a string node.
        if data.startswith("CDATA["):
            self._chunks.append(data[len("CDATA["):])

    def text(self) -> str:
        return "".join(self._chunks)


# Fast-path precheck: the document is "simple" when every '<' opens a
# tag that starts with a letter or '/', quoted attribute values contain
# no angle brackets, and the DATA text contains no '&' (so no charref
# conversion), no stray angle brackets, no comments/doctype/PI and no
# <script>/<style> cdata modes (checked separately).  For such input
# HTMLParser's text extraction is exactly "delete every <...> span", so
# one C-speed regex sub replaces the ~700 µs/doc python parse.  The
# precheck itself is a single regex scan; anything it rejects takes the
# full parser path, so the fast path can never change output bytes
# (equivalence asserted over the whole synthetic corpus + adversarial
# cases in tests/test_clean.py).
# possessive quantifiers (py3.11+) throughout: the naive version of
# this pattern backtracks exponentially on pathological inputs (found
# by the hypothesis fuzz test); possessive matching is linear and
# accepts the same language (runs are maximal either way)
_SIMPLE_HTML = re.compile(
    r"""(?:
        [^<>]++                                            # data (may hold &)
      | <!--(?:(?!-->).)*+-->                              # well-closed comment
      | <![a-zA-Z][^<>\[\]]*+>                             # simple declaration
      | <[a-zA-Z/](?:[^<>"']++|"[^"<>]*+"|'[^'<>]*+')*+>   # tag; quotes w/o <>
    )*+\Z""",
    re.VERBOSE | re.DOTALL,
)
# markup spans to delete on the fast path: comments first (their bodies
# may contain angle brackets), then tags/declarations — which, after
# the precheck, contain no angle brackets at all
_MARKUP_SPAN = re.compile(r"<!--.*?-->|<[^<>]*>", re.DOTALL)
_CDATA_ELEM = re.compile(r"<(?:script|style)", re.IGNORECASE)


def html_to_text(raw: str) -> str:
    """Extract the concatenated text nodes of ``raw`` HTML."""
    if _SIMPLE_HTML.match(raw) and not _CDATA_ELEM.search(raw):
        if "&" in raw:
            # HTMLParser unescapes each data run independently; an
            # entity can never span markup, so unescape per part
            from html import unescape

            return "".join(unescape(p) for p in _MARKUP_SPAN.split(raw))
        return _MARKUP_SPAN.sub("", raw)
    parser = _TextExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:  # malformed input: fall back to a tag-strip regex
        return re.sub(r"<[^>]*>", "", raw)
    return parser.text()


def clean_text(
    raw: str,
    remove_html: bool = True,
    clean_dots: bool = True,
    clean_quotes: bool = True,
    clean_whitespace: bool = True,
) -> str:
    """The reference's clean kernel, flag-for-flag.

    >>> clean_text('“Please clean this piece… of text</b>„')
    '"Please clean this piece... of text"'
    >>> clean_text('Sample text! <!DOCTYPE>')
    'Sample text!'
    >>> clean_text('a   b', remove_html=False, clean_whitespace=False)
    'a   b'
    """
    text = raw
    if remove_html:
        text = html_to_text(text)
    if clean_dots:
        text = _RE_DOTS.sub("...", text)
    if clean_quotes:
        text = _RE_SINGLE_QUOTES.sub("'", text)
        text = _RE_DOUBLE_QUOTES.sub('"', text)
    if clean_whitespace:
        text = _RE_WHITESPACE.sub(" ", text).strip()
    return text


def normalize_texts(texts: list[str]) -> list[str]:
    """Batched dots→quotes→whitespace normalisation, identical bytes to
    per-doc :func:`clean_text` (``remove_html=False``).

    The four passes run once over a NUL-joined concatenation instead of
    4×n_docs times: no pattern can match across ``\\0`` (the quote/dots
    classes are single codepoints, the two-char double-quote alternates
    ``''``/``,,`` cannot straddle ``x\\0y``, and python-``re`` ``\\s``
    does not match NUL), so splitting back yields exactly the per-doc
    results.  The trailing per-part ``strip()`` matches the reference's
    (after ``\\s+``→' ' collapse the only whitespace left is ' ').
    Inputs containing NUL (never produced by html_to_text on real pages,
    but possible) take the per-doc path.
    """
    if not texts:
        return []
    if any("\0" in t for t in texts):
        return [clean_text(t, remove_html=False) for t in texts]
    joined = "\0".join(texts)
    # dots / quotes via C-speed str.replace, guarded by `in` prescans.
    # Sequential replaces ≡ the one-scan regex alternation: all four
    # literals are over disjoint characters (so no overlap is possible)
    # and every replacement INSERTS a char, so collapsing '' / ,, can
    # never bring a new adjacent pair together (fuzz-verified against
    # the per-doc kernel in tests/test_clean.py).
    if "…" in joined:
        joined = joined.replace("…", "...")
    for ch in "`‘’‛⸂⸃⸌⸍⸜⸝":
        if ch in joined:
            joined = joined.replace(ch, "'")
    for lit in ("„", "“", "''", ",,"):
        if lit in joined:
            joined = joined.replace(lit, '"')
    # \s+ collapse: str.split() splits on exactly the chars python-re
    # \s matches (both are Py_UNICODE_ISSPACE), \0 is not one of them,
    # and the final per-part strip supplies the reference's .strip()
    # (post-collapse the only whitespace left is ' ').
    joined = " ".join(joined.split())
    return [p.strip() for p in joined.split("\0")]


# Block-level elements whose boundaries delimit paragraphs.  The
# reference's ``get_text()`` (doc.py:206) concatenates text nodes with
# no separators — correct for the byte-identity north rule but it
# destroys the line structure C4-style paragraph filtering needs, so
# this is a separate extraction mode, not a change to `html_to_text`.
_BLOCK_TAGS = frozenset(
    "p div br li h1 h2 h3 h4 h5 h6 tr table ul ol blockquote pre "
    "section article header footer title".split()
)


class _ParagraphExtractor(HTMLParser):
    """Collects text nodes grouped into paragraphs at block-element
    boundaries (both open and close of any ``_BLOCK_TAGS`` member start
    a new group).  Inline markup (<a>, <b>, <i>, <span>...) does not
    break a paragraph."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []
        self._paras: list[str] = []

    def _flush(self) -> None:
        if self._parts:
            self._paras.append("".join(self._parts))
            self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        self._parts.append(data)

    def paragraphs(self) -> list[str]:
        self._flush()
        return self._paras


def html_to_paragraphs(raw: str) -> list[str]:
    """Extract text grouped into paragraphs at block-tag boundaries,
    each paragraph normalised with the reference's dots/quotes/
    whitespace passes; whitespace-only paragraphs are dropped.

    >>> html_to_paragraphs('<p>One two.</p><p>Three <b>four</b>!</p>')
    ['One two.', 'Three four!']
    >>> html_to_paragraphs('A line<br/>another… line')
    ['A line', 'another... line']
    """
    parser = _ParagraphExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:  # malformed input: single tag-stripped paragraph
        return [p for p in (clean_text(raw),) if p]
    paras = normalize_texts(parser.paragraphs())
    return [p for p in paras if p]


def html_paragraphs_flat(htmls) -> tuple[list[str], list[int]]:
    """Flatten :func:`html_to_paragraphs` over a batch of html values
    (bytes decode utf8/replace — the one decoding rule every
    paragraph-level operator shares): returns ``(paragraphs,
    offsets)`` with ``offsets[i]:offsets[i+1]`` spanning document i's
    paragraphs."""
    paras: list[str] = []
    offsets = [0]
    for h in htmls:
        if isinstance(h, bytes):
            h = h.decode("utf8", "replace")
        paras.extend(html_to_paragraphs(h))
        offsets.append(len(paras))
    return paras, offsets


def resolve_lang(lang: str, is_reliable: bool, hint_lang: str) -> str:
    """The reference's language-resolution rule, applied at every
    model-dispatch site (doc.py:146,242,533,587,615,801)."""
    return lang if is_reliable else hint_lang
