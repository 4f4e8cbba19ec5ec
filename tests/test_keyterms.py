"""Per-ranker keyterm contracts: real YAKE (Campos et al. 2020) vs the
textrank default; stand-in warning for sgrank/scake; reference error
shape (/root/reference/textpipe/doc.py:405-439)."""

import warnings

import pytest

from textpipe_ray.functions.keyterms import RANKERS, extract_keyterms

DOC = (
    "Amsterdam is the awesome capital of the Netherlands. "
    "The capital hosts the national museum. "
    "Machine learning systems process text data. "
    "Text data pipelines need deduplication and machine learning quality filters. "
    "YAKE extracts keywords using statistical features. "
    "Statistical features include casing and position."
)


def test_yake_scores_ascending_lower_is_better():
    out = extract_keyterms(DOC, "en", "yake", 8)
    assert out, "non-empty doc must yield terms"
    scores = [s for _, s in out]
    assert scores == sorted(scores)
    assert all(s > 0 for s in scores)


def test_yake_differs_from_textrank():
    y = extract_keyterms(DOC, "en", "yake", 6)
    t = extract_keyterms(DOC, "en", "textrank", 6)
    assert [k for k, _ in y] != [k for k, _ in t]
    # both find multiword terms
    assert any(" " in k for k, _ in y)
    assert any(" " in k for k, _ in t)


def test_yake_casing_feature_boosts_acronyms():
    """TCase: an all-caps acronym outranks an equally frequent
    all-lowercase word of the same positions."""
    doc = (
        "The NASA mission studied rocks. The varied mission found NASA "
        "telemetry. Engineers sent varied data through NASA relays while "
        "varied sensors logged readings."
    )
    out = dict(extract_keyterms(doc, "en", "yake", 20))
    assert out["nasa"] < out["varied"]  # lower = better


def test_yake_no_stopword_edges():
    out = extract_keyterms(DOC, "en", "yake", 20)
    from textpipe_ray.data.seed_corpora import STOPWORDS

    stop = set(STOPWORDS["en"])
    for term, _ in out:
        words = term.split(" ")
        assert words[0] not in stop and words[-1] not in stop


def test_yake_dedups_near_identical_surface_forms():
    doc = "quality filters matter. " * 3 + "quality filter runs daily. " * 3
    terms = [k for k, _ in extract_keyterms(doc, "en", "yake", 10)]
    assert not (
        "quality filters" in terms and "quality filter" in terms
    ), terms


def test_empty_and_stopword_only_docs():
    for ranker in ("textrank", "yake"):
        assert extract_keyterms("", "en", ranker) == []
        assert extract_keyterms("the of and", "en", ranker) == []


def test_standin_rankers_warn_once():
    import textpipe_ray.functions.keyterms as kt

    kt._STANDIN_WARNED.discard("scake")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        extract_keyterms(DOC, "en", "scake", 3)
        extract_keyterms(DOC, "en", "scake", 3)
    msgs = [x for x in w if "stand-in" in str(x.message)]
    assert len(msgs) == 1


def test_unknown_ranker_error_shape():
    with pytest.raises(ValueError, match="not available"):
        extract_keyterms(DOC, "en", "nope")
    assert set(RANKERS) == {"textrank", "sgrank", "scake", "yake"}


def test_yake_deterministic():
    assert extract_keyterms(DOC, "en", "yake", 10) == extract_keyterms(
        DOC, "en", "yake", 10
    )


def test_sgrank_real_algorithm_properties():
    """SGRank (Danesh et al. 2015): stopword-free candidates, scores
    descending, multiword phrases surface, deterministic."""
    out = extract_keyterms(DOC, "en", "sgrank", 8)
    assert out
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    from textpipe_ray.data.seed_corpora import STOPWORDS

    stop = set(STOPWORDS["en"])
    for term, _ in out:
        assert all(w not in stop and len(w) >= 3 for w in term.split())
    assert any(" " in t for t, _ in out)
    assert out == extract_keyterms(DOC, "en", "sgrank", 8)
    # differs from both other real rankers
    assert [t for t, _ in out] != [t for t, _ in extract_keyterms(DOC, "en", "textrank", 8)]
    assert [t for t, _ in out] != [t for t, _ in extract_keyterms(DOC, "en", "yake", 8)]


def test_sgrank_reference_doctest_shape():
    """On the reference's own doctest sentence (operation.py:259-262)
    the multiword term 'awesome capital' must lead, as textacy's
    sgrank does there."""
    out = extract_keyterms(
        "Amsterdam is the awesome capital of the Netherlands.", "en", "sgrank", 3
    )
    assert out[0][0] == "awesome capital"


def test_sgrank_empty_docs():
    assert extract_keyterms("", "en", "sgrank") == []
    assert extract_keyterms("the of and", "en", "sgrank") == []


# ---- property tests: rankers must never crash and must honor their
# ordering contracts on arbitrary unicode input ----

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st


@hsettings(max_examples=60, deadline=None)
@given(st.text(max_size=400), st.sampled_from(["textrank", "sgrank", "yake"]))
def test_rankers_total_on_arbitrary_text(text, ranker):
    out = extract_keyterms(text, "en", ranker, 5)
    assert isinstance(out, list) and len(out) <= 5
    for term, score in out:
        assert isinstance(term, str) and term
        assert isinstance(score, float)
    scores = [s for _, s in out]
    if ranker == "yake":
        assert scores == sorted(scores)  # ascending, lower = better
    else:
        assert scores == sorted(scores, reverse=True)


@hsettings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            "data pipeline quality filter machine learning the of and".split()
        ),
        min_size=0,
        max_size=60,
    )
)
def test_rankers_deterministic_on_generated_docs(words_):
    doc = " ".join(words_) + "."
    for ranker in ("textrank", "sgrank", "yake"):
        assert extract_keyterms(doc, "en", ranker, 5) == extract_keyterms(
            doc, "en", ranker, 5
        )
