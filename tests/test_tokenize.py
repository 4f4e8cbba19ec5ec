"""Tokenizer / sentencizer / readability golden tests (engine contract;
reference shapes from doc.py:282-372)."""

from textpipe_ray.functions.tokenize import (
    extract_lead,
    flesch_reading_ease,
    nsents,
    nwords,
    sents,
    word_counts,
    words,
)


def test_words_offsets():
    # reference doctest shape (doc.py:328-334)
    assert words("Test sentence for testing text.") == [
        ("Test", 0),
        ("sentence", 5),
        ("for", 14),
        ("testing", 18),
        ("text", 26),
        (".", 30),
    ]
    assert words("") == []


def test_nwords():
    assert nwords("Test sentence for testing text") == 5
    assert nwords("") == 0


def test_sents_offsets():
    assert sents("Test sentence for testing text. And another one! And stuff.") == [
        ("Test sentence for testing text.", 0),
        ("And another one!", 32),
        ("And stuff.", 49),
    ]
    assert nsents("") == 0
    assert nsents("no terminal punctuation") == 1


def test_word_counts():
    # reference doctest (doc.py:341-351)
    assert word_counts("Test sentence for testing vectorisation of a sentence.") == {
        ".": 1,
        "Test": 1,
        "a": 1,
        "for": 1,
        "of": 1,
        "sentence": 2,
        "testing": 1,
        "vectorisation": 1,
    }


def test_flesch():
    # degenerate cases return 100 (reference doc.py:370-371)
    assert flesch_reading_ease("") == 100.0
    assert flesch_reading_ease("12345 678") == 100.0
    easy = flesch_reading_ease("The cat sat on the mat. The dog ran to the man.")
    hard = flesch_reading_ease(
        "Incomprehensibility characterizes multidimensional organizational heterogeneity."
    )
    assert easy > hard


def test_extract_lead():
    text = "One. Two! Three? Four."
    assert extract_lead(text, 3) == ["One.", "Two!", "Three?"]
    assert extract_lead("just one", 3) == ["just one"]
