"""Language-ID contract tests (output contract of the reference's
detect_language, doc.py:103-134) + perplexity separation tests."""

from textpipe_ray.functions.langid import LangIdModel, strip_mc_categories
from textpipe_ray.functions.perplexity import PerplexityModel

MODEL = LangIdModel.load()
PPL = PerplexityModel.load()


def test_un_contract():
    # (False, 'un') for empty / punctuation / digits (doc.py:121-122,131-132)
    for text in ["", "...", "12 34 56", "!!! ???"]:
        ok, lang, _ = MODEL.detect(text)
        assert (ok, lang) == (False, "un"), text


def test_languages():
    cases = {
        "en": "The history of science shows that simple models are often the most useful ones.",
        "nl": "De geschiedenis van de wetenschap laat zien dat eenvoudige modellen vaak nuttig zijn.",
        "fr": "L'histoire des sciences montre que les modèles simples sont souvent les plus utiles.",
        "es": "La historia de la ciencia muestra que los modelos simples suelen ser los más útiles.",
        "de": "Die Geschichte der Wissenschaft zeigt, dass einfache Modelle oft die nützlichsten sind.",
        "zh": "科学的历史表明简单的模型往往是最有用的。",
    }
    for expect, text in cases.items():
        ok, lang, _ = MODEL.detect(text)
        assert ok and lang == expect, (expect, lang, ok)


def test_hint_bias():
    # ambiguous short text resolves to the hint (cld2 hintLanguage behavior)
    assert MODEL.detect("Test", "nl")[1] == "nl"
    assert MODEL.detect("Test", "en")[1] == "en"


def test_unknown_script_and_gibberish():
    assert MODEL.detect("မြန်မာဘာသာစကား")[:2] == (False, "un")
    assert MODEL.detect("xqzt vplk wjfh qqq")[:2] == (False, "un")


def test_mc_strip():
    # control/format chars are stripped before detection (doc.py:125-126)
    assert strip_mc_categories("a\x03b‍c") == "abc"
    ok, lang, _ = MODEL.detect("Hi \x03 this is filler text \xa325 more filler.\x03", "en")
    assert lang == "en"


def test_perplexity_separation():
    nat = PPL.perplexity("The history of science shows that simple models are useful.", "en")
    gib = PPL.perplexity("xq ztvp lkwj fhqq zzxj kkqv wwpt", "en")
    assert nat < gib
    assert PPL.perplexity("", "en") > 1000  # empty = maximally surprising
    # unknown language falls back to en tables without raising
    assert PPL.perplexity("some text", "xx") > 0


def test_perplexity_many_matches_per_doc():
    """Batched scoring must reproduce per-doc scoring bit-for-bit."""
    import numpy as np

    from textpipe_ray.functions.perplexity import PerplexityModel

    m = PerplexityModel.load()
    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "",
        "x",
        "Le renard brun rapide saute par-dessus le chien paresseux près de la rivière.",
        "a b",
        "Der schnelle braune Fuchs springt über den faulen Hund im Wald.",
    ]
    langs = ["en", "en", "en", "fr", "de", "de"]
    got = m.perplexity_many(texts, langs)
    want = np.array([m.perplexity(t, l) for t, l in zip(texts, langs)])
    # identical arithmetic per position; only the summation grouping
    # differs (reduceat vs pairwise sum) → agreement to ~1 ulp
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


def test_lone_surrogate_robustness():
    """JSON sources can deliver lone surrogates; scoring must not raise
    (old per-char path tolerated them — category Cs chars are stripped)."""
    import json

    from textpipe_ray.functions.langid import LangIdModel
    from textpipe_ray.functions.perplexity import PerplexityModel

    bad = json.loads('"The quick brown fox \\ud800 jumps over the lazy dog."')
    ok, lang, margin = LangIdModel.load().detect(bad, "en")
    assert lang == "en"
    p = PerplexityModel.load().perplexity(bad, "en")
    assert p > 0
    many = PerplexityModel.load().perplexity_many([bad, "hello world"], ["en", "en"])
    assert len(many) == 2


def test_detect_many_matches_per_doc():
    """Batched langid must reproduce per-doc detect(): identical lang /
    reliable decisions and margins to ~1 ulp (only summation grouping
    differs: reduceat vs pairwise sum)."""
    import json

    import numpy as np

    from textpipe_ray.functions.langid import LangIdModel

    m = LangIdModel.load()
    texts = [
        "The quick brown fox jumps over the lazy dog and keeps on running through the field.",
        "",
        "x",
        "Le renard brun rapide saute par-dessus le chien paresseux près de la rivière.",
        "1234 5678 !!!",
        "Der schnelle braune Fuchs springt über den faulen Hund im tiefen dunklen Wald.",
        json.loads('"lone surrogate \\ud800 in the middle of english text about dogs"'),
        "ab",
        "́̂",  # marks only → stripped → no letters
    ]
    hints = ["en", "en", "nl", "fr", "en", "de", "en", "nl", "en"]
    rel_b, lang_b, mar_b = m.detect_many(texts, hints)
    for i, (t, h) in enumerate(zip(texts, hints)):
        ok, lang, margin = m.detect(t or "", h)
        assert lang_b[i] == lang, (i, t)
        assert bool(rel_b[i]) == ok, (i, t)
        np.testing.assert_allclose(mar_b[i], margin, rtol=1e-9, atol=1e-12)
