"""Reference-parity goldens for Entities through the pluggable-model
registry path.

The reference's own suite asserts exact entity sets from its default
spaCy models (/root/reference/tests/test_doc.py:83-101): Google→ORG and
Philips→ORG on the en/nl wiki fixtures, and on the Dutch Zuckerberg
sentence Facebook→GPE + Mark Zuckerberg→PERSON with end_char
projections (15, 'Mark Zuckerberg') / (51, 'Facebook').  The committed
``models/custom/spacy_parity_gazetteer.json`` reproduces those sets
when registered via ``Pipeline(models=[(name, lang, path)])`` — the
drop-in-real-model loop the registry machinery exists for.
"""

MODEL = ("spacy_parity", "*", "/root/repo/models/custom/spacy_parity_gazetteer.json")

# this engine's fixtures: same entity mentions (and, for the Dutch
# sentence, the same byte layout — the end_char golden depends on it,
# reference test_doc.py:85-86) as the reference's TEXT_1/TEXT_2/TEXT_5
TEXT_EN = (
    "Text mining derives structured information from raw text. "
    "Google is a company named Google."
)
TEXT_NL = "Textmining haalt informatie uit tekst. Philips is een bedrijf genaamd Philips."
TEXT_ZUCK = "Mark Zuckerberg is sinds de oprichting van Facebook de directeur van het bedrijf."
TEXT_EMPTY = ""


def _ents(text, **kwargs):
    from textpipe_ray.functions.entities import find_ents
    from textpipe_ray.functions.registry import ModelRegistry

    gaz = ModelRegistry([MODEL]).get("spacy_parity", "gazetteer")
    return find_ents(text, None, kwargs.get("ent_attributes", ("text", "label_")), gazetteer=gaz)


def test_entities_parity_text_and_label():
    # reference test_doc.py:99-101 (dedup included: Google appears twice)
    assert _ents(TEXT_EN) == sorted([("Google", "ORG")])
    assert _ents(TEXT_NL) == sorted([("Philips", "ORG")])
    assert _ents(TEXT_EMPTY) == []


def test_entities_parity_zuckerberg_set():
    # reference test_doc.py:83-84
    assert _ents(TEXT_ZUCK) == sorted([("Facebook", "GPE"), ("Mark Zuckerberg", "PERSON")])


def test_entities_parity_end_char_projection():
    # reference test_doc.py:85-86
    assert _ents(TEXT_ZUCK, ent_attributes=("end_char", "text")) == sorted(
        [(15, "Mark Zuckerberg"), (51, "Facebook")]
    )


def test_entities_parity_via_pipeline_registry():
    """The same goldens through the full Pipeline-spec path (model file
    registered per the reference pipeline.py:54-60 mechanism; op output
    stringifies attrs)."""
    from textpipe_ray.pipelines.spec import Pipeline

    p = Pipeline([("Entities", {"model_name": "spacy_parity"})], models=[MODEL])
    assert p(TEXT_ZUCK)["Entities"] == [
        ["Facebook", "GPE"],
        ["Mark Zuckerberg", "PERSON"],
    ]
    assert p(TEXT_EN)["Entities"] == [["Google", "ORG"]]
    assert p(TEXT_EMPTY)["Entities"] == []
