"""Named-entity extraction (gazetteer stand-in).

The reference delegates NER to spaCy models with the contract
``find_ents(model_name, ent_attributes) → deduped [(attr...)]`` and
``TextpipeMissingModelException`` for unavailable custom models
(/root/reference/textpipe/doc.py:220-244, operation.py:203-224).  The
stand-in here is a longest-match gazetteer lookup, model-pluggable per
actor (pass a bigger ``gazetteer`` dict, or swap the whole function for
a real model in the stage's ``__init__``) without touching the Ray
plumbing.
"""

from __future__ import annotations

import re

GAZETTEER: dict[str, str] = {
    # entity text → label (language-independent demo table)
    "Google": "ORG",
    "Philips": "ORG",
    "Facebook": "ORG",
    "Microsoft": "ORG",
    "Amsterdam": "GPE",
    "Netherlands": "GPE",
    "Nederland": "GPE",
    "Europe": "GPE",
    "Mark Zuckerberg": "PERSON",
    "Alan Alexander Milne": "PERSON",
    "Mary Jane": "PERSON",
}

class MissingModelException(Exception):
    pass


def find_ents(
    text: str,
    model_name: str | None = None,
    ent_attributes: tuple[str, ...] = ("text", "label_"),
    gazetteer: dict[str, str] | None = None,
) -> list[tuple]:
    """Deduped entity tuples projected through ``ent_attributes``
    (supported: text, label_, start_char, end_char — reference
    test_pipeline.py uses (end_char, text))."""
    if model_name is not None:
        raise MissingModelException(f"Custom model {model_name} is missing.")
    gaz = gazetteer if gazetteer is not None else GAZETTEER
    found: set[tuple] = set()
    spans: list[tuple[int, int, str, str]] = []
    for ent, label in gaz.items():
        for m in re.finditer(re.escape(ent), text or ""):
            spans.append((m.start(), m.end(), m.group(), label))
    # longest-match wins on overlap
    spans.sort(key=lambda s: (s[0], -(s[1] - s[0])))
    chosen: list[tuple[int, int, str, str]] = []
    last_end = -1
    for s in spans:
        if s[0] >= last_end:
            chosen.append(s)
            last_end = s[1]
    attr_of = {
        "text": lambda s: s[2],
        "label_": lambda s: s[3],
        "start_char": lambda s: s[0],
        "end_char": lambda s: s[1],
    }
    for s in chosen:
        found.add(tuple(attr_of[a](s) for a in ent_attributes))
    return sorted(found)
