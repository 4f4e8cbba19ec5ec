"""Trained Entities/Categories stand-ins: NB textcat fit parity, NER
span tagger generalisation, and the model-file registry seam
(reference operation.py:203-224,430-448)."""

import json

import numpy as np
import pytest


def test_span_corpus_halves_are_disjoint():
    from textpipe_ray.functions.ner_tagger import make_span_corpus

    train = {sp for sp, _, _, _ in make_span_corpus(held_out=False)}
    held = {sp for sp, _, _, _ in make_span_corpus(held_out=True)}
    assert train and held and not (train & held)


def test_span_features_deterministic_and_shaped():
    from textpipe_ray.functions.ner_tagger import NER_DIM, span_features

    a = span_features("Acme Corp", "with", "closed")
    b = span_features("Acme Corp", "with", "closed")
    assert a.shape == (NER_DIM,) and (a == b).all()
    assert (a >= 0).all() and a.sum() > 0


def test_nb_fit_matches_naive_reference():
    """nb_fit on aggregated counts must equal a from-scratch NB over
    the same docs (counts reduced locally vs 'distributed' is a no-op)."""
    from collections import Counter

    from textpipe_ray.functions.textcat_nb import TOKEN_RE, NBTextcatModel, nb_fit

    docs = [
        ("spam", "buy cheap pills now buy now"),
        ("spam", "cheap offer buy pills"),
        ("ham", "meeting notes for the quarterly review"),
        ("ham", "please review the meeting agenda"),
    ]
    pair_counts: dict = {}
    label_docs: dict = {}
    vocab = set()
    for lb, txt in docs:
        label_docs[lb] = label_docs.get(lb, 0) + 1
        for t, n in Counter(TOKEN_RE.findall(txt)).items():
            pair_counts[(lb, t)] = pair_counts.get((lb, t), 0) + n
            vocab.add(t)
    model = NBTextcatModel(nb_fit(pair_counts, label_docs, sorted(vocab)))

    # independent reference: explicit Laplace-smoothed posteriors
    import math

    def ref_predict(text):
        toks = [t for t in TOKEN_RE.findall(text.lower()) if t in vocab]
        out = {}
        for lb in label_docs:
            tot = sum(
                pair_counts.get((lb, t), 0) for t in vocab
            ) + len(vocab)
            z = math.log(label_docs[lb] / len(docs))
            for t in toks:
                z += math.log((pair_counts.get((lb, t), 0) + 1) / tot)
            out[lb] = z
        m = max(out.values())
        e = {k: math.exp(v - m) for k, v in out.items()}
        s = sum(e.values())
        return {k: v / s for k, v in e.items()}

    for probe in ("cheap pills", "quarterly meeting review", "buy agenda"):
        got = model.predict(probe)
        want = ref_predict(probe)
        assert set(got) == set(want)
        for k in got:
            assert got[k] == pytest.approx(want[k], rel=1e-9), (probe, k)
    assert model.predict("cheap pills")["spam"] > 0.9
    assert model.predict("quarterly meeting review")["ham"] > 0.9


def _train_tiny_tagger():
    """Single-process IRLS on the seed span corpus — the same feature
    space the distributed query trains in."""
    from textpipe_ray.functions.ner_tagger import (
        NER_DIM,
        NER_LABELS,
        NerTaggerModel,
        make_span_corpus,
        span_features,
    )

    rows = make_span_corpus(held_out=False)
    X = np.stack([span_features(sp, pv, nx) for sp, pv, nx, _ in rows])
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = np.hstack([np.ones((len(X), 1)), (X - mu) / sd])
    weights = {}
    for lb in NER_LABELS:
        y = np.array([1.0 if lab == lb else 0.0 for _, _, _, lab in rows])
        beta = np.zeros(Z.shape[1])
        for _ in range(6):
            p = 1.0 / (1.0 + np.exp(-Z @ beta))
            g = Z.T @ (p - y) / len(y)
            W = p * (1 - p)
            H = (Z * W[:, None]).T @ Z / len(y)
            beta = beta - np.linalg.solve(H + 1e-3 * np.eye(len(beta)), g + 1e-3 * beta)
        weights[lb] = list(beta)
    return NerTaggerModel(
        {
            "labels": NER_LABELS,
            "weights": weights,
            "mu": list(mu),
            "sd": list(sd),
        }
    )


def test_tagger_generalises_to_held_out_names():
    from textpipe_ray.functions.ner_tagger import make_span_corpus

    model = _train_tiny_tagger()
    held = make_span_corpus(held_out=True)
    ok = sum(
        1 for sp, pv, nx, lab in held if model.classify(sp, pv, nx) == lab
    )
    assert ok / len(held) >= 0.9, f"{ok}/{len(held)}"


def test_tagger_tags_full_sentences_with_offsets():
    model = _train_tiny_tagger()
    text = "Officials from Estonia met Tessa Bauer in the morning."
    tags = model.tag(text)
    assert ("Estonia", "GPE", 15, 22) in tags
    by_text = {t[0]: t[1] for t in tags}
    assert by_text.get("Tessa Bauer") == "PERSON"
    # find_ents projection contract matches the gazetteer path
    ents = model.find_ents(text, ("end_char", "text"))
    assert (22, "Estonia") in ents


def test_registry_loads_trained_model_files(tmp_path):
    from textpipe_ray.functions.registry import ModelRegistry
    from textpipe_ray.functions.textcat_nb import nb_fit

    nb = nb_fit({("a", "x"): 3, ("b", "y"): 2}, {"a": 1, "b": 1}, ["x", "y"])
    p1 = tmp_path / "nb.json"
    p1.write_text(json.dumps(nb))
    model = _train_tiny_tagger()
    ner_obj = {
        "type": "ner_tagger",
        "labels": model.labels,
        "weights": {lb: list(model.weights[i]) for i, lb in enumerate(model.labels)},
        "mu": list(model.mu),
        "sd": list(model.sd),
    }
    p2 = tmp_path / "ner.json"
    p2.write_text(json.dumps(ner_obj))

    reg = ModelRegistry([("nb", "*", str(p1)), ("ner", "*", str(p2))])
    assert reg.kind("nb") == "textcat"  # interchangeable with term-list textcat
    assert reg.kind("ner") == "ner"
    assert set(reg.get("nb", "textcat").predict("x")) == {"a", "b"}
    assert reg.get("ner", "ner").tag("Prices in Estonia rose again.")


def test_op_entities_uses_registered_tagger(tmp_path):
    import pyarrow as pa

    from textpipe_ray.functions.registry import ModelRegistry
    from textpipe_ray.stages.ops import op_entities

    model = _train_tiny_tagger()
    obj = {
        "type": "ner_tagger",
        "labels": model.labels,
        "weights": {lb: list(model.weights[i]) for i, lb in enumerate(model.labels)},
        "mu": list(model.mu),
        "sd": list(model.sd),
    }
    p = tmp_path / "ner.json"
    p.write_text(json.dumps(obj))
    reg = ModelRegistry([("nertag", "*", str(p))])
    batch = pa.table({"text": ["Officials from Estonia attended the summit."]})
    out = op_entities(
        batch,
        "Entities",
        {"model_name": "nertag", "__registry": reg},
        "en",
    )
    ents = out.column("Entities").to_pylist()[0]
    assert ["Estonia", "GPE"] in ents
