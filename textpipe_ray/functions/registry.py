"""Pluggable model registry — the reference's custom-model mechanism
(``Pipeline(models=[(name, lang, path)])``, pipeline.py:54-60,
exercised by test_pipeline.py:28-43) re-expressed for Ray actor pools.

A model SPEC is JSON-serializable ``(name, lang, path)`` — it travels
in the pipeline config and in task closures; the model FILE loads
lazily ONCE PER PROCESS (i.e. once per actor / map task worker) on
first use and is cached, so batch work never re-reads the file.  Model
files are JSON with a ``type`` discriminator:

* ``{"type": "gazetteer", "entities": {text: label}}`` → Entities
  (swaps the built-in demo gazetteer; the NER-model seam,
  doc.py:220-244).
* ``{"type": "textcat", "labels": {label: [term, ...]}}`` → Categories
  (term-hit scoring; the custom-textcat seam, doc.py:783-802 — the
  default no-label textcat keeps returning ``{}``).
* ``{"type": "keyed_vectors", "dim": D, "vectors": {word: [f, ...]},
  "counts": {word: n}}`` → WordVectors / DocumentVector /
  GensimDocumentEmbedding (the load-from-file KeyedVectors path,
  doc.py:604-639; words absent from ``vectors`` fall back to the
  deterministic hash vector and stay OOV, like spaCy sm-model context
  tensors).

Unknown ``model_name`` at use time raises ``MissingModelException``,
matching the reference's ``TextpipeMissingModelException`` contract
(doc.py:229-233).

Vector tables too large for a node's RAM don't go through this file:
use ``state/vecstore.ShardedVectorStore`` (the reference's
Redis-KeyedVectors analog, wrappers.py:20-125 — hash-sharded actor
dict slices with batched per-shard lookups).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class MissingModelException(Exception):
    pass


class TextcatModel:
    """Deterministic term-hit text categorizer: score per label =
    label-term hits / total hits across labels (0.0 for hitless labels,
    every registered label present in the output — the reference
    textcat's all-labels dict shape, doc.py:795-800)."""

    def __init__(self, labels: dict[str, list[str]]):
        import re

        self.labels = {k: sorted(set(w.lower() for w in v)) for k, v in sorted(labels.items())}
        self._res = {
            k: re.compile(r"\b(?:" + "|".join(re.escape(w) for w in ws) + r")\b")
            for k, ws in self.labels.items()
            if ws
        }

    def predict(self, text: str) -> dict[str, float]:
        low = (text or "").lower()
        hits = {k: len(r.findall(low)) for k, r in self._res.items()}
        total = sum(hits.values())
        return {
            k: (hits.get(k, 0) / total if total else 0.0) for k in self.labels
        }


class FileVectorModel:
    """KeyedVectors-from-file: same interface as ``HashVectorModel``
    (``__contains__`` / ``vector`` / ``count`` / ``nr_train_tokens``),
    vectors read from the model file; unknown words fall back to the
    deterministic hash vector (still OOV)."""

    def __init__(self, obj: dict):
        from textpipe_ray.functions.vectors import _hash_vector

        self.dim = int(obj["dim"])
        self._vectors = {
            w: np.asarray(v, dtype=np.float64) for w, v in obj.get("vectors", {}).items()
        }
        self.counts = {w: int(c) for w, c in obj.get("counts", {}).items()}
        if not self.counts:  # every known word counted once by default
            self.counts = {w: 1 for w in self._vectors}
        self.nr_train_tokens = sum(self.counts.values())
        self._fallback = _hash_vector

    def __contains__(self, word: str) -> bool:
        return word in self._vectors

    def vector(self, word: str) -> np.ndarray:
        v = self._vectors.get(word)
        return v if v is not None else self._fallback(word, self.dim)

    def count(self, word: str) -> int:
        return self.counts.get(word, 0)


def load_model_file(path: str | Path):
    with open(path, "r", encoding="utf8") as f:
        obj = json.load(f)
    kind = obj.get("type")
    if kind == "gazetteer":
        return kind, dict(obj["entities"])
    if kind == "textcat":
        return kind, TextcatModel(obj["labels"])
    if kind == "textcat_nb":
        # trained NB categorizer, same predict() contract → same kind,
        # so Categories pipelines take either file interchangeably
        from textpipe_ray.functions.textcat_nb import NBTextcatModel

        return "textcat", NBTextcatModel(obj)
    if kind == "ner_tagger":
        from textpipe_ray.functions.ner_tagger import NerTaggerModel

        return "ner", NerTaggerModel(obj)
    if kind == "keyed_vectors":
        return kind, FileVectorModel(obj)
    raise ValueError(f"unknown model file type {kind!r} in {path}")


class ModelRegistry:
    """Name- and (kind, lang)-addressable loaded-model cache."""

    def __init__(self, specs: list):
        # specs: [(name, lang, path)] — JSON round-trip gives lists
        self.specs = [tuple(s) for s in specs]
        self._by_name = {name: (lang, str(path)) for name, lang, path in self.specs}
        self._loaded: dict[str, tuple[str, object]] = {}

    def to_specs(self) -> list:
        return [list(s) for s in self.specs]

    def _load(self, name: str):
        if name not in self._loaded:
            if name not in self._by_name:
                raise MissingModelException(f"Custom model {name} is missing.")
            _, path = self._by_name[name]
            self._loaded[name] = load_model_file(path)
        return self._loaded[name]

    def get(self, name: str, expect_kind: str | None = None):
        kind, model = self._load(name)
        if expect_kind is not None and kind != expect_kind:
            raise MissingModelException(
                f"Custom model {name} is a {kind!r} model, not {expect_kind!r}."
            )
        return model

    def kind(self, name: str) -> str:
        return self._load(name)[0]

    def for_lang(self, kind: str, lang: str):
        """First registered model of ``kind`` whose lang matches (or is
        '*'), loaded; None when nothing is registered — callers fall
        back to their built-in default."""
        for name, mlang, _ in self.specs:
            if mlang in (lang, "*"):
                k, model = self._load(name)
                if k == kind:
                    return model
        return None
