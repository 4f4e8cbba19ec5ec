"""Declarative pipeline spec — the reference ``Pipeline`` re-expressed.

Contract parity with /root/reference/textpipe/pipeline.py:
* steps are ``'Name'`` or ``('Name', kwargs)`` (pipeline.py:39-47);
* unknown step name raises ``AttributeError`` at construction
  (pipeline.py:49, test_pipeline.py:147-163);
* ``save``/``load``/``from_dict`` round-trip the public attrs as JSON —
  models are never serialized, a rebuilt pipeline reloads them
  (pipeline.py:91-147);
* ``register_operation(name, fn)`` adds a custom step; the custom fn
  sees all previously-computed columns, the dataflow version of the
  reference's accumulated ``context`` dict (pipeline.py:77-89).

Execution is one ``map_batches`` applying the steps in order to each
Arrow batch — one fused stage, no per-step materialisation.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

from textpipe_ray.stages.ops import OPERATIONS


class Pipeline:
    def __init__(self, steps, language=None, hint_language="en", models=None, **kwargs):
        """``models=[(name, lang, path)]`` registers custom model files
        (reference pipeline.py:54-60): an op whose settings carry
        ``model_name`` resolves it through the registry; vector ops pick
        up a registered keyed-vectors model for their language.  Specs
        are JSON-serializable and round-trip through save/load; files
        load lazily once per worker process."""
        self.steps: list[tuple[str, dict]] = []
        for step in steps:
            if isinstance(step, str):
                self.steps.append((step, {}))
            else:
                name, settings = step
                self.steps.append((name, dict(settings or {})))
        self.language = language
        self.hint_language = hint_language
        self.models = [tuple(m) for m in (models or [])]
        self._registry = None
        if self.models:
            from textpipe_ray.functions.registry import ModelRegistry

            self._registry = ModelRegistry(self.models)
        self.kwargs = kwargs
        self._custom: dict = {}
        for name, _ in self.steps:
            if name not in OPERATIONS:
                raise AttributeError(f"module 'textpipe_ray.stages.ops' has no operation {name!r}")

    # -- extension point (≈ pipeline.py:81-89) ------------------------------
    def register_operation(self, op_name: str, target_fn) -> None:
        """``target_fn(batch: pa.Table, name, settings, hint) → pa.Table``;
        it may read any column produced by earlier steps (context)."""
        self._custom[op_name] = target_fn
        self.steps.append((op_name, {}))

    # -- execution ----------------------------------------------------------
    def _apply(self, batch: pa.Table) -> pa.Table:
        hint = self.language or self.hint_language
        if "__clean" not in batch.column_names:
            # compute the clean kernel ONCE for the whole step chain —
            # the dataflow analog of the Doc's clean_text lru_cache
            # (doc.py:193): without this every op lacking an upstream
            # CleanText column re-parses the HTML per step
            from textpipe_ray.stages.ops import ensure_clean_column

            batch = ensure_clean_column(batch)
        for name, settings in self.steps:
            fn = self._custom.get(name) or OPERATIONS[name]
            if self._registry is not None:
                settings = {**settings, "__registry": self._registry}
            batch = fn(batch, name, settings, hint)
        return batch.drop_columns(
            [c for c in ("__clean",) if c in batch.column_names]
        )

    def transform(self, ds, batch_size: int = 256):
        """Dataset → Dataset with one appended column per step."""
        return ds.map_batches(self._apply, batch_format="pyarrow", batch_size=batch_size)

    def __call__(self, raw: str) -> dict:
        """Single-document convenience path (the reference's
        ``pipe(raw)`` → dict contract, pipeline.py:62-79)."""
        batch = pa.table({"raw": pa.array([raw], pa.string())})
        out = self._apply(batch)
        return {name: out.column(name)[0].as_py() for name, _ in self.steps}

    # -- config round-trip (≈ pipeline.py:91-147) ---------------------------
    def to_dict(self) -> dict:
        return {
            "steps": [[n, s] for n, s in self.steps if n not in self._custom],
            "language": self.language,
            "hint_language": self.hint_language,
            "models": [list(m) for m in self.models],
            "kwargs": self.kwargs,
        }

    def save(self, filename: str | Path) -> None:
        with open(filename, "w", encoding="utf8") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "Pipeline":
        return cls(
            steps=[tuple(s) if isinstance(s, list) else s for s in d["steps"]],
            language=d.get("language"),
            hint_language=d.get("hint_language", "en"),
            models=d.get("models"),
            **d.get("kwargs", {}),
        )

    @classmethod
    def load(cls, filename: str | Path) -> "Pipeline":
        with open(filename, "r", encoding="utf8") as f:
            return cls.from_dict(json.load(f))
