"""Stateful actor-pool stages (callable classes for ``map_batches``).

This is the Ray idiom that replaces all three of the reference's
model-cache patterns (``Pipeline._spacy_nlps``/``_gensim_vectors``
injection, pipeline.py:32-33,70-71, and the Redis vector side-channel,
wrappers.py:20-125): a model is loaded ONCE per actor in ``__init__``
and reused for every batch.  Use as::

    ds.map_batches(LangIdStage, batch_format="pyarrow",
                   batch_size=1024, concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import pyarrow as pa

from textpipe_ray import schema as S
from textpipe_ray.functions.langid import LangIdModel
from textpipe_ray.functions.perplexity import PerplexityModel


class LangIdStage:
    """Language identification: appends pred_lang / lang_reliable /
    lang_margin / resolved_lang (the doc.py:146 resolution rule)."""

    def __init__(self, hint_language: str = "en", model_path: str | None = None):
        self.model = LangIdModel.load(model_path) if model_path else LangIdModel.load()
        self.hint = hint_language

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        texts = batch.column(S.CLEAN).to_pylist()
        # per-row hint: a provided `lang` column acts as the hint when present
        hints = (
            batch.column(S.LANG).to_pylist()
            if S.LANG in batch.column_names
            else [self.hint] * len(texts)
        )
        hints = [h or self.hint for h in hints]
        # batched scorer: one searchsorted + reduceat pass for the whole
        # batch instead of a python call per document
        reliable, langs, margins = self.model.detect_many(texts, hints)
        resolved = np.where(reliable, langs, np.asarray(hints, dtype=object))
        return (
            batch.append_column(S.PRED_LANG, pa.array(langs.tolist(), pa.string()))
            .append_column(S.LANG_RELIABLE, pa.array(reliable.tolist(), pa.bool_()))
            .append_column(S.LANG_MARGIN, pa.array(margins, pa.float64()))
            .append_column(S.RESOLVED_LANG, pa.array(resolved.tolist(), pa.string()))
        )


class ScoringStage:
    """Fused langid + perplexity actor (one pool, both models loaded in
    ``__init__``): halves actor-pool spin-up and removes one
    object-store hop for the flagship's two model stages."""

    def __init__(self, hint_language: str = "en"):
        self._langid = LangIdStage(hint_language)
        self._ppl = PerplexityStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._ppl(self._langid(batch))


class PerplexityStage:
    """Char-LM perplexity under the doc's resolved language."""

    def __init__(self, model_path: str | None = None, lang_col: str = S.RESOLVED_LANG):
        self.model = PerplexityModel.load(model_path) if model_path else PerplexityModel.load()
        self.lang_col = lang_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(S.CLEAN).to_pylist()
        if self.lang_col in batch.column_names:
            langs = batch.column(self.lang_col).to_pylist()
        else:
            langs = ["en"] * len(texts)
        ppl = self.model.perplexity_many(texts, [lang or "en" for lang in langs])
        return batch.append_column(S.PERPLEXITY, pa.array(ppl, pa.float64()))
