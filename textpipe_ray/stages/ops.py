"""The full textpipe operation registry as Arrow batch transforms.

One entry per public Operation class of the reference
(/root/reference/textpipe/operation.py:36-448, SURVEY.md §2.1): each op
appends ONE column, named after the step, to the flowing batch — the
reference's ``{op_name: value}`` output dict becomes wide columns
(SURVEY.md §1.3).  Ops read the ``clean`` / language columns computed
by earlier steps, which is the dataflow version of the Doc's lru_cache
DAG (clean parsed once, reused everywhere).

Models (vectors, sentiment lexicons, langid) are cached per worker
process via module-level loaders — Ray reuses worker processes across
tasks, so this is the same load-once amortisation as the reference's
``_spacy_nlps`` pipeline cache (pipeline.py:32-33); the flagship's
langid/perplexity additionally ship as explicit actor-pool stages
(stages/actors.py).
"""

from __future__ import annotations

import functools

import pyarrow as pa

from textpipe_ray import schema as S
from textpipe_ray.functions import entities as ents_fn
from textpipe_ray.functions import keyterms as kt_fn
from textpipe_ray.functions import sentiment as sent_fn
from textpipe_ray.functions import summary as sum_fn
from textpipe_ray.functions import vectors as vec_fn
from textpipe_ray.functions.clean import clean_text, resolve_lang
from textpipe_ray.functions.langid import LangIdModel
from textpipe_ray.functions.tokenize import (
    extract_lead,
    flesch_reading_ease,
    sents,
    word_counts,
    words,
)
from textpipe_ray.data.emoji import EMOJI_TO_SENTIMENT, EMOJI_TO_UNICODE_NAME

# Every CLARIN emoji key is a single codepoint (asserted in
# tests/test_ops_registry.py); the sorted array feeds np.isin below.
import numpy as _np

_EMOJI_CPS = _np.array(sorted(ord(k) for k in EMOJI_TO_UNICODE_NAME), dtype=_np.uint32)


@functools.lru_cache()
def _langid_model() -> LangIdModel:
    return LangIdModel.load()


@functools.lru_cache()
def _vector_model(lang: str) -> vec_fn.HashVectorModel:
    return vec_fn.HashVectorModel(lang)


def _registry(settings):
    """The Pipeline's ModelRegistry, threaded through ``settings`` under
    a reserved key (``Pipeline(models=[(name, lang, path)])`` — the
    reference's custom-model mechanism, pipeline.py:54-60)."""
    return settings.get("__registry")


def public_settings(settings: dict) -> dict:
    """User-provided step settings only: the dispatch layer injects
    reserved ``__``-prefixed keys (the registry channel) into every
    op's settings, so ANY op that forwards ``**settings`` to a kernel
    must strip them here first or the kernel raises
    ``TypeError: unexpected keyword '__registry'``."""
    return {k: v for k, v in settings.items() if not k.startswith("__")}


def _vector_model_for(lang: str, settings) -> "vec_fn.HashVectorModel":
    """Registered keyed-vectors model for the language if any, else the
    built-in hash-vector stand-in (en fallback, like the reference's
    default-language model routing)."""
    reg = _registry(settings)
    if reg is not None:
        m = reg.for_lang("keyed_vectors", lang)
        if m is not None:
            return m
    return _vector_model(lang if lang in ("en",) else "en")


def _texts(batch: pa.Table, col: str) -> list[str]:
    return [t or "" for t in batch.column(col).to_pylist()]


def ensure_clean_column(batch: pa.Table) -> pa.Table:
    """Materialize the clean kernel once as a hidden ``__clean`` column
    so every subsequent op reads it instead of re-running extraction
    (the Pipeline drops it after the last step)."""
    if S.CLEAN in batch.column_names or "__clean" in batch.column_names:
        return batch
    src = "raw" if "raw" in batch.column_names else S.TEXT
    return batch.append_column(
        "__clean", pa.array([clean_text(t) for t in _texts(batch, src)], pa.string())
    )


def _clean_col(batch: pa.Table) -> list[str]:
    if S.CLEAN in batch.column_names:
        return _texts(batch, S.CLEAN)
    if "__clean" in batch.column_names:
        return _texts(batch, "__clean")
    src = "raw" if "raw" in batch.column_names else S.TEXT
    return [clean_text(t) for t in _texts(batch, src)]


def _resolved_langs(batch: pa.Table, hint: str) -> list[str]:
    if S.RESOLVED_LANG in batch.column_names:
        return _texts(batch, S.RESOLVED_LANG)
    model = _langid_model()
    out = []
    for t in _clean_col(batch):
        ok, lang, _ = model.detect(t, hint)
        out.append(resolve_lang(lang, ok, hint))
    return out


# ---- operation implementations (append one column each) --------------------


def op_raw(batch, name, settings, hint):
    src = "raw" if "raw" in batch.column_names else S.TEXT
    return batch.append_column(name, batch.column(src))


def op_clean_text(batch, name, settings, hint):
    settings = public_settings(settings)
    if not settings and "__clean" in batch.column_names:
        vals_arr = batch.column("__clean")  # default flags: reuse the precomputed kernel
    else:
        src = "raw" if "raw" in batch.column_names else S.TEXT
        vals_arr = pa.array(
            [clean_text(t, **settings) for t in _texts(batch, src)], pa.string()
        )
    batch = batch.append_column(name, vals_arr)
    if S.CLEAN not in batch.column_names:
        batch = batch.append_column(S.CLEAN, vals_arr)
    return batch


def op_language(batch, name, settings, hint):
    model = _langid_model()
    vals = []
    for t in _clean_col(batch):
        ok, lang, _ = model.detect(t, hint)
        vals.append(lang if (ok or lang == "un") else hint)
    return batch.append_column(name, pa.array(vals, pa.string()))


def op_nwords(batch, name, settings, hint):
    return batch.append_column(
        name, pa.array([len(words(t)) for t in _clean_col(batch)], pa.int64())
    )


def op_words(batch, name, settings, hint):
    t = pa.list_(pa.struct([("text", pa.string()), ("offset", pa.int64())]))
    vals = [[{"text": w, "offset": o} for w, o in words(x)] for x in _clean_col(batch)]
    return batch.append_column(name, pa.array(vals, t))


def op_word_counts(batch, name, settings, hint):
    t = pa.map_(pa.string(), pa.int64())
    vals = [sorted(word_counts(x).items()) for x in _clean_col(batch)]
    return batch.append_column(name, pa.array(vals, t))


def op_complexity(batch, name, settings, hint):
    return batch.append_column(
        name, pa.array([flesch_reading_ease(t) for t in _clean_col(batch)], pa.float64())
    )


def op_sentences(batch, name, settings, hint):
    t = pa.list_(pa.struct([("text", pa.string()), ("offset", pa.int64())]))
    vals = [[{"text": s, "offset": o} for s, o in sents(x)] for x in _clean_col(batch)]
    return batch.append_column(name, pa.array(vals, t))


def op_nsentences(batch, name, settings, hint):
    return batch.append_column(
        name, pa.array([len(sents(t)) for t in _clean_col(batch)], pa.int64())
    )


def op_entities(batch, name, settings, hint):
    attrs = tuple(settings.get("ent_attributes", ("text", "label_")))
    model_name = settings.get("model_name")
    gaz = tagger = None
    if model_name is not None:
        reg = _registry(settings)
        if reg is None:
            raise ents_fn.MissingModelException(f"Custom model {model_name} is missing.")
        # a registered model may be a gazetteer dict OR a trained
        # ner_tagger (functions/ner_tagger.py) — same op, same output
        # shape, chosen by the model file's type
        if reg.kind(model_name) == "ner":
            tagger = reg.get(model_name, "ner")
        else:
            gaz = reg.get(model_name, "gazetteer")
    t = pa.list_(pa.list_(pa.string()))
    if tagger is not None:
        vals = [
            [[str(a) for a in tup] for tup in tagger.find_ents(x, attrs)]
            for x in _clean_col(batch)
        ]
    else:
        vals = [
            [[str(a) for a in tup] for tup in ents_fn.find_ents(x, None, attrs, gazetteer=gaz)]
            for x in _clean_col(batch)
        ]
    return batch.append_column(name, pa.array(vals, t))


def op_sentiment(batch, name, settings, hint):
    t = pa.struct([("polarity", pa.float64()), ("subjectivity", pa.float64())])
    langs = _resolved_langs(batch, hint)
    vals = []
    for x, lang in zip(_clean_col(batch), langs):
        try:
            p, s = sent_fn.sentiment(x, lang)
            vals.append({"polarity": p, "subjectivity": s})
        except sent_fn.MissingModelException:
            vals.append(None)
    return batch.append_column(name, pa.array(vals, t))


def op_keyterms(batch, name, settings, hint):
    ranker = settings.get("ranker", "textrank")
    n_terms = settings.get("n_terms", 10)
    t = pa.list_(pa.struct([("term", pa.string()), ("score", pa.float64())]))
    langs = _resolved_langs(batch, hint)
    vals = [
        [{"term": k, "score": v} for k, v in kt_fn.extract_keyterms(x, lang, ranker, n_terms)]
        for x, lang in zip(_clean_col(batch), langs)
    ]
    return batch.append_column(name, pa.array(vals, t))


def op_minhash(batch, name, settings, hint):
    # Batched kernel, digest-identical to datasketch (doc.py:465):
    # shared with stages/dedup.minhash_batch — unique tokens sha1-hashed
    # once per batch, one chunked permute for every signature.
    from textpipe_ray.functions.minhash import minhash_signatures_from_token_sets

    num_perm = settings.get("num_perm", 128)
    doc_tokens = [{w for w, _ in words(x)} for x in _clean_col(batch)]
    sigs = minhash_signatures_from_token_sets(doc_tokens, num_perm)
    return batch.append_column(
        name, pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
    )


def op_emojis(batch, name, settings, hint):
    # Vectorized over the whole batch: one UTF-32 decode → one np.isin
    # against the 969-codepoint emoji set (every CLARIN key is a single
    # codepoint) → per-hit gather.  Python touches only the HITS (emoji
    # are rare), never every character — the q_char_coverage idiom.
    import numpy as np

    t = pa.list_(
        pa.struct([("emoji", pa.string()), ("name", pa.string()), ("sentiment", pa.float64())])
    )
    texts = _clean_col(batch)
    n = len(texts)
    lens = np.fromiter((len(x) for x in texts), dtype=np.int64, count=n)
    # surrogatepass for parity with the langid/perplexity UTF-32
    # kernels; unreachable via Arrow columns (Arrow strings are valid
    # UTF-8) but _clean_col may someday feed python-path strings
    cp = np.frombuffer(
        "".join(texts).encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    )
    hit_idx = np.nonzero(np.isin(cp, _EMOJI_CPS))[0]
    offsets = np.concatenate(([0], np.cumsum(lens)))
    # hit_idx ascending ⇒ within-doc occurrence order is preserved
    doc_of = np.searchsorted(offsets, hit_idx, side="right") - 1
    structs = []
    for i in hit_idx:
        ch = chr(int(cp[i]))
        structs.append(
            {"emoji": ch, "name": EMOJI_TO_UNICODE_NAME[ch], "sentiment": EMOJI_TO_SENTIMENT[ch]}
        )
    counts = np.bincount(doc_of, minlength=n) if len(hit_idx) else np.zeros(n, dtype=np.int64)
    col = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32()),
        pa.array(structs, t.value_type),
    )
    return batch.append_column(name, col)


def op_word_vectors(batch, name, settings, hint):
    t = pa.map_(
        pa.string(),
        pa.struct(
            [
                ("has_vector", pa.bool_()),
                ("vector_norm", pa.float64()),
                ("is_oov", pa.bool_()),
                ("vector", pa.list_(pa.float64())),
            ]
        ),
    )
    langs = _resolved_langs(batch, hint)
    vals = [
        sorted(vec_fn.word_vectors(x, _vector_model_for(lang, settings)).items())
        for x, lang in zip(_clean_col(batch), langs)
    ]
    return batch.append_column(name, pa.array(vals, t))


def op_document_vector(batch, name, settings, hint):
    agg = settings.get("aggregation", "mean")
    norm = settings.get("normalize", False)
    excl = settings.get("exclude_oov", False)
    langs = _resolved_langs(batch, hint)
    vals = [
        vec_fn.aggregate_word_vectors(x, _vector_model_for(lang, settings), agg, norm, excl)
        for x, lang in zip(_clean_col(batch), langs)
    ]
    return batch.append_column(name, pa.array(vals, pa.list_(pa.float64())))


def op_gensim_document_embedding(batch, name, settings, hint):
    lowercase = settings.get("lowercase", True)
    weighting = settings.get("idf_weighting", "naive")
    langs = _resolved_langs(batch, hint)
    reg = _registry(settings)
    vals = []
    for x, lang in zip(_clean_col(batch), langs):
        model = reg.for_lang("keyed_vectors", lang) if reg is not None else None
        if model is None:
            try:
                model = _vector_model(lang)
            except vec_fn.MissingModelException:
                model = _vector_model("en")
        vals.append(vec_fn.document_embedding(x, model, lowercase, weighting))
    return batch.append_column(name, pa.array(vals, pa.list_(pa.float64())))


def op_gensim_textrank(batch, name, settings, hint):
    ratio = settings.get("ratio", 0.2)
    wc = settings.get("word_count")
    vals = [sum_fn.textrank_summary(x, ratio, wc) for x in _clean_col(batch)]
    return batch.append_column(name, pa.array(vals, pa.list_(pa.string())))


def op_lead_sentences(batch, name, settings, hint):
    n = settings.get("nsents", 3)
    vals = [extract_lead(x, n) for x in _clean_col(batch)]
    return batch.append_column(name, pa.array(vals, pa.list_(pa.string())))


def op_categories(batch, name, settings, hint):
    model_name = settings.get("model_name")
    if model_name is not None:
        from textpipe_ray.functions.registry import MissingModelException

        reg = _registry(settings)
        if reg is None:
            raise MissingModelException(f"Custom model {model_name} is missing.")
        model = reg.get(model_name, "textcat")
        vals = [sorted(model.predict(x).items()) for x in _clean_col(batch)]
    else:
        # default textcat has no labels → {} per doc (reference doc.py:783-802)
        vals = [[] for _ in range(len(batch))]
    return batch.append_column(name, pa.array(vals, pa.map_(pa.string(), pa.float64())))


OPERATIONS = {
    "Raw": op_raw,
    "CleanText": op_clean_text,
    "Language": op_language,
    "NWords": op_nwords,
    "Words": op_words,
    "WordCounts": op_word_counts,
    "Complexity": op_complexity,
    "Sentences": op_sentences,
    "NSentences": op_nsentences,
    "Entities": op_entities,
    "Sentiment": op_sentiment,
    "Keyterms": op_keyterms,
    "MinHash": op_minhash,
    "Emojis": op_emojis,
    "WordVectors": op_word_vectors,
    "DocumentVector": op_document_vector,
    "GensimDocumentEmbedding": op_gensim_document_embedding,
    "GensimTextRank": op_gensim_textrank,
    "LeadSentences": op_lead_sentences,
    "Categories": op_categories,
}
