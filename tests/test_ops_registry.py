"""Operation registry + Pipeline spec contract tests (reference
pipeline.py / test_pipeline.py behaviors)."""

import pyarrow as pa
import pytest

from textpipe_ray.pipelines.spec import Pipeline
from textpipe_ray.stages.ops import OPERATIONS

ALL_OPS = list(OPERATIONS)


def test_all_reference_operations_registered():
    # the 20-op public registry of operation.py (SURVEY.md §2.1)
    for name in [
        "Raw", "CleanText", "Language", "NWords", "Words", "WordCounts",
        "Complexity", "Sentences", "NSentences", "Entities", "Sentiment",
        "Keyterms", "MinHash", "WordVectors", "DocumentVector",
        "GensimDocumentEmbedding", "GensimTextRank", "LeadSentences",
        "Categories", "Emojis",
    ]:
        assert name in OPERATIONS, name


def test_single_doc_dict_contract():
    p = Pipeline(["CleanText", "NWords", "Language"])
    out = p("<b>Test sentence for testing text</b>")
    assert out["CleanText"] == "Test sentence for testing text"
    assert out["NWords"] == 5
    assert out["Language"] == "en"
    assert list(out) == ["CleanText", "NWords", "Language"]  # output arity+order


def test_step_normalization_and_settings():
    p = Pipeline([("LeadSentences", {"nsents": 1}), "NSentences"])
    out = p("One. Two. Three.")
    assert out["LeadSentences"] == ["One."]
    assert out["NSentences"] == 3


def test_unknown_step_raises_attribute_error():
    with pytest.raises(AttributeError):
        Pipeline(["Bogus"])


def test_save_load_roundtrip(tmp_path):
    p = Pipeline([("CleanText", {"clean_dots": True}), "NWords"], hint_language="nl")
    f = tmp_path / "spec.json"
    p.save(f)
    q = Pipeline.load(f)
    assert q.steps == p.steps
    assert q.hint_language == "nl"
    assert q("Tekst… hier")["CleanText"] == "Tekst... hier"


def test_register_operation_sees_context():
    p = Pipeline(["CleanText", "NWords"])

    def custom(batch, name, settings, hint):
        # context: reads the NWords column computed by the earlier step
        vals = [n * 2 for n in batch.column("NWords").to_pylist()]
        return batch.append_column(name, pa.array(vals, pa.int64()))

    p.register_operation("DoubleWords", custom)
    out = p("one two three")
    assert out["DoubleWords"] == out["NWords"] * 2


def test_sentiment_contract():
    p = Pipeline(["Sentiment"], language="en")
    out = p("This is a great and wonderful thing")
    assert out["Sentiment"]["polarity"] > 0
    # unsupported language → null struct (stage-level missing-model)
    p_de = Pipeline(["Sentiment"], language="de")
    assert p_de("Das ist gut")["Sentiment"] is None


def test_minhash_op_matches_reference_digests():
    p = Pipeline(["MinHash"])
    out = p("Sentence for computing the minhash")
    assert out["MinHash"][:5] == [407326892, 814360600, 1099082245, 1176349439, 1735256]


def test_emoji_op():
    p = Pipeline(["Emojis"])
    out = p("Test with emoji 😀 😋")
    assert [e["emoji"] for e in out["Emojis"]] == ["😀", "😋"]
    assert all(-1 <= e["sentiment"] <= 1 for e in out["Emojis"])


def test_emoji_op_vectorized_matches_per_char_loop():
    """The batched UTF-32/np.isin kernel must equal the naive per-char
    scan on every doc — including empty docs, repeats and astral-plane
    codepoints — and its single-codepoint-key precondition must hold."""
    import pyarrow as pa

    from textpipe_ray.data.emoji import EMOJI_TO_SENTIMENT, EMOJI_TO_UNICODE_NAME
    from textpipe_ray.stages.ops import op_emojis

    assert all(len(k) == 1 for k in EMOJI_TO_UNICODE_NAME)
    texts = [
        "Favorite emoji: 😁 😂!",
        "",
        "no emoji here",
        "😁😁 double, then 🤐",
        "unicode ☃ snowman",
        "🌍" * 5,
    ]
    batch = pa.table({"clean": pa.array(texts, pa.string())})
    got = op_emojis(batch, "Emojis", {}, None).column("Emojis").to_pylist()
    want = []
    for x in texts:
        hits = []
        for ch in x:
            u = EMOJI_TO_UNICODE_NAME.get(ch)
            if u is not None:
                hits.append(
                    {"emoji": ch, "name": u, "sentiment": EMOJI_TO_SENTIMENT[ch]}
                )
        want.append(hits)
    assert got == want


def test_vector_ops_invariants():
    p = Pipeline(["DocumentVector"])
    v1 = p("a b")["DocumentVector"]
    v2 = p("a a b")["DocumentVector"]
    assert v1 == p("a b")["DocumentVector"]  # deterministic
    assert v1 != v2  # reference doc.py:547-550
    assert len(v1) == 96


def test_gensim_embedding_invariants():
    # reference doc.py:651-662: doc1 ≠ doc2, doc1 == doc3 (same word multiset)
    p = Pipeline(["GensimDocumentEmbedding"], language="nl")
    d1 = p("textmining is verwant aan tekstanalyse")["GensimDocumentEmbedding"]
    d2 = p("textmining is verwant aan textmining")["GensimDocumentEmbedding"]
    d3 = p("tekstanalyse is verwant aan textmining")["GensimDocumentEmbedding"]
    assert d1 != d2
    assert d1 == pytest.approx(d3)


def test_pipeline_transform_dataset(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": ["Test sentence for testing text.", "Another one here!"]})
    )
    p = Pipeline(["CleanText", "NWords", "Complexity"])
    out = p.transform(ds).to_pandas()
    assert list(out["NWords"]) == [6, 4]
    assert "Complexity" in out.columns


# ---- pluggable custom models (reference pipeline.py:54-60 mechanism) ----

MODELS_DIR = "/root/repo/models/custom"


def test_entities_custom_gazetteer_changes_output():
    from textpipe_ray.pipelines.spec import Pipeline

    text = "Rembrandt moved from Rotterdam while Google watched."
    default = Pipeline(["Entities"])(text)["Entities"]
    custom = Pipeline(
        [("Entities", {"model_name": "nl_gaz"})],
        models=[("nl_gaz", "*", f"{MODELS_DIR}/nl_gazetteer.json")],
    )(text)["Entities"]
    assert default != custom
    assert ["Rembrandt", "PERSON"] in custom
    assert ["Google", "SEARCH_ENGINE"] in custom  # label overridden by the file
    assert ["Rotterdam", "GPE"] in custom


def test_entities_missing_model_raises():
    import pytest

    from textpipe_ray.functions.entities import MissingModelException
    from textpipe_ray.pipelines.spec import Pipeline

    p = Pipeline([("Entities", {"model_name": "nope"})])
    with pytest.raises(MissingModelException):
        p("some text")


def test_categories_honors_labels_file():
    from textpipe_ray.pipelines.spec import Pipeline

    p = Pipeline(
        [("Categories", {"model_name": "news"})],
        models=[("news", "*", f"{MODELS_DIR}/news_textcat.json")],
    )
    got = dict(p("The team scored a late goal and won the match in the league.")["Categories"])
    assert set(got) == {"sports", "politics", "tech"}  # all labels present
    assert got["sports"] == 1.0 and got["politics"] == 0.0
    # default (no model) keeps the no-label textcat contract: {}
    assert Pipeline(["Categories"])("any text")["Categories"] == []


def test_word_vectors_pick_up_registered_keyed_vectors():
    import json

    import numpy as np

    from textpipe_ray.pipelines.spec import Pipeline

    spec = ("tiny", "en", f"{MODELS_DIR}/tiny_vectors.json")
    text = "test vector"
    got = dict(Pipeline(["WordVectors"], models=[spec])(text)["WordVectors"])
    filed = json.load(open(spec[2]))
    assert got["test"]["has_vector"] is True
    np.testing.assert_allclose(got["test"]["vector"], filed["vectors"]["test"])
    assert len(got["test"]["vector"]) == 8  # file dim, not the hash model's 96
    # DocumentVector aggregates the same file vectors
    dv = Pipeline([("DocumentVector", {"aggregation": "mean"})], models=[spec])(text)[
        "DocumentVector"
    ]
    want = np.mean([filed["vectors"]["test"], filed["vectors"]["vector"]], axis=0)
    np.testing.assert_allclose(dv, want)


def test_pipeline_models_roundtrip(tmp_path):
    from textpipe_ray.pipelines.spec import Pipeline

    spec = [("news", "*", f"{MODELS_DIR}/news_textcat.json")]
    p = Pipeline([("Categories", {"model_name": "news"})], models=spec)
    f = tmp_path / "pipe.json"
    p.save(f)
    p2 = Pipeline.load(f)
    assert p2.models == [tuple(spec[0])]
    assert p2("election vote policy")["Categories"] == p("election vote policy")["Categories"]


def test_transform_with_models(ray_session):
    """The registry must survive the map_batches closure: specs pickle,
    files load once per worker."""
    import pyarrow as pa

    import ray.data

    from textpipe_ray.pipelines.spec import Pipeline

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["Rembrandt in Rotterdam", "nothing here"]})
    )
    p = Pipeline(
        [("Entities", {"model_name": "nl_gaz"})],
        models=[("nl_gaz", "*", f"{MODELS_DIR}/nl_gazetteer.json")],
    )
    out = p.transform(ds).to_pandas().sort_values("doc_id")
    assert list(out["Entities"].iloc[0][0]) == ["Rembrandt", "PERSON"]
    assert len(out["Entities"].iloc[1]) == 0


def test_emoji_doctest_parity():
    """Reference doc.py:266-270 doctest values, reproduced exactly from
    the full public Emoji Sentiment Ranking table."""
    from textpipe_ray.pipelines.spec import Pipeline

    out = Pipeline(["Emojis"])("Test with emoji 😀 😋 ")["Emojis"]
    got = [(e["emoji"], e["name"], e["sentiment"]) for e in out]
    assert got == [
        ("😀", "GRINNING FACE", 0.571753986332574),
        ("😋", "FACE SAVOURING DELICIOUS FOOD", 0.6335149863760218),
    ]
