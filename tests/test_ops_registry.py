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
