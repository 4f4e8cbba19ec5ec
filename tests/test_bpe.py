"""BPE tokenizer training: deterministic merges + encode semantics
(functions/bpe.py) and the distributed q_bpe_train plan."""

import numpy as np

from textpipe_ray.functions.bpe import END, encode_word, learn_bpe, token_count

# the classic Sennrich example vocabulary
VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_bpe_deterministic_merges():
    merges = learn_bpe(VOCAB, 4)
    # 'es' (9), 'est' (9), 'est</w>' (9) dominate; count ties break to
    # the lexicographically smallest pair — fixed, engine-independent
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert learn_bpe(VOCAB, 4) == merges  # bit-stable


def test_encode_follows_merge_ranks():
    merges = learn_bpe(VOCAB, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks)[-1] == "est" + END
    assert token_count("lowest", ranks) < len("lowest") + 1  # compresses
    # unseen characters still encode (no merges apply)
    assert token_count("zzz", {}) == 4  # z z z </w>


def test_learn_bpe_stops_on_singletons():
    merges = learn_bpe([("ab", 1)], 10)
    assert merges == []  # no pair occurs twice — nothing to learn


def test_q_bpe_train_compresses_and_is_exact(ray_session):
    """Distributed plan must equal a single-process reference run:
    same merges (word counts are exact), same per-doc token counts."""
    import regex as re
    from collections import Counter

    import duckdb

    from textpipe_ray.functions.quality import RE2_PATTERNS
    from textpipe_ray.pipelines.queries import BPE_NUM_MERGES, q_bpe_train

    SF = "/root/testdata/sf0.001"
    df = q_bpe_train(SF).to_pandas().set_index("doc_id")

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, lower(text) FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    creg = re.compile(RE2_PATTERNS["nwords"])
    wc = Counter()
    for t in texts.values():
        wc.update(creg.findall(t or ""))
    merges = learn_bpe(sorted(wc.items()), BPE_NUM_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, t in list(texts.items())[:50]:
        ws = creg.findall(t or "")
        want = sum(token_count(w, ranks) for w in ws)
        assert df.loc[doc_id, "n_bpe_tokens"] == want
        assert df.loc[doc_id, "n_words"] == len(ws)
    # the tokenizer must actually compress vs characters and sit at or
    # above word granularity
    n_chars = np.array([len("".join(creg.findall(texts[d]))) for d in df.index])
    assert (df["n_bpe_tokens"].to_numpy() <= n_chars + df["n_words"].to_numpy()).all()
    assert (df["n_bpe_tokens"] >= df["n_words"]).all()
    assert (df["n_bpe_tokens"][df["n_words"] > 0] > 0).all()


def test_vocab_coverage_matches_single_process(ray_session):
    """q_vocab_coverage's type-space token frequencies must equal a
    from-scratch single-process count over the whole corpus (same
    merges, token-instance space)."""
    from collections import Counter

    import pyarrow.parquet as pq
    import regex as re

    from textpipe_ray.functions.bpe import encode_word, learn_bpe
    from textpipe_ray.functions.quality import RE2_PATTERNS
    from textpipe_ray.pipelines.queries import (
        BPE_NUM_MERGES,
        BPE_TOP_WORDS,
        VOCAB_TOP_K,
        q_vocab_coverage,
    )

    sf = "/root/testdata/sf0.001"
    creg = re.compile(RE2_PATTERNS["nwords"])
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text")
    wc = Counter()
    # lower via Arrow's utf8_lower — the query's lowering — so this
    # tests the BPE math, not Python-vs-Arrow Unicode case mapping
    # (they diverge on context-sensitive maps, e.g. final sigma)
    import pyarrow.compute as pc

    for t in pc.utf8_lower(texts).to_pylist():
        wc.update(creg.findall(t or ""))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_WORDS]
    ranks = {p: i for i, p in enumerate(learn_bpe(top, BPE_NUM_MERGES))}
    tc = Counter()
    for w, n in wc.items():
        for tok in encode_word(w, ranks):
            tc[tok] += n
    total = sum(tc.values())
    expect = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP_K]

    got = q_vocab_coverage(sf).to_pandas()
    assert list(got.token) == [t for t, _ in expect]
    assert list(got.n) == [n for _, n in expect]
    assert list(got.permille) == [n * 1000 // total for _, n in expect]
