"""Driver-contract replica: every oracle-checked query must match its
DuckDB SQL exactly (rows, schema names, values) at sf0.001."""

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _entry():
    return importlib.import_module("__ray_entry__")


def oracle_names():
    return sorted(_entry().oracle_sql())


@pytest.mark.parametrize("name", [
    "q_clean", "q_quality", "q_complexity", "q_scrub", "q_fingerprint",
    "q_exact_dedup", "q_token_freq", "q_lang_metrics", "q_topk_docs",
    "q_events_window", "q_agg_lineitem", "q_segment_orders", "q_ann_topk",
    "q_ngram_jaccard", "q_sessionize", "q_len_quantiles", "q_tfidf_topk", "q_repetition", "q_native_join", "q_asof_join", "q_train_split", "q_rolling_sum", "q_stratified_sample",
    "q_contamination", "q_pack_sequences", "q_events_sliding",
    "q_chunk_dedup", "q_anti_join", "q_range_join", "q_token_count",
    "q_distinct_tokens", "q_topk_per_group",
    "q_quality_score", "q_dup_stats", "q_embedding_centroid", "q_domain_mix",
    "q_lang_temperature", "q_json_extract", "q_shuffle_shards", "q_char_coverage",
    "q_span_dedup", "q_pii_stats", "q_trigram_lm", "q_collocations",
    "q_quality_percentile", "q_budget_mix", "q_normalized_dedup", "q_funnel",
    "q_gopher_rules", "q_repetition_rules", "q_filter_pr_curve",
    "q_quantile_sketch", "q_dup_clusters", "q_bm25", "q_epoch_mix", "q_bitext_mine",
    "q_keeper_selection", "q_profile", "q_validate", "q_rollup", "q_pivot",
    "q_bm25_layout", "q_bm25_append", "q_time_layout", "q_cdc_diff",
    "q_skew_join", "q_wet_export", "q_drift", "q_rule_ablation", "q_nfc_normalize",
    "q_lang_quantile_norm", "q_code_detect", "q_citation_density", "q_pseudonymize",
    "q_domain_reweight", "q_k_anonymity",
    # golden-parquet oracles (scripts/make_goldens.py)
    "q_langid", "q_kmeans", "q_langid_eval", "q_markup_density", "q_token_fertility", "q_perplexity", "q_minhash", "q_simhash", "q_simhash_neardup",
    "q_ann_ivf", "q_embedding_neardup", "q_pages_flagship", "q_pages_neardup",
    "q_pages_dedup", "q_textpipe_ops", "q_media_features",
    "q_host_stats", "q_paragraph_filter", "q_boilerplate_dedup", "q_ppl_buckets",
    "q_url_filter", "q_media_phash_dedup", "q_url_dedup", "q_corpus_release",
    "q_dsir", "q_embedding_pca", "q_video_dedup", "q_audio_dedup",
    "q_para_ppl", "q_incremental_dedup", "q_distinct_sketch", "q_doc_vectors", "q_bloom_dedup", "q_bpe_train", "q_unigram_lm", "q_semdedup",
    "q_classifier_train", "q_substring_dedup", "q_snapshot_loop",
    "q_ann_ivf_layout", "q_heavy_hitters", "q_ann_ivf_append", "q_link_graph",
    "q_pagerank", "q_crawl_frontier", "q_compress_ratio", "q_lsh_recall", "q_vocab_coverage",
    "q_ann_pq", "q_robots_filter", "q_trained_models",
])
def test_query_matches_oracle(ray_session, name):
    from textpipe_ray.pipelines.compare import compare, run_oracle

    m = _entry()
    sql = m.oracle_sql()[name]
    res = m.queries()[name](SF)
    c = compare(res, run_oracle(SF, sql))
    assert c["rows_match"] and c["cols_match"] and c["values_match"], c


def test_every_oracle_has_query():
    m = _entry()
    q = m.queries()
    for name in m.oracle_sql():
        assert name in q, name


def test_rotation_policy():
    """Window discipline (round-3 advice): every query PAST the driver's
    ~50-query check window must (a) have a green row in some committed
    CORRECTNESS_r*.json — i.e. it has been driver-verified at least once
    — and (b) have a value-checking oracle so local pytest re-checks it
    every run.  New/changed queries belong in the front of the window."""
    import glob
    import json

    m = _entry()
    names = list(m.queries())
    oracles = m.oracle_sql()
    ever_green: set = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(p, "r", encoding="utf8") as f:
            for q, row in json.load(f).items():
                if row.get("rows_match") and row.get("hash_match"):
                    ever_green.add(q)
    for q in names[50:]:
        assert q in ever_green, f"tail query {q} never driver-verified"
    for q in names:
        assert q in oracles, f"{q} has no value-checking oracle"


def test_entry_smoke(ray_session):
    ds = _entry().entry()
    assert ds.count() >= 0
    assert ds.schema() is not None


def test_robots_filter_rfc_semantics(ray_session):
    """The vectorized longest-match resolution must equal an
    independent per-row RFC 9309 reference on every page, and each
    planted semantic case must actually occur: allow-override
    (host00), partial disallow band (host01), whole-host block
    (host02), equal-length tie -> allow (host03), wildcard +
    end-anchor disallow (host04), wildcard allow beating a shorter
    literal disallow (host05), empty Disallow = allow-all no-op
    (host06), unlisted hosts allowed with no rule."""
    import re

    from textpipe_ray.pipelines.queries import load_robots_rules, q_robots_filter

    df = q_robots_filter(SF).to_pandas()
    groups = load_robots_rules()

    def ref_match(path: str, p: str) -> bool:
        # Independent per-row RFC 9309 §2.2.3 matcher: '' = no-op,
        # '*' spans anything, trailing '$' anchors the end, else prefix.
        if p == "":
            return False
        anchored = p.endswith("$")
        body = p[:-1] if anchored else p
        if "*" not in body and not anchored:
            return path.startswith(body)
        rx = ".*".join(re.escape(seg) for seg in body.split("*"))
        return re.match("^" + rx + ("$" if anchored else ""), path) is not None

    def ref(url: str):
        m = re.match(r"^[a-z]+://([^/]+)(/.*)?$", url)
        host, path = m.group(1), m.group(2) or "/"
        spec = groups.get(host, groups.get("*", {}))
        best = None  # (pattern_len, is_allow, pattern); allow wins ties
        for typ in ("allow", "disallow"):
            for p in spec.get(typ, []):
                if ref_match(path, p):
                    cand = (len(p), typ == "allow", p)
                    if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                        best = cand
        if best is None:
            return True, ""
        return best[1], ("allow:" if best[1] else "disallow:") + best[2]

    for r in df.itertuples():
        allowed, rule = ref(r.url)
        assert (r.allowed, r.rule) == (allowed, rule), r.url
    by_host = df.groupby("host")["allowed"]
    assert not df[df.host == "host00.example.com"]["allowed"].all()
    assert df[(df.host == "host00.example.com") & df.allowed].shape[0] > 0
    h1 = df[df.host == "host01.example.org"]["allowed"]
    assert (~h1).any() and h1.any()
    assert not by_host.get_group("host02.example.net").any()
    h3 = df[df.host == "host03.example.io"]
    assert h3["allowed"].all() and (h3["rule"] == "allow:/page/").all()
    # host04: end-anchored wildcard blocks EXACTLY ids ending in '0'
    h4 = df[df.host == "host04.example.dev"]
    ends0 = h4["url"].str.endswith("0")
    assert (~h4["allowed"] == ends0).all()
    assert (h4.loc[ends0.values, "rule"] == "disallow:/page/*0$").all()
    assert (~h4["allowed"]).any() and h4["allowed"].any()
    # host05: '/page/*5' (len 8) outranks literal '/page/0' (len 7)
    h5 = df[df.host == "host05.example.com"]
    has5 = h5["url"].str.slice(len("https://host05.example.com")).str.contains("5")
    assert (h5["allowed"] == has5).all()
    assert (h5.loc[has5.values, "rule"] == "allow:/page/*5").all()
    assert h5["allowed"].any() and (~h5["allowed"]).any()
    # host06: empty Disallow is an allow-all NO-OP, never a len-0 block
    h6 = df[df.host == "host06.example.org"]
    assert len(h6) > 0 and h6["allowed"].all() and (h6["rule"] == "").all()
    listed = set(groups) - {"*"}
    unlisted = df[~df.host.isin(listed)]
    assert unlisted["allowed"].all() and (unlisted["rule"] == "").all()


def test_url_dedup_recovers_original_urls(ray_session):
    """Planted capture variants (utm/www/slash/fragment) must collapse
    back to exactly the original URL set, earliest capture kept."""
    import duckdb

    from textpipe_ray.pipelines.queries import pages_dir_for, q_url_dedup

    df = q_url_dedup(SF).to_pandas()
    pages = pages_dir_for(SF)
    orig = {
        r[0]
        for r in duckdb.sql(
            f"select lower(url) from read_parquet('{pages}/pages-*.parquet')"
        ).fetchall()
    }
    assert set(df["canonical_url"]) == orig          # nothing lost, nothing extra
    assert (df["keep_url"].str.lower() == df["canonical_url"]).all()  # original wins (earliest ts)
    assert (df["n_dups"] >= 1).all()


def test_dsir_prefers_target_source(ray_session):
    """DSIR importance weights must rank the target-distribution subset
    above the rest on average (per-trigram, to remove length bias)."""
    import duckdb

    from textpipe_ray.pipelines.queries import DSIR_TARGET_SOURCE, q_dsir

    df = q_dsir(SF).to_pandas()
    src = duckdb.sql(
        f"select doc_id, source, len(text) as L from read_parquet('{SF}/documents.parquet')"
    ).fetchdf()
    j = df.merge(src, on="doc_id")
    per_tri = j["weight_micro"] / (j["L"] - 2).clip(lower=1)
    tgt = per_tri[j["source"] == DSIR_TARGET_SOURCE].mean()
    rest = per_tri[j["source"] != DSIR_TARGET_SOURCE].mean()
    assert tgt > rest


def test_doc_vectors_store_parity_and_oov(ray_session):
    """q_doc_vectors must prove the ShardedVectorStore path bit-equal to
    the registry FileVectorModel path on every document (store_match),
    and the committed vector model must leave real OOV traffic so the
    fallback branch is exercised (not a vocabulary-covers-everything
    vacuous pass)."""
    from textpipe_ray.pipelines.queries import q_doc_vectors

    df = q_doc_vectors(SF).to_pandas()
    assert len(df) == 500
    assert df["store_match"].all()
    assert (df["n_vocab"] < df["n_tokens"]).any()      # OOV fallback hit
    assert (df["n_vocab"] > 0).any()                   # registered vectors hit
    assert (df["gensim_n"] > 0).any()                  # in-vocab gensim embeddings
    assert set(df["top_cat"]) - {""}                   # textcat labels produced


def test_bloom_dedup_zero_false_negatives(ray_session):
    """Every odd-half page whose cleaned text also appears in the even
    half MUST be flagged (Bloom filters cannot miss); false positives
    are allowed but must stay under 1% at the 10+-bits/key sizing."""
    import duckdb

    from textpipe_ray.pipelines.queries import pages_dir_for, q_bloom_dedup

    df = q_bloom_dedup(SF).to_pandas()
    pages = pages_dir_for(SF)
    truth = duckdb.sql(
        f"""
        WITH p AS (SELECT CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS id, text
                   FROM '{pages}/pages-*.parquet'),
        even AS (SELECT text FROM p WHERE id % 2 = 0)
        SELECT id FROM p WHERE id % 2 = 1
          AND EXISTS (SELECT 1 FROM even e WHERE e.text = p.text)"""
    ).fetchdf()
    t = set(truth["id"])
    flagged = set(df[df["bloom_hit"]]["doc_id"])
    assert t, "fixture must plant cross-parity exact dups"
    assert t <= flagged, sorted(t - flagged)[:5]          # zero false negatives
    assert len(flagged - t) <= max(1, len(df) // 100)     # FP rate bound


def test_semdedup_within_cluster_invariants(ray_session):
    """Exact properties of the greedy keep rule: (a) no two KEPT docs
    in the same cluster are within the cosine threshold; (b) every
    same-cell pair at/above threshold loses exactly its higher id when
    both ids are otherwise kept; (c) the min id of every cluster is
    always kept."""
    import numpy as np
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import SEMDEDUP_COS_Q, _doc_tf_embed, q_semdedup

    df = q_semdedup(SF).to_pandas()
    assert len(df) == 500
    assert (~df["keep"]).sum() > 0  # planted near-dups actually drop

    emb_t = _doc_tf_embed(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]))
    ids = np.asarray(emb_t.column("vec_id"), dtype=np.int64)
    mat = np.array(emb_t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    cos_q = np.floor((mat @ mat.T) / (norms[:, None] * norms[None, :]) * 1e9).astype(np.int64)

    d = df.set_index("vec_id").loc[ids]
    keep = d["keep"].to_numpy()
    cell = d["cell"].to_numpy()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cell[i] == cell[j] and cos_q[i, j] >= SEMDEDUP_COS_Q:
                assert not (keep[i] and keep[j]), (ids[i], ids[j])
    # min id per cluster always survives
    import pandas as pd

    first = pd.DataFrame({"cell": cell, "id": ids, "keep": keep}).sort_values("id")
    assert first.groupby("cell").first()["keep"].all()


def test_pca_batching_independent(ray_session):
    """The fixed-point moment sums must make PCA output identical under
    any block structure (the order-independence claim)."""
    import ray.data

    from textpipe_ray.pipelines import queries as Q

    def _canon(df):
        return df.sort_values("vec_id").reset_index(drop=True)

    base = _canon(Q.q_embedding_pca(SF).to_pandas())
    orig_read = Q._read
    try:
        def skewed_read(sf_dir, table, columns=None, min_blocks=8):
            return ray.data.read_parquet(
                f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=3
            )
        Q._read = skewed_read
        alt = _canon(Q.q_embedding_pca(SF).to_pandas())
    finally:
        Q._read = orig_read
    assert base.equals(alt)


def test_repetition_rules_null_text(ray_session, tmp_path):
    """A NULL text row must not poison the vectorized gram kernel (a
    raw int64 cast of the null list length yields INT64_MIN and blows
    up np.repeat): the doc contributes zero words -> all-zero millis,
    keep=true, matching the oracle's coalesce/greatest math -- checked
    by running BOTH engines over a table with a planted NULL."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.compare import compare, run_oracle

    sf = str(tmp_path / "sf_null")
    os.makedirs(sf)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(f"{SF}/{t}.parquet", f"{sf}/{t}.parquet")
    base = pq.read_table(f"{SF}/documents.parquet")
    texts = base.column("text").to_pylist()
    texts[3] = None
    texts[7] = ""
    i = base.column_names.index("text")
    pq.write_table(
        base.set_column(i, "text", pa.array(texts, base.column("text").type)),
        f"{sf}/documents.parquet",
    )

    m = _entry()
    res = m.queries()["q_repetition_rules"](sf)
    c = compare(res, run_oracle(sf, m.oracle_sql()["q_repetition_rules"]))
    assert c["rows_match"] and c["cols_match"] and c["values_match"], c


def test_snapshot_loop_append_is_live(ray_session):
    """q_snapshot_loop's snapshot-2 pass must find pairs against BOTH
    the bootstrap generation (parity-0 docs) and the generation
    APPENDED for snapshot 1 (parity-1 docs) -- proving
    append_minhash_index actually extends what later snapshots dedup
    against, not just the golden bytes."""
    from textpipe_ray.pipelines.queries import q_snapshot_loop

    df = q_snapshot_loop(SF).to_pandas()
    assert (df["snapshot"] == 1).any() and (df["snapshot"] == 2).any()
    s2 = df[df["snapshot"] == 2]
    parities = set((s2["index_id"] % 3).tolist())
    assert parities == {0, 1}, parities
    # pair ids honor the split: new side is always this snapshot's parity
    assert ((df["new_id"] % 3) == df["snapshot"]).all()
    # bloom candidate counts are live values (planted prefix dups exist)
    assert df[df["snapshot"] == 1]["snap_bloom_hits"].iloc[0] > 0
    assert df[df["snapshot"] == 2]["snap_bloom_hits"].iloc[0] > 0


def test_quantile_sketch_exact_small_bounded_large(ray_session):
    """The bottom-k sketch's two regimes: a language whose population
    fits in the sample (n <= K, true at sf0.001) must report EXACT
    quantiles; a genuinely sampled language (sf0.01, n > K) must land
    its p50 estimate within the binomial rank-error envelope.  The
    driver/oracle compare separately proves the sample itself is
    deterministic -- this test proves the ESTIMATES mean what the
    docstring claims."""
    import duckdb
    import numpy as np

    from textpipe_ray.pipelines.queries import (
        SKETCH_QUANTILES,
        SKETCH_SAMPLE_K,
        q_quality_score,
        q_quantile_sketch,
    )

    def exact_quantiles(sf):
        scores = q_quality_score(sf).to_pandas()[["doc_id", "score"]]
        con = duckdb.connect()
        langs = con.execute(
            f"SELECT doc_id, lang FROM parquet_scan('{sf}/documents.parquet')"
        ).df()
        df = scores.merge(langs, on="doc_id")
        df["micro"] = np.floor(df["score"].to_numpy() * 1e6).astype(np.int64)
        out = {}
        for lang, g in df.groupby("lang"):
            v = np.sort(g["micro"].to_numpy())
            n = len(v)
            out[lang] = {
                "n": n,
                **{
                    f"p{num * 100 // den}": int(v[max(0, -(-(num * n) // den) - 1)])
                    for num, den in SKETCH_QUANTILES
                },
                "values": v,
            }
        return out

    # sf0.001: every lang fits in the sample -> exact
    sk = q_quantile_sketch(SF).to_pandas().set_index("lang")
    ex = exact_quantiles(SF)
    for lang, e in ex.items():
        assert e["n"] <= SKETCH_SAMPLE_K, "fixture grew; pick a smaller sf"
        assert int(sk.loc[lang, "n_sample"]) == e["n"]
        for col in ("p25", "p50", "p75", "p90"):
            assert int(sk.loc[lang, col]) == e[col], (lang, col)

    # sf0.1: real sampling (per-lang n ~ 1000 > K) -> p50's true rank
    # within q +/- 3*sqrt(q(1-q)/K)
    sf1 = "/root/testdata/sf0.1"
    sk = q_quantile_sketch(sf1).to_pandas().set_index("lang")
    ex = exact_quantiles(sf1)
    tol = 3 * (0.25 / SKETCH_SAMPLE_K) ** 0.5
    sampled = 0
    for lang, e in ex.items():
        if e["n"] <= SKETCH_SAMPLE_K:
            continue
        sampled += 1
        est = int(sk.loc[lang, "p50"])
        true_rank = (e["values"] <= est).mean()
        assert abs(true_rank - 0.5) <= tol, (lang, est, true_rank, tol)
    assert sampled > 0, "sf0.1 should have at least one sampled language"


def test_dup_clusters_matches_driver_union_find(ray_session):
    """The q_dup_clusters driver row (distributed min-label CC) must
    agree with the in-process union-find over the SAME pair list — an
    independent third implementation beyond the recursive-CTE oracle."""
    from textpipe_ray.pipelines.queries import q_dup_clusters
    from textpipe_ray.stages.dedup import pair_clusters, shingle_jaccard_pairs
    import ray as _ray

    ds = _ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pairs = shingle_jaccard_pairs(ds, k=3, threshold=0.8).to_pandas()
    want = pair_clusters(pairs)  # {doc_id: root} via union-find
    got = q_dup_clusters(SF).to_pandas()
    assert len(got) == len(want) > 0
    for doc_id, root in zip(got["doc_id"], got["root"]):
        assert want[int(doc_id)] == int(root)
    # roots really are component minima
    assert (got.groupby("root")["doc_id"].min().index.to_numpy()
            == got.groupby("root")["doc_id"].min().to_numpy()).all()


def test_bm25_matches_independent_python(ray_session):
    """q_bm25 vs a from-scratch pure-Python BM25 over the same parquet
    (different tokenizer call pattern, different accumulation order up
    to the documented left-fold) — guards against the Ray plan and the
    generated SQL sharing a bug."""
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
        TFIDF_TOKEN_RE,
        q_bm25,
    )

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(TFIDF_TOKEN_RE)
    docs = {
        int(d): Counter(tok.findall((x or "").lower()))
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    dls = {d: sum(c.values()) for d, c in docs.items()}
    n = len(docs)
    avgdl = float(sum(dls.values())) / float(n)
    df = {w: sum(1 for c in docs.values() if c[w] > 0) for w in BM25_TERMS}
    idf = {
        w: math.log(1.0 + ((float(n) - float(df[w])) + 0.5) / (float(df[w]) + 0.5))
        for w in BM25_TERMS
    }

    def score(d):
        s = None
        for w in BM25_TERMS:
            tf = float(docs[d][w])
            tj = idf[w] * (
                (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dls[d] / avgdl)))
            )
            s = tj if s is None else s + tj
        return math.floor(s * 1000000.0)

    want = sorted(((-score(d), d) for d in docs))[:BM25_TOPK]
    got = q_bm25(SF).to_pandas().sort_values(
        ["bm25_micro", "doc_id"], ascending=[False, True]
    )
    assert len(got) == len(want)
    for (neg_micro, doc_id), (_, row) in zip(want, got.iterrows()):
        assert int(row["doc_id"]) == doc_id and int(row["bm25_micro"]) == -neg_micro


def test_epoch_mix_semantics(ray_session):
    """Factors, epoch ranges and shard spreading of the repeat
    upsampler, checked independently of the SQL oracle."""
    import duckdb

    from textpipe_ray.pipelines.queries import (
        EPOCH_MIX_MAX_FACTOR,
        EPOCH_MIX_TARGET,
        q_epoch_mix,
    )

    df = q_epoch_mix(SF).to_pandas()
    n = duckdb.sql(
        f"select source, count(*) n from read_parquet('{SF}/documents.parquet') group by 1"
    ).fetchdf().set_index("source")["n"]
    for source, g in df.groupby("source"):
        f = min(max(EPOCH_MIX_TARGET // int(n[source]), 1), EPOCH_MIX_MAX_FACTOR)
        assert len(g) == f * int(n[source])
        per_doc = g.groupby("doc_id")["epoch"]
        assert (per_doc.min() == 0).all() and (per_doc.max() == f - 1).all()
    # replicas of one doc spread across shards (the reason epoch is in
    # the shard key)
    multi = df.groupby("doc_id")["shard"].nunique()
    assert (multi > 1).any()


def test_bitext_mine_mutual_best_numpy(ray_session):
    """q_bitext_mine vs an independent dense-numpy mutual-best (single
    full matmul — a different compute path from both the sharded Ray
    scan and the SQL cross join)."""
    import numpy as np
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import BITEXT_MIN_COS_Q, q_bitext_mine

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    a, b = ids % 2 == 0, ids % 2 == 1
    aid, bid = ids[a], ids[b]
    am, bm = emb[a], emb[b]
    an = np.sqrt((am * am).sum(1)); bn = np.sqrt((bm * bm).sum(1))
    q = np.floor((am @ bm.T) / np.outer(an, bn) * 1e9).astype(np.int64)
    # max-q min-id argbest per row/col
    def argbest(qm, cand_ids, axis):
        order = np.argsort(cand_ids)
        qs = np.take(qm, order, axis=axis)
        best = qs.argmax(axis=axis)  # first max = min id after sorting ids asc
        return cand_ids[order[best]]
    best_b = argbest(q, bid, 1)
    best_a = argbest(q, aid, 0)
    want = set()
    bpos = {int(v): i for i, v in enumerate(bid)}
    apos = {int(v): i for i, v in enumerate(aid)}
    for i, sa in enumerate(aid):
        tb = int(best_b[i])
        if int(best_a[bpos[tb]]) == int(sa) and q[i, bpos[tb]] >= BITEXT_MIN_COS_Q:
            want.add((int(sa), tb))
    got = {(int(r.src_id), int(r.tgt_id)) for r in q_bitext_mine(SF).to_pandas().itertuples()}
    assert got == want and len(want) > 0


def test_keeper_selection_invariants(ray_session):
    """Structural invariants against q_dup_clusters: same (doc_id, root)
    cover, exactly one keeper per cluster, the keeper maximizes
    (n_words, -doc_id), and every member points at the same keeper."""
    from textpipe_ray.pipelines.queries import q_dup_clusters, q_keeper_selection

    ks = q_keeper_selection(SF).to_pandas()
    cl = q_dup_clusters(SF).to_pandas()
    assert set(zip(ks.doc_id, ks.root)) == set(zip(cl.doc_id, cl.root))
    for root, g in ks.groupby("root"):
        assert g.is_keeper.sum() == 1
        assert g.keeper_id.nunique() == 1
        keeper = g[g.is_keeper].iloc[0]
        best = g.sort_values(["n_words", "doc_id"], ascending=[False, True]).iloc[0]
        assert keeper.doc_id == best.doc_id == g.keeper_id.iloc[0]


def test_link_graph_independent_parity(ray_session):
    """q_link_graph vs an independent split-based HTML link parser (no
    regex) aggregated with plain dict counters — a different parse and
    a different aggregation path from both the Ray plan and the golden
    generator."""
    import glob
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import pages_dir_for, q_link_graph

    pages = pages_dir_for(SF)
    per_target: dict[str, Counter] = defaultdict(Counter)
    for f in sorted(glob.glob(f"{pages}/pages-*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            host = url.split("://", 1)[1].split("/", 1)[0]
            for seg in html.decode("utf8").split('<a href="')[1:]:
                href, rest = seg.split('"', 1)
                anchor = rest.split(">", 1)[1].split("</a>", 1)[0]
                if href.startswith("/"):
                    per_target[f"https://{host}{href}"][anchor] += 1
                elif href.startswith(("http://", "https://")):
                    per_target[href][anchor] += 1
    got = q_link_graph(SF).to_pandas().set_index("target").sort_index()
    assert len(got) == len(per_target) > 0
    for target, counts in per_target.items():
        row = got.loc[target]
        assert row.in_degree == sum(counts.values())
        assert row.n_anchors == len(counts)
        # max count, ties -> lexicographically smallest anchor
        top = min((a for a, c in counts.items() if c == max(counts.values())))
        assert row.top_anchor == top and row.top_anchor_n == counts[top]


def test_pagerank_independent_parity(ray_session):
    """q_pagerank vs a dict-based single-process power iteration that
    follows the same integer contract — exact rank equality proves the
    distributed join/groupby plan implements the arithmetic spec."""
    import glob
    from collections import defaultdict

    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import (
        PAGERANK_D_DEN,
        PAGERANK_D_NUM,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        iter_page_links,
        pages_dir_for,
        q_pagerank,
    )

    pages = pages_dir_for(SF)
    edges: set = set()
    for f in sorted(glob.glob(f"{pages}/pages-*.parquet")):
        t = pq.read_table(f, columns=["url", "html"])
        for src, tgt, _a in iter_page_links(
            t.column("url").to_pylist(), t.column("html").to_pylist()
        ):
            edges.add((src, tgt))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    outdeg = defaultdict(int)
    indeg = defaultdict(int)
    for s, t in edges:
        outdeg[s] += 1
        indeg[t] += 1
    n = len(nodes)
    rank = {v: PAGERANK_SCALE // n for v in nodes}
    teleport = PAGERANK_SCALE * (PAGERANK_D_DEN - PAGERANK_D_NUM) // (PAGERANK_D_DEN * n)
    for _ in range(PAGERANK_ITERS):
        dangling = sum(r * PAGERANK_D_NUM // PAGERANK_D_DEN for v, r in rank.items() if outdeg[v] == 0)
        base = teleport + dangling // n
        inflow = defaultdict(int)
        for s, t in edges:
            inflow[t] += rank[s] * PAGERANK_D_NUM // (PAGERANK_D_DEN * outdeg[s])
        rank = {v: base + inflow[v] for v in nodes}
    got = q_pagerank(SF).to_pandas()
    assert len(got) == n
    for r in got.itertuples():
        assert rank[r.node] == r.rank_units, r.node
        assert outdeg[r.node] == r.out_degree and indeg[r.node] == r.in_degree


def test_validate_pk_rule_finds_planted_duplicates(ray_session):
    """The uniqueness rule must report the REAL duplicate surplus of the
    fixture's (l_orderkey, l_linenumber) key — a nonzero count, so the
    violation path is exercised, not vacuously green."""
    import duckdb

    from textpipe_ray.pipelines.queries import q_validate

    df = q_validate(SF).set_index("rule")
    truth = duckdb.sql(
        f"""SELECT CAST(COALESCE(sum(c - 1), 0) AS BIGINT), min(k1) FROM (
              SELECT l_orderkey k1, l_linenumber k2, count(*) c
              FROM '{SF}/lineitem.parquet' GROUP BY 1, 2) WHERE c > 1"""
    ).fetchone()
    row = df.loc["lineitem_pk_unique"]
    assert row.n_violations == truth[0] > 0
    assert row.sample_key == truth[1]
    # row-local rules all checked the full table
    assert (df.n_checked > 0).all()


def test_time_layout_prunes_partitions(ray_session, tmp_path):
    """The date layout must hold every calendar day as its own
    partition and the range query must open strictly fewer of them —
    file-level pruning on the time axis, plus result parity via the
    persisted-path variant."""
    import glob

    from textpipe_ray.pipelines.queries import (
        TIME_LAYOUT_END,
        TIME_LAYOUT_START,
        q_time_layout,
    )

    path = str(tmp_path / "bydays")
    got = q_time_layout(SF, layout_path=path).to_pandas()
    days_on_disk = sorted(
        p.rsplit("=", 1)[1] for p in glob.glob(f"{path}/day=*")
    )
    in_range = [d for d in days_on_disk if TIME_LAYOUT_START <= d < TIME_LAYOUT_END]
    assert len(days_on_disk) == 30
    assert len(in_range) == 7
    assert got["n"].sum() > 0
    # re-run hygiene: write_parquet appends into existing day= dirs, so
    # a second build into the same layout_path must clear them first or
    # the pruned scan double-counts
    again = q_time_layout(SF, layout_path=path).to_pandas()
    assert again["n"].sum() == got["n"].sum()
    assert again["sum_value_cents"].sum() == got["sum_value_cents"].sum()


def test_compress_ratio_band_and_extremes(ray_session):
    """The entropy filter's keep flag must follow the declared milli
    band exactly, normal prose must mostly pass, and the zlib kernel
    must actually separate the extremes the filter exists to catch."""
    import zlib

    from textpipe_ray.pipelines.queries import (
        COMPRESS_HIGH_MILLI,
        COMPRESS_LEVEL,
        COMPRESS_LOW_MILLI,
        COMPRESS_MIN_BYTES,
        q_compress_ratio,
    )

    df = q_compress_ratio(SF).to_pandas()
    assert len(df) == 500
    assert (df["ratio_milli"] > 0).all()
    # keep = in-band OR too short to judge (zlib overhead dominates)
    import duckdb as _dd

    nb = dict(
        _dd.sql(
            f"SELECT doc_id, octet_length(encode(text)) FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    short = df["doc_id"].map(nb) < COMPRESS_MIN_BYTES
    band = (df["ratio_milli"] >= COMPRESS_LOW_MILLI) & (
        df["ratio_milli"] <= COMPRESS_HIGH_MILLI
    )
    assert (df["keep"] == (band | short)).all()
    assert (df.loc[short, "drop_reason"] == "").all()  # abstains, never drops
    assert df["keep"].mean() > 0.5  # synthetic prose is not junk
    rep = b"spam " * 2000
    assert 1000 * len(zlib.compress(rep, COMPRESS_LEVEL)) // len(rep) < COMPRESS_LOW_MILLI
    import os

    rnd = os.urandom(8192)
    assert 1000 * len(zlib.compress(rnd, COMPRESS_LEVEL)) // len(rnd) > COMPRESS_HIGH_MILLI


def test_drift_semantics(ray_session, tmp_path):
    """TVD in micro units: identical snapshots → 0 on a table where A
    and B coincide; a planted hard shift → large TVD + drifted flag."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines import queries as Q

    # doc_id ≡ 1 (mod 3) rows are in BOTH snapshots; (mod CDC_CHANGE_MOD)
    # never 0 keeps B's text identical to A's → every bucket has
    # n_a == n_b and TVD must be exactly 0
    ids = [i for i in range(1, 400, 3) if i % Q.CDC_CHANGE_MOD != 0][:100]
    same = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"steady page {i} " + "w " * (i % 50) for i in ids]),
        }
    )
    d = tmp_path / "same"
    d.mkdir()
    pq.write_table(same, d / "documents.parquet")
    out = Q.q_drift(str(d)).to_pandas()
    assert (out["n_a"] == out["n_b"]).all()
    assert (out["tvd_micro"] == 0).all()
    assert (~out["drifted"]).all()

    # planted shift: A-only rows (doc_id % 3 == 0, % CDC_CHANGE_MOD != 0)
    # short, B-only rows (doc_id % 3 == 2) long → char/word histograms
    # separate almost completely and both features must flag
    rows, texts = [], []
    for i in range(2, 600):
        if i % 3 == 0 and i % Q.CDC_CHANGE_MOD != 0:
            rows.append(i)
            texts.append("tiny")
        elif i % 3 == 2:
            rows.append(i)
            texts.append("long document " + "word " * 500)
    shift = pa.table(
        {"doc_id": pa.array(rows, pa.int64()), "text": pa.array(texts)}
    )
    d2 = tmp_path / "shift"
    d2.mkdir()
    pq.write_table(shift, d2 / "documents.parquet")
    out2 = Q.q_drift(str(d2)).to_pandas()
    per_feat = out2.groupby("feature")["tvd_micro"].first()
    assert (per_feat >= 900_000).all(), per_feat  # near-total separation
    assert out2["drifted"].all()


def test_drift_empty_snapshot_alarms(ray_session, tmp_path):
    """One empty snapshot is MAXIMAL drift (true TVD = 1), not the 0/0
    degenerate of the formula — both engines must alarm."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines import queries as Q
    from textpipe_ray.pipelines.oracle import build_oracle_sql

    ids = [i for i in range(2, 300) if i % 3 == 2]  # snapshot A is empty
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"only in b {i} " + "w " * (i % 30) for i in ids]),
        }
    )
    d = tmp_path / "bonly"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = Q.q_drift(str(d)).to_pandas()
    assert (out["n_a"] == 0).all()
    assert (out["tvd_micro"] == 1_000_000).all()
    assert out["drifted"].all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = con.execute(build_oracle_sql()["q_drift"]).fetchdf()
    assert (odf["tvd_micro"] == 1_000_000).all()
