"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

No ``ray.init``/``ray.shutdown`` here or anywhere these callables
reach — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship quality-filter pipeline over the synthetic north-rule
    pages table at sf0.001 scale (extract → langid → perplexity →
    quality rules → PII/toxicity scrub → keep/drop)."""
    from textpipe_ray.pipelines import queries as Q

    return Q.q_pages_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from textpipe_ray.pipelines import queries as Q

    # Ordered by verification priority: the driver value-checks the
    # FIRST ~50 entries each round.  ROTATION POLICY (standing, round-3
    # advice): never-driver-checked queries outrank everything, then
    # queries whose code changed this round, then staleness (oldest
    # green row first).  The tail (>50) is ever-green and locally
    # re-checked every pytest run; test_rotation_policy enforces the
    # invariant.  Round-4 note: with all 50 round-4 slots green in
    # CORRECTNESS_r04, this round fronts the changed set + the round-2
    # block whose signal is 3 rounds old.
    return {
    # --- ROUND-5 WINDOW (the driver value-checks the FIRST ~50) ---
    # Tier A (changed or new this round): q_trained_models (new),
    # q_repetition_rules (oracle HUGEINT cast — the one red r4 row),
    # q_semdedup (refine_hot_cells), q_textpipe_ops (batched
    # op_minhash + op_entities tagger branch), q_pages_neardup /
    # q_pages_dedup (vectorized url-id pre), q_bitext_mine (join
    # sizing), then the three round-4-changed-but-r3-checked
    # pipelines (flagship approx_rows sizing, corpus_release,
    # host_stats) the round-4 advice asked to front.
        "q_trained_models": Q.q_trained_models,
        "q_repetition_rules": Q.q_repetition_rules,
        "q_semdedup": Q.q_semdedup,
        "q_textpipe_ops": Q.q_textpipe_ops,
        "q_pages_neardup": Q.q_pages_neardup,
        "q_pages_dedup": Q.q_pages_dedup,
        "q_bitext_mine": Q.q_bitext_mine,
        "q_pages_flagship": Q.q_pages_flagship,
        "q_corpus_release": Q.q_corpus_release,
        "q_host_stats": Q.q_host_stats,
    # Tier B: the 26-query block last driver-checked in ROUND 2 —
    # its signal is 3 rounds old, the stalest in the repo.
        "q_token_count": Q.q_token_count,
        "q_topk_per_group": Q.q_topk_per_group,
        "q_range_join": Q.q_range_join,
        "q_native_join": Q.q_native_join,
        "q_asof_join": Q.q_asof_join,
        "q_anti_join": Q.q_anti_join,
        "q_agg_lineitem": Q.q_agg_lineitem,
        "q_segment_orders": Q.q_segment_orders,
        "q_fingerprint": Q.q_fingerprint,
        "q_simhash": Q.q_simhash,
        "q_topk_docs": Q.q_topk_docs,
        "q_events_window": Q.q_events_window,
        "q_sessionize": Q.q_sessionize,
        "q_len_quantiles": Q.q_len_quantiles,
        "q_repetition": Q.q_repetition,
        "q_rolling_sum": Q.q_rolling_sum,
        "q_stratified_sample": Q.q_stratified_sample,
        "q_events_sliding": Q.q_events_sliding,
        "q_distinct_tokens": Q.q_distinct_tokens,
        "q_dup_stats": Q.q_dup_stats,
        "q_embedding_centroid": Q.q_embedding_centroid,
        "q_json_extract": Q.q_json_extract,
        "q_char_coverage": Q.q_char_coverage,
        "q_pii_stats": Q.q_pii_stats,
        "q_trigram_lm": Q.q_trigram_lm,
        "q_collocations": Q.q_collocations,
    # Tier C: round-3-checked fills (north-rule kernels first).
        "q_clean": Q.q_clean,
        "q_quality": Q.q_quality,
        "q_scrub": Q.q_scrub,
        "q_ann_topk": Q.q_ann_topk,
        "q_ann_ivf": Q.q_ann_ivf,
        "q_incremental_dedup": Q.q_incremental_dedup,
        "q_para_ppl": Q.q_para_ppl,
        "q_gopher_rules": Q.q_gopher_rules,
        "q_distinct_sketch": Q.q_distinct_sketch,
        "q_url_dedup": Q.q_url_dedup,
        "q_span_dedup": Q.q_span_dedup,
        "q_quality_percentile": Q.q_quality_percentile,
        "q_embedding_pca": Q.q_embedding_pca,
        "q_normalized_dedup": Q.q_normalized_dedup,
    # --- position >50: every query below has a committed green
    # driver row (r3/r4) and is value-checked EVERY pytest run via
    # the local oracle replica (test_query_matches_oracle runs all
    # 127); enforced by test_rotation_policy ---
        "q_budget_mix": Q.q_budget_mix,
        "q_dsir": Q.q_dsir,
        "q_chunk_dedup": Q.q_chunk_dedup,
        "q_funnel": Q.q_funnel,
        "q_shuffle_shards": Q.q_shuffle_shards,
        "q_url_filter": Q.q_url_filter,
        "q_boilerplate_dedup": Q.q_boilerplate_dedup,
        "q_paragraph_filter": Q.q_paragraph_filter,
        "q_ppl_buckets": Q.q_ppl_buckets,
        "q_lang_temperature": Q.q_lang_temperature,
        "q_domain_mix": Q.q_domain_mix,
        "q_contamination": Q.q_contamination,
        "q_pack_sequences": Q.q_pack_sequences,
        "q_train_split": Q.q_train_split,
        "q_media_phash_dedup": Q.q_media_phash_dedup,
        "q_video_dedup": Q.q_video_dedup,
        "q_audio_dedup": Q.q_audio_dedup,
        "q_media_features": Q.q_media_features,
        "q_langid": Q.q_langid,
        "q_perplexity": Q.q_perplexity,
        "q_minhash": Q.q_minhash,
        "q_simhash_neardup": Q.q_simhash_neardup,
        "q_embedding_neardup": Q.q_embedding_neardup,
        "q_exact_dedup": Q.q_exact_dedup,
        "q_ngram_jaccard": Q.q_ngram_jaccard,
        "q_token_freq": Q.q_token_freq,
        "q_tfidf_topk": Q.q_tfidf_topk,
        "q_lang_metrics": Q.q_lang_metrics,
        "q_quality_score": Q.q_quality_score,
        "q_complexity": Q.q_complexity,
        "q_kmeans": Q.q_kmeans,
        "q_pseudonymize": Q.q_pseudonymize,
        "q_domain_reweight": Q.q_domain_reweight,
        "q_unigram_lm": Q.q_unigram_lm,
        "q_k_anonymity": Q.q_k_anonymity,
        "q_crawl_frontier": Q.q_crawl_frontier,
        "q_lang_quantile_norm": Q.q_lang_quantile_norm,
        "q_code_detect": Q.q_code_detect,
        "q_langid_eval": Q.q_langid_eval,
        "q_markup_density": Q.q_markup_density,
        "q_token_fertility": Q.q_token_fertility,
        "q_citation_density": Q.q_citation_density,
        "q_robots_filter": Q.q_robots_filter,
        "q_nfc_normalize": Q.q_nfc_normalize,
        "q_ann_pq": Q.q_ann_pq,
        "q_drift": Q.q_drift,
        "q_rule_ablation": Q.q_rule_ablation,
        "q_skew_join": Q.q_skew_join,
        "q_wet_export": Q.q_wet_export,
        "q_lsh_recall": Q.q_lsh_recall,
        "q_vocab_coverage": Q.q_vocab_coverage,
        "q_dup_clusters": Q.q_dup_clusters,
        "q_bm25": Q.q_bm25,
        "q_ann_ivf_append": Q.q_ann_ivf_append,
        "q_epoch_mix": Q.q_epoch_mix,
        "q_keeper_selection": Q.q_keeper_selection,
        "q_link_graph": Q.q_link_graph,
        "q_pagerank": Q.q_pagerank,
        "q_profile": Q.q_profile,
        "q_validate": Q.q_validate,
        "q_rollup": Q.q_rollup,
        "q_pivot": Q.q_pivot,
        "q_bm25_layout": Q.q_bm25_layout,
        "q_bm25_append": Q.q_bm25_append,
        "q_time_layout": Q.q_time_layout,
        "q_cdc_diff": Q.q_cdc_diff,
        "q_compress_ratio": Q.q_compress_ratio,
        "q_heavy_hitters": Q.q_heavy_hitters,
        "q_quantile_sketch": Q.q_quantile_sketch,
        "q_snapshot_loop": Q.q_snapshot_loop,
        "q_ann_ivf_layout": Q.q_ann_ivf_layout,
        "q_substring_dedup": Q.q_substring_dedup,
        "q_filter_pr_curve": Q.q_filter_pr_curve,
        "q_classifier_train": Q.q_classifier_train,
        "q_doc_vectors": Q.q_doc_vectors,
        "q_bloom_dedup": Q.q_bloom_dedup,
        "q_bpe_train": Q.q_bpe_train,
    }


def oracle_sql() -> dict[str, str]:
    from textpipe_ray.pipelines.oracle import build_oracle_sql, golden_oracle_sql

    # SQL-expressible queries get true DuckDB oracles; deterministic
    # model/sketch/pipeline queries get committed golden-parquet oracles
    # (scripts/make_goldens.py) — value-checked either way
    return {**build_oracle_sql(), **golden_oracle_sql()}
