"""Regenerate the committed golden tables for model-scored /
non-SQL-expressible queries.

The driver value-checks every ``oracle_sql()`` entry by running its SQL
in DuckDB; operators DuckDB cannot express (langid, perplexity, minhash
digests, LSH pair sets, the flagship pipeline) get a *golden-parquet*
oracle instead: their deterministic output at each test scale is
committed under ``goldens/`` and the oracle SQL simply reads the right
file back, discriminated by a content hash of the input's first
document (sf0.001 and sf0.01 have equal row counts, so a count can't
tell them apart).  This moves those queries from a rows-only check to a
full value-hash check — any regression in the kernels flips the driver
gate.

RUN THIS after intentionally changing any kernel/model these queries
depend on, and commit the result:

    python scripts/make_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN_QUERIES = [
    "q_langid",
    "q_kmeans",
    "q_langid_eval",
    "q_markup_density",
    "q_token_fertility",
    "q_perplexity",
    "q_minhash",
    "q_simhash",
    "q_simhash_neardup",
    "q_ann_ivf",
    "q_embedding_neardup",
    "q_pages_flagship",
    "q_pages_neardup",
    "q_pages_dedup",
    "q_textpipe_ops",
    "q_media_features",
    "q_host_stats",
    "q_paragraph_filter",
    "q_boilerplate_dedup",
    "q_ppl_buckets",
    "q_url_filter",
    "q_robots_filter",
    "q_media_phash_dedup",
    "q_url_dedup",
    "q_corpus_release",
    "q_dsir",
    "q_embedding_pca",
    "q_video_dedup",
    "q_audio_dedup",
    "q_para_ppl",
    "q_incremental_dedup",
    "q_distinct_sketch",
    "q_doc_vectors",
    "q_bloom_dedup",
    "q_bpe_train",
    "q_unigram_lm",
    "q_semdedup",
    "q_classifier_train",
    "q_substring_dedup",
    "q_snapshot_loop",
    "q_ann_ivf_layout",
    "q_heavy_hitters",
    "q_ann_ivf_append",
    "q_link_graph",
    "q_crawl_frontier",
    "q_pagerank",
    "q_compress_ratio",
    "q_lsh_recall",
    "q_vocab_coverage",
    "q_ann_pq",
    "q_trained_models",
]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# how the oracle SQL recognises which sf it is running against
DISCRIMINATOR_SQL = (
    "(SELECT md5(text) FROM documents WHERE doc_id = (SELECT min(doc_id) FROM documents))"
)


def input_key(sf_dir: str) -> str:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.execute(f"SELECT {DISCRIMINATOR_SQL}").fetchone()[0]


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib

    from textpipe_ray.pipelines.compare import to_pandas

    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()

    # --only q_a,q_b regenerates a subset (new queries) without touching
    # the other committed golden files; the manifest is merged
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    out_dir = REPO / "goldens"
    out_dir.mkdir(exist_ok=True)
    manifest: dict = {"discriminator_sql": DISCRIMINATOR_SQL, "queries": {}}
    manifest_path = out_dir / "manifest.json"
    if only and manifest_path.exists():
        with open(manifest_path, "r", encoding="utf8") as f:
            manifest = json.load(f)
        for name in only:
            manifest["queries"].pop(name, None)
    for sf_dir in SF_DIRS:
        key = input_key(sf_dir)
        for name in GOLDEN_QUERIES:
            if only and name not in only:
                continue
            df = to_pandas(qs[name](sf_dir))
            fn = f"{name}-{key[:8]}.parquet"
            df.to_parquet(out_dir / fn, index=False)
            manifest["queries"].setdefault(name, []).append(
                {"input_md5": key, "file": fn, "sf_dir": sf_dir, "rows": len(df)}
            )
            print(f"{sf_dir} {name}: {len(df)} rows -> goldens/{fn}")
    with open(manifest_path, "w", encoding="utf8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
