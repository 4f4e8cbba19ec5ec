"""Generate the committed keyed-vectors model for q_doc_vectors
(models/custom/doc_vectors.json).

A deterministic KeyedVectors-style table (the reference's
``Doc._load_gensim_word2vec_model`` file path, doc.py:604-639): the 400
most frequent word tokens of the sf0.001 documents corpus, each with a
16-dim vector seeded from a blake2b of ``docvec:<word>`` — a DIFFERENT
seed namespace from functions/vectors._hash_vector, so registered
vectors are distinguishable from the OOV fallback in tests.  Counts are
the corpus frequencies (the gensim ``nr_train_tokens`` idf inputs).

Rerun + recommit only if the vocabulary policy changes:

    python scripts/make_docvec_model.py
"""

from __future__ import annotations

import json
import hashlib
import re
from collections import Counter
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
SF = "/root/testdata/sf0.001"
DIM = 16
VOCAB = 20  # of ~31 distinct corpus tokens: leaves real OOV traffic for the fallback path
WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def main() -> None:
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    ]
    counts = Counter()
    for t in texts:
        counts.update(w.lower() for w in WORD_RE.findall(t or ""))
    # (count desc, token asc) — fully deterministic vocabulary cut
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB]

    vectors = {}
    for w, _ in vocab:
        seed = int.from_bytes(
            hashlib.blake2b(f"docvec:{w}".encode("utf8"), digest_size=4).digest(),
            "little",
        )
        v = np.random.RandomState(seed).standard_normal(DIM)
        # round to 6 decimals: keeps the JSON small, values still float64-exact
        vectors[w] = [round(float(x), 6) for x in v]

    obj = {
        "type": "keyed_vectors",
        "dim": DIM,
        "vectors": dict(sorted(vectors.items())),
        "counts": {w: int(c) for w, c in sorted(vocab)},
    }
    out = REPO / "models" / "custom" / "doc_vectors.json"
    with open(out, "w", encoding="utf8") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    print(f"{out}: {len(vectors)} words, dim {DIM}")


if __name__ == "__main__":
    main()
