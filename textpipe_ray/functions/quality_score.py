"""Linear quality classifier (fasttext-style distillation of the rule
set into one dot product).

The reference has no learned quality model; large-scale pipelines
usually do (a linear / fasttext classifier over cheap features — cf.
CCNet / Gopher quality filtering).  Here the committed model
``models/quality_weights.json`` is a logistic regression DISTILLED from
this repo's own rule-based keep/drop labels over the synthetic page
generator (deterministic: fixed seed, fixed iteration count, float64).

Because the model is linear over features that are already bit-exactly
mirrored in the DuckDB oracle (see oracle.feature_select_list), the
score itself is SQL-expressible: both engines evaluate the SAME
left-nested chain ``(((bias + w0*x0) + w1*x1) + ...)`` in IEEE float64,
so the resulting doubles are bit-identical — a fully value-checked
"model inference" operator, no golden files needed.

``SCORE_FEATURES`` fixes the fold order for both sides.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

_F64 = pa.float64()

# fold order shared by score_batch (Arrow) and score_sql_expr (DuckDB)
SCORE_FEATURES = [
    "nwords",
    "nsents",
    "n_long_words",
    "alpha_ratio",
    "digit_ratio",
    "upper_ratio",
    "symbol_ratio",
    "stopword_ratio",
    "mean_word_len",
]

WEIGHTS_PATH = Path(__file__).resolve().parents[2] / "models" / "quality_weights.json"


def load_weights(path: str | Path = WEIGHTS_PATH) -> dict:
    with open(path, "r", encoding="utf8") as f:
        w = json.load(f)
    assert w["features"] == SCORE_FEATURES, "model/feature-order drift"
    return w


def score_batch(batch: pa.Table, weights: dict) -> pa.Array:
    """``(((bias + w0*x0) + w1*x1) + ...)`` over float64 columns, in
    exactly the order of SCORE_FEATURES — the same IEEE operation
    sequence the oracle SQL performs, hence bit-identical doubles."""
    acc = None
    for name in SCORE_FEATURES:
        term = pc.multiply(
            pc.cast(batch.column(name), _F64), pa.scalar(weights["weights"][name], _F64)
        )
        if acc is None:
            acc = pc.add(pa.scalar(weights["bias"], _F64), term)
        else:
            acc = pc.add(acc, term)
    return acc


def score_sql_expr(weights: dict) -> str:
    """The DuckDB mirror of :func:`score_batch`.  ``repr(float)`` is
    shortest-round-trip, so DuckDB parses back the identical double."""
    expr = None
    for name in SCORE_FEATURES:
        term = f"{weights['weights'][name]!r} * CAST({name} AS DOUBLE)"
        expr = f"({weights['bias']!r} + {term})" if expr is None else f"({expr} + {term})"
    return expr


def train(n_pages: int = 2000, seed: int = 1234, iters: int = 400, lr: float = 0.5) -> dict:
    """Distil the rule-based keep label into logistic weights.

    Deterministic: seeded page generation, zero-init weights, fixed
    iteration count, float64 throughout.  Features are standardized for
    conditioning, then the standardization is folded back into the
    weights so inference is a single raw-feature dot product.
    """
    import numpy as np

    from textpipe_ray.sources.pages import generate_pages
    from textpipe_ray.stages.text import clean_batch, quality_batch

    tbl = generate_pages(n_pages, seed=seed)
    tbl = clean_batch(tbl, source_col="html", out_col="clean")
    tbl = quality_batch(tbl, text_col="clean")

    X = np.column_stack(
        [np.asarray(tbl.column(f), dtype=np.float64) for f in SCORE_FEATURES]
    )
    y = np.asarray(tbl.column("keep")).astype(np.float64)

    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0.0] = 1.0
    Z = (X - mu) / sd

    w = np.zeros(Z.shape[1])
    b = 0.0
    n = float(len(y))
    for _ in range(iters):
        z = Z @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (Z.T @ g) / n
        b -= lr * g.sum() / n

    raw_w = w / sd
    raw_b = float(b - (w * mu / sd).sum())
    acc = float((((X @ raw_w + raw_b) > 0) == (y > 0.5)).mean())
    return {
        "features": SCORE_FEATURES,
        "weights": {f: float(raw_w[i]) for i, f in enumerate(SCORE_FEATURES)},
        "bias": raw_b,
        "train_accuracy": acc,
        "train_pages": n_pages,
        "seed": seed,
    }


if __name__ == "__main__":
    model = train()
    with open(WEIGHTS_PATH, "w", encoding="utf8") as f:
        json.dump(model, f, ensure_ascii=False, sort_keys=True, indent=1)
    print(f"wrote {WEIGHTS_PATH} (train acc {model['train_accuracy']:.4f})")
