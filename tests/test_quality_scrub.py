"""Three-engine parity: the RE2 feature patterns evaluated scalar
(python-regex), vectorized (pyarrow.compute) and in DuckDB must agree
exactly — this is the foundation of the driver's oracle gate."""

import duckdb
import pyarrow as pa

from textpipe_ray.functions.quality import (
    keep_rule,
    load_thresholds,
    quality_features,
)
from textpipe_ray.functions.scrub import Scrubber
from textpipe_ray.pipelines.oracle import (
    clean_norm_expr,
    drop_reason_expr,
    feature_select_list,
    keep_expr,
    ratio_select_list,
    scrub_ctes,
)
from textpipe_ray.stages.text import normalize_batch, quality_batch, scrub_batch

SAMPLES = [
    "The history of science shows that simple models are often the most useful ones.",
    "short",
    "",
    "xq ztvp 99 22 11 $$$ ###",
    "Contact a@b.com or +1 (555) 123-4567 you idiot …and “quotes„ here",
    "UPPER CASE TEXT WITH THE WORDS AND 12345 NUMBERS.",
    "word " * 50,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa supercalifragilisticexpialidocious x",
]


def _table():
    return pa.table({"doc_id": list(range(len(SAMPLES))), "text": SAMPLES})


def _duck():
    con = duckdb.connect()
    con.register("documents", _table())
    return con


def test_scalar_vs_arrow_features():
    batch = quality_batch(_table(), text_col="text")
    for i, s in enumerate(SAMPLES):
        f = quality_features(s)
        for k, v in f.items():
            assert float(batch.column(k)[i].as_py()) == float(v), (i, k)
        t = load_thresholds()
        assert batch.column("keep")[i].as_py() == keep_rule(f, t), i


def test_arrow_vs_duckdb_features():
    t = load_thresholds()
    batch = quality_batch(_table(), text_col="text")
    feats = ", ".join(feature_select_list("text"))
    ratios = ", ".join(ratio_select_list())
    sql = f"""WITH f AS (SELECT doc_id, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f)
SELECT *, {keep_expr(t)} AS keep, {drop_reason_expr(t)} AS drop_reason FROM r ORDER BY doc_id"""
    df = _duck().execute(sql).fetchdf()
    for col in df.columns:
        if col == "doc_id":
            continue
        arrow_vals = [batch.column(col)[i].as_py() for i in range(len(SAMPLES))]
        duck_vals = list(df[col])
        assert [float(a) if isinstance(a, (int, float)) else a for a in arrow_vals] == [
            float(d) if isinstance(d, (int, float)) else d for d in duck_vals
        ], col


def test_scrub_three_engines():
    # scalar
    s = Scrubber()
    scrubbed_scalar = [s.scrub(x)[0] for x in SAMPLES]
    # arrow
    batch = scrub_batch(_table(), text_col="text")
    scrubbed_arrow = batch.column("scrubbed_text").to_pylist()
    assert scrubbed_scalar == scrubbed_arrow
    # duckdb
    ctes, last, carried = scrub_ctes("documents")
    df = (
        _duck()
        .execute(f"{ctes} SELECT doc_id, {', '.join(carried)}, t FROM {last} ORDER BY doc_id")
        .fetchdf()
    )
    assert list(df["t"]) == scrubbed_arrow
    for c in carried:
        assert list(df[c]) == [batch.column(c)[i].as_py() for i in range(len(SAMPLES))], c


def test_scrub_semantics():
    s = Scrubber()
    text = "mail a.b@c.io card 1234 5678 9012 3456 ip 10.0.0.1 ssn 123-45-6789 <<Name>>"
    out, counts = s.scrub(text)
    assert counts["email"] == 1 and counts["credit_card"] == 1
    assert counts["ip"] == 1 and counts["ssn"] == 1 and counts["placeholder"] == 1
    assert "<EMAIL>" in out and "<CC>" in out and "<<Name>>" not in out


def test_normalize_vs_duckdb():
    batch = normalize_batch(_table(), text_col="text")
    df = (
        _duck()
        .execute(f"SELECT doc_id, {clean_norm_expr('text')} AS clean FROM documents ORDER BY doc_id")
        .fetchdf()
    )
    assert batch.column("clean").to_pylist() == list(df["clean"])
