"""Semantic tests for the training-mix shaping operators — invariants
the golden/oracle parity checks don't spell out."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_lang_temperature_keeps_rarest_language_fully(ray_session):
    """The rarest language has keep-rate exactly 1000 millis — every one
    of its documents survives; over-represented languages shrink."""
    import duckdb

    from textpipe_ray.pipelines.queries import q_lang_temperature

    kept = q_lang_temperature(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    totals = dict(
        con.execute("SELECT lang, count(*) FROM documents GROUP BY lang").fetchall()
    )
    kept_by_lang = kept.groupby("lang").size().to_dict()
    rarest = min(totals, key=totals.get)
    assert kept_by_lang[rarest] == totals[rarest]
    biggest = max(totals, key=totals.get)
    if totals[biggest] > totals[rarest]:
        assert kept_by_lang.get(biggest, 0) < totals[biggest]
    # expected rate reproduced from the formula for every language
    n_min = totals[rarest]
    for lang, n in totals.items():
        rate = min(1000, int(np.floor(1000.0 * np.sqrt(np.float64(n_min) / np.float64(n)))))
        # hash-threshold sampling is exact-in-expectation, not per-lang
        # exact; but rate==1000 must mean all kept, rate<1000 not more
        # than n kept
        if rate == 1000:
            assert kept_by_lang.get(lang, 0) == n


def test_boilerplate_dedup_removes_planted_dup_paragraphs(ray_session):
    """Pages planted as exact duplicates share every eligible paragraph
    with their source page — after the scrub both lose those
    paragraphs; unique-paragraph pages are untouched."""
    import collections

    from textpipe_ray.functions.clean import html_to_paragraphs
    from textpipe_ray.pipelines.queries import (
        BOILER_MIN_WORDS,
        boiler_word_counts,
        pages_dir_for,
        q_boilerplate_dedup,
    )

    import glob

    import pyarrow.parquet as pq

    out = q_boilerplate_dedup(SF).to_pandas().set_index("url")

    files = sorted(glob.glob(pages_dir_for(SF) + "/pages-*.parquet"))
    t = pq.read_table(files, columns=["url", "html"])
    counts: collections.Counter = collections.Counter()
    per_page: dict[str, list[str]] = {}
    for url, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        all_paras = html_to_paragraphs(h.decode("utf8"))
        # same eligibility definition as the pipeline (RE2 \S+, not
        # Python str.split()'s Unicode whitespace)
        wc = boiler_word_counts(all_paras)
        paras = [p for p, n in zip(all_paras, wc) if n >= BOILER_MIN_WORDS]
        per_page[url] = paras
        counts.update(set())  # keep type checkers honest
        for p in paras:
            counts[p] += 1

    for url, paras in per_page.items():
        expect_kept_missing = [p for p in paras if counts[p] > 1]
        row = out.loc[url]
        if expect_kept_missing:
            assert row.n_kept_paras < row.n_paras, url
            for p in expect_kept_missing:
                assert p not in row.boiler_free_text.split("\n"), (url, p[:40])
        # every unique eligible paragraph must survive
        for p in paras:
            if counts[p] == 1:
                assert p in row.boiler_free_text.split("\n"), (url, p[:40])


def test_ppl_buckets_are_ordered_and_balanced(ray_session):
    """Within every language: every head doc has perplexity <= every
    middle doc <= every tail doc, and the three buckets are within one
    quantile step of a third each."""
    from textpipe_ray.pipelines.queries import q_ppl_buckets

    df = q_ppl_buckets(SF).to_pandas()
    assert set(df.bucket) == {"head", "middle", "tail"}
    for lang, g in df.groupby("lang"):
        h = g[g.bucket == "head"].ppl_centi
        m = g[g.bucket == "middle"].ppl_centi
        t = g[g.bucket == "tail"].ppl_centi
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()
        n = len(g)
        # tertiles: no bucket may exceed a third by more than the mass
        # tied at the threshold value
        for part in (h, m, t):
            assert len(part) <= n // 3 + int((g.ppl_centi.value_counts().max())), lang


def test_para_ppl_keeps_exactly_below_threshold(ray_session):
    """Every kept paragraph recomputes to centi-ppl <= threshold, every
    dropped one to > threshold, and reassembly preserves order."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from textpipe_ray.functions.clean import html_to_paragraphs
    from textpipe_ray.functions.perplexity import PerplexityModel
    from textpipe_ray.pipelines.queries import (
        PARA_PPL_MAX_CENTI,
        pages_dir_for,
        q_para_ppl,
    )

    out = q_para_ppl(SF).to_pandas().set_index("url")
    model = PerplexityModel.load()

    files = sorted(glob.glob(pages_dir_for(SF) + "/pages-*.parquet"))
    t = pq.read_table(files, columns=["url", "html", "lang"])
    checked_drops = 0
    for url, h, lg in list(zip(
        t.column("url").to_pylist(), t.column("html").to_pylist(), t.column("lang").to_pylist()
    ))[:80]:
        paras = html_to_paragraphs(h.decode("utf8"))
        if not paras:
            continue
        centi = np.floor(
            model.perplexity_many(paras, [lg or "en"] * len(paras)) * 100
        ).astype(np.int64)
        expect_kept = [p for p, c in zip(paras, centi) if c <= PARA_PPL_MAX_CENTI]
        row = out.loc[url]
        assert row.n_paras == len(paras), url
        assert row.n_kept_paras == len(expect_kept), url
        got = row.filtered_text.split("\n") if row.filtered_text else []
        assert got == expect_kept, url  # order preserved, exact set
        checked_drops += len(paras) - len(expect_kept)
    assert checked_drops > 0  # the threshold actually fires on this corpus


def test_hll_sketch_error_bound_and_batch_independence(ray_session):
    """HLL registers: <5% relative error at 100k-scale cardinality
    (sigma is ~1.6% at 2^12 registers), exact in the linear-counting
    regime, and the merged estimate is independent of how the hashes
    are split into partial batches."""
    import numpy as np
    import pyarrow as pa

    from textpipe_ray.functions.strhash import hash64_mixed
    from textpipe_ray.pipelines.queries import _hll_estimate, _hll_registers

    toks = [f"tok{i}" for i in range(100_000)]
    h = hash64_mixed(pa.array(toks, pa.string()))
    est = _hll_estimate(_hll_registers(h))
    assert abs(est - 100_000) / 100_000 < 0.05, est

    # small range: linear counting (register collisions make it
    # near-exact, not exact — 200 keys over 4096 registers)
    small = hash64_mixed(pa.array([f"w{i}" for i in range(200)], pa.string()))
    assert abs(_hll_estimate(_hll_registers(small)) - 200) <= 5

    # merging per-batch partials == one-shot registers, for any split
    for nsplits in (2, 7, 31):
        parts = np.array_split(h, nsplits)
        merged = np.maximum.reduce([_hll_registers(p) for p in parts])
        assert _hll_estimate(merged) == est

    # duplicate tokens never move the estimate
    dup = hash64_mixed(pa.array(toks + toks[:5000], pa.string()))
    assert _hll_estimate(_hll_registers(dup)) == est


def test_distinct_sketch_matches_exact_on_corpus(ray_session):
    """On the synthetic corpus (tiny vocab → linear-counting regime) the
    sketch equals the exact per-lang distinct counts."""
    import duckdb

    from textpipe_ray.functions.quality import RE2_PATTERNS
    from textpipe_ray.pipelines.queries import q_distinct_sketch

    df = q_distinct_sketch(SF).to_pandas()
    pat = RE2_PATTERNS["nwords"].replace("'", "''")
    exact = duckdb.sql(
        f"""select lang, count(distinct tok) n from (
              select lang, unnest(regexp_extract_all(lower(text), '{pat}')) tok
              from read_parquet('{SF}/documents.parquet')) group by lang order by lang"""
    ).df()
    mg = df.merge(exact, on="lang")
    assert (mg["distinct_est"] == mg["n"]).all(), mg


def test_repetition_rules_planted_values(ray_session, tmp_path):
    """Hand-computed Gopher repetition fractions: a pathological
    alternating doc fails every rule at exactly-known milli values; a
    long all-distinct doc passes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import q_repetition_rules

    distinct = " ".join(f"w{i}" for i in range(40))  # 40 distinct words, 110 chars
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b a b a b", distinct], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = (
        q_repetition_rules(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: wchars=6; top bigram "a b"×3 → 3·2·1000//6 = 1000;
    # trigram "a b a"×2 → 2·3·1000//6 = 1000; 4-gram "a b a b"×2 →
    # 2·4·1000//6 = 1333; all 5 bigram instances are duplicates → 1000
    r1 = out.loc[1]
    assert r1.top2_milli == 1000 and r1.top3_milli == 1000
    assert r1.top4_milli == 1333 and r1.dup2_milli == 1000
    assert not r1.keep and r1.drop_reason == "top2"  # first failing rule
    # doc 2: every gram unique; heaviest bigram is two len-3 words →
    # 6·1000//110 = 54; heaviest 4-gram 12·1000//110 = 109 ≤ 160
    r2 = out.loc[2]
    assert r2.top2_milli == 54 and r2.top4_milli == 109 and r2.dup2_milli == 0
    assert r2.keep and r2.drop_reason == ""
