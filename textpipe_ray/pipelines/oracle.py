"""DuckDB oracle-SQL builders.

Each builder emits ANSI-ish SQL that DuckDB runs over the same parquet
tables as the Ray queries in ``pipelines/queries.py``.  Both sides are
generated from the SAME pattern/threshold constants
(functions/quality.py RE2_PATTERNS, models/*.json), and both engines
execute regexes with RE2 and arithmetic in IEEE doubles with matching
expression order — so value hashes match bit-for-bit, not just
approximately.
"""

from __future__ import annotations

from textpipe_ray.functions.clean import (
    DOTS_PATTERN,
    DOUBLE_QUOTES_PATTERN,
    SINGLE_QUOTES_PATTERN,
    WHITESPACE_PATTERN,
)
from textpipe_ray.functions.quality import FEATURE_ORDER, LOWERED_FEATURES, RE2_PATTERNS
from textpipe_ray.functions.scrub import load_rules
from textpipe_ray.stages.text import (
    ALPHA_WORD_RE2,
    CONSONANT_WORD_RE2,
    SENT_RE2,
    VOWEL_GROUP_RE2,
)


def q(pat: str) -> str:
    """SQL-quote a regex pattern as a string literal."""
    return "'" + pat.replace("'", "''") + "'"


def count_expr(target: str, pattern: str) -> str:
    return f"len(regexp_extract_all({target}, {q(pattern)}))"


def clean_norm_expr(col: str = "text") -> str:
    """The clean kernel minus HTML removal (dots → quotes → whitespace),
    for plain-text tables."""
    e = col
    e = f"regexp_replace({e}, {q(DOTS_PATTERN)}, '...', 'g')"
    e = f"regexp_replace({e}, {q(SINGLE_QUOTES_PATTERN)}, '''', 'g')"
    e = f"regexp_replace({e}, {q(DOUBLE_QUOTES_PATTERN)}, '\"', 'g')"
    e = f"regexp_replace({e}, {q(WHITESPACE_PATTERN)}, ' ', 'g')"
    return f"trim({e})"


def feature_select_list(text: str = "text") -> list[str]:
    """``name AS name`` items for every count feature + the ratios, in
    the exact arithmetic shape of stages/text.quality_batch."""
    items = [f"len({text}) AS n_chars"]
    for name in FEATURE_ORDER:
        target = f"lower({text})" if name in LOWERED_FEATURES else text
        items.append(f"{count_expr(target, RE2_PATTERNS[name])} AS {name}")
    return items


_RATIO_SQL = {
    "alpha_ratio": "CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)",
    "digit_ratio": "CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)",
    "upper_ratio": "CAST(n_upper AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)",
    "symbol_ratio": "CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)",
    "stopword_ratio": "CAST(n_stopwords AS DOUBLE) / CAST(greatest(nwords, 1) AS DOUBLE)",
    "mean_word_len": "CAST(n_alpha AS DOUBLE) / CAST(greatest(nwords, 1) AS DOUBLE)",
}


def ratio_select_list() -> list[str]:
    return [f"{expr} AS {name}" for name, expr in _RATIO_SQL.items()]


def rule_conditions(t: dict) -> list[tuple[str, str]]:
    """(rule_name, violated_sql) in the priority order of quality_batch."""
    return [
        ("too_few_words", f"nwords < {t['min_words']}"),
        ("too_many_words", f"nwords > {t['max_words']}"),
        ("too_few_sents", f"nsents < {t['min_sents']}"),
        ("word_len_low", f"mean_word_len < {t['min_mean_word_len']}"),
        ("word_len_high", f"mean_word_len > {t['max_mean_word_len']}"),
        ("too_few_stopwords", f"n_stopwords < {t['min_stopwords']}"),
        ("symbol_heavy", f"symbol_ratio > {t['max_symbol_ratio']}"),
        ("digit_heavy", f"digit_ratio > {t['max_digit_ratio']}"),
        ("long_word_junk", f"n_long_words > {t['max_long_words']}"),
    ]


def keep_expr(t: dict) -> str:
    return "(" + " AND ".join(f"NOT ({c})" for _, c in rule_conditions(t)) + ")"


def drop_reason_expr(t: dict) -> str:
    whens = " ".join(f"WHEN {c} THEN '{n}'" for n, c in rule_conditions(t))
    return f"(CASE {whens} ELSE '' END)"


def scrub_ctes(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Progressive CTE chain: per-rule match counts are taken on the
    text as it stands BEFORE that rule's replacement (matching
    stages/text.scrub_batch)."""
    rules = load_rules()["rules"]
    parts = [f"s0 AS (SELECT {id_col}, {text_col} AS t FROM {table})"]
    prev = "s0"
    carried: list[str] = []
    for i, r in enumerate(rules, start=1):
        cnt = f"{count_expr('t', r['pattern'])} AS scrub_{r['name']}"
        repl = f"regexp_replace(t, {q(r['pattern'])}, '{r['replacement']}', 'g') AS t"
        keep_prev = ", ".join(carried + [cnt])
        parts.append(f"s{i} AS (SELECT {id_col}, {keep_prev}, {repl} FROM {prev})")
        carried.append(f"scrub_{r['name']}")
        prev = f"s{i}"
    return "WITH " + ",\n".join(parts), prev, carried


def build_oracle_sql() -> dict[str, str]:
    """The driver-contract oracle: one DuckDB SQL string per
    oracle-checked query in pipelines/queries.py, over the
    pre-registered views (documents / embeddings / events / lineitem /
    orders / customer)."""
    from textpipe_ray.functions.quality import load_thresholds

    t = load_thresholds()
    out: dict[str, str] = {}

    out["q_clean"] = f"SELECT doc_id, {clean_norm_expr('text')} AS clean FROM documents"

    feats = ",\n       ".join(feature_select_list("text"))
    ratios = ",\n       ".join(ratio_select_list())
    out["q_quality"] = f"""
WITH f AS (SELECT doc_id, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f)
SELECT doc_id, n_chars, {', '.join(FEATURE_ORDER)},
       alpha_ratio, digit_ratio, upper_ratio, symbol_ratio, stopword_ratio, mean_word_len,
       {keep_expr(t)} AS keep, {drop_reason_expr(t)} AS drop_reason
FROM r"""

    out["q_complexity"] = (
        f"SELECT doc_id, {complexity_expr('text')} AS complexity FROM documents"
    )

    ctes, last, carried = scrub_ctes("documents")
    out["q_scrub"] = f"{ctes}\nSELECT doc_id, {', '.join(carried)}, t AS scrubbed_text FROM {last}"

    out["q_fingerprint"] = "SELECT doc_id, md5(text) AS fingerprint FROM documents"

    out["q_exact_dedup"] = (
        "SELECT md5(substr(text, 1, 40)) AS dedup_key, min(doc_id) AS keep_doc_id "
        "FROM documents GROUP BY 1"
    )

    word_pat = q(RE2_PATTERNS["nwords"])
    out["q_token_freq"] = f"""
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), {word_pat})) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token LIMIT 100"""

    out["q_lang_metrics"] = f"""
WITH f AS (SELECT lang, source, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
k AS (SELECT lang, source, n_chars, CASE WHEN {keep_expr(t)} THEN 1 ELSE 0 END AS keep_i FROM r)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(keep_i) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
FROM k GROUP BY lang, source"""

    out["q_topk_docs"] = (
        "SELECT doc_id, lang, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20"
    )

    out["q_events_window"] = """
WITH f AS (SELECT event_type,
                  CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT) AS window_hour,
                  CAST(floor(value * 1000.0) AS BIGINT) AS vmilli
           FROM events)
SELECT event_type, window_hour, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vmilli) AS BIGINT) AS sum_value_milli
FROM f GROUP BY event_type, window_hour"""

    out["q_agg_lineitem"] = """
WITH f AS (SELECT l_returnflag, l_linestatus,
                  CAST(floor(l_quantity) AS BIGINT) AS qty,
                  CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS price_cents,
                  CAST(floor(l_discount * 10000.0) AS BIGINT) AS disc_e4
           FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-03')
SELECT l_returnflag, l_linestatus, CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
       CAST(sum(disc_e4) AS BIGINT) AS sum_disc_e4,
       CAST(count(*) AS BIGINT) AS n
FROM f GROUP BY l_returnflag, l_linestatus"""

    out["q_segment_orders"] = """
SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1"""

    out["q_ann_topk"] = """
WITH qv AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           -- floor(cos*1e9): quantized identically on the Ray side so a
           -- summation-order ulp can't flip near-equal ranks
           ORDER BY CAST(floor(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) * 1e9) AS BIGINT) DESC,
                    e.vec_id
         ) AS rank
  FROM qv q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
) WHERE rank <= 10"""

    # bounded-window rolling aggregate (integer cents → exact)
    out["q_rolling_sum"] = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_cents
FROM events"""

    # deterministic stratified (hash-bucket) sample
    out["q_stratified_sample"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 10"""

    # deterministic content-hash train/val split
    out["q_train_split"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90
            THEN 'train' ELSE 'val' END AS split
FROM documents"""

    # as-of join — DuckDB's native ASOF JOIN is the oracle
    out["q_asof_join"] = """
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       CAST(datediff('day', DATE '1970-01-01', o.o_orderdate) AS BIGINT) AS last_order_days
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)"""

    # distributed hash join (Dataset.join parity)
    out["q_native_join"] = """
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       c.c_mktsegment,
       CAST(floor(o.o_totalprice * 100.0) AS BIGINT) AS price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"""

    # skew-salted join: the oracle runs the PLAIN join over the same
    # deterministically planted hot key (queries.SKEW_MOD) — salting
    # must be invisible in the result
    from textpipe_ray.pipelines.queries import SKEW_MOD

    out["q_skew_join"] = f"""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(CASE WHEN o.o_orderkey % {SKEW_MOD} = 0 THEN 1 ELSE o.o_custkey END AS BIGINT)
         AS skew_custkey,
       c.c_mktsegment,
       CAST(floor(o.o_totalprice * 100.0) AS BIGINT) AS price_cents
FROM orders o JOIN customer c
  ON c.c_custkey = (CASE WHEN o.o_orderkey % {SKEW_MOD} = 0 THEN 1 ELSE o.o_custkey END)"""

    # NFC normalization: DuckDB's nfc_normalize is codepoint-identical
    # to CPython unicodedata NFC (the engine kernel); the planted
    # decomposed suffix is the same ' cafe' + combining acute (U+0301)
    from textpipe_ray.pipelines.queries import NFC_DIRTY_MOD

    out["q_nfc_normalize"] = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {NFC_DIRTY_MOD} = 0
              THEN coalesce(text, '') || ' cafe' || chr(769)
              ELSE coalesce(text, '') END AS t
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       nfc_normalize(t) <> t AS changed,
       CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_norm,
       substr(md5(nfc_normalize(t)), 1, 8) AS norm_md5
FROM d"""

    # WET export round-trip: the oracle summarizes the ORIGINAL parquet;
    # equality proves the sharded WET write→parse cycle is lossless
    out["q_wet_export"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
       substr(md5(coalesce(text, '')), 1, 8) AS md5_8
FROM documents"""

    # per-doc repetition signals (dup 3-gram / top-bigram fractions);
    # same token regex + shingle construction as queries.q_repetition
    out["q_repetition"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents
),
tri AS (
  SELECT doc_id, array_to_string(list_slice(ws, i.i, i.i + 2), ' ') AS g
  FROM toks CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
  ) i
),
bi AS (
  SELECT doc_id, array_to_string(list_slice(ws, i.i, i.i + 1), ' ') AS g
  FROM toks CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
  ) i
),
t3 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tot, CAST(count(DISTINCT g) AS BIGINT) AS dis
       FROM tri GROUP BY 1),
b2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot,
              CAST(max(c) AS BIGINT) AS topc
       FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(t3.tot, 0) AS n_trigrams,
       CASE WHEN COALESCE(t3.tot, 0) > 0
            THEN CAST(t3.tot - t3.dis AS DOUBLE) / CAST(greatest(t3.tot, 1) AS DOUBLE)
            ELSE 0.0 END AS dup_trigram_frac,
       CASE WHEN COALESCE(b2.tot, 0) > 0
            THEN CAST(b2.topc AS DOUBLE) / CAST(greatest(b2.tot, 1) AS DOUBLE)
            ELSE 0.0 END AS top_bigram_frac
FROM documents d
LEFT JOIN t3 ON t3.doc_id = d.doc_id
LEFT JOIN b2 ON b2.doc_id = d.doc_id"""

    # corpus TF-IDF top-5 per doc — same token regex and tf*ln(N/df)
    # score as queries.q_tfidf_topk; output is ints+strings (floats
    # only order the rows)
    out["q_tfidf_topk"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  -- floor(score*1e9): quantized identically on the Ray side so an
  -- ln() last-ulp difference can't flip near-equal ranks
  SELECT tf.doc_id, tf.term,
         CAST(floor(CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(df.df AS DOUBLE)) * 1e9) AS BIGINT) AS score_q
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"""

    # exact per-language length quantiles (quantile_disc parity)
    out["q_len_quantiles"] = """
SELECT lang,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n_chars, 0.5)  AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9)  AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents GROUP BY lang"""

    # gap-based sessionization — lag() + running-sum window functions;
    # 30-min gap and integer cents/micros match queries.q_sessionize
    out["q_sessionize"] = """
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(event_id AS BIGINT) AS event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(floor(value * 100.0) AS BIGINT) AS vcents
  FROM events
),
d AS (
  SELECT *,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (
  SELECT *,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM d
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       CAST(sum(vcents) AS BIGINT) AS sum_value_cents
FROM s GROUP BY 1, 2"""

    # exact word-3-gram jaccard pairs — same token regex, shingle
    # construction and int/int double division as stages/dedup.
    # shingle_jaccard_pairs, so values are bit-identical
    out["q_ngram_jaccard"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.i, i.i + 2), ' ') AS shingle
  FROM toks CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
  ) i
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(n AS DOUBLE) / CAST(sa.sz + sb.sz - n AS DOUBLE) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n AS DOUBLE) / CAST(sa.sz + sb.sz - n AS DOUBLE) >= 0.8"""

    # sliding 1-hour window hopping every 30 min: each event lands in
    # the windows starting at its half-hour slot and the one before
    out["q_events_sliding"] = """
WITH f AS (SELECT event_type,
                  CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1800000000.0) AS BIGINT) AS hh,
                  CAST(floor(value * 1000.0) AS BIGINT) AS vmilli
           FROM events),
w AS (SELECT event_type, vmilli, unnest([hh, hh - 1]) AS window_start FROM f)
SELECT event_type, window_start, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vmilli) AS BIGINT) AS sum_value_milli
FROM w GROUP BY event_type, window_start"""

    # benchmark decontamination: any shared word-5-gram with docs 0-4;
    # same token regex / shingle construction as queries.q_contamination
    out["q_contamination"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.i, i.i + 4), ' ') AS s
  FROM toks CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i
  ) i
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
cand AS (SELECT doc_id, s FROM sh WHERE doc_id >= 5),
ov AS (
  SELECT c.doc_id, CAST(count(b.s) AS BIGINT) AS n_overlap
  FROM cand c LEFT JOIN bench b ON c.s = b.s GROUP BY c.doc_id
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM cand GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(sz.n_shingles, 0) AS n_shingles,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       COALESCE(ov.n_overlap, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d
LEFT JOIN sz ON sz.doc_id = d.doc_id
LEFT JOIN ov ON ov.doc_id = d.doc_id"""

    # token-budget sequence packing: bin = floor(preceding tokens / B)
    out["q_pack_sequences"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST((COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) // 2048 AS BIGINT) AS bin_id
FROM t"""

    # corpus-level exact duplicated-span removal (C4-style line dedup at
    # fixed 4-token chunks); pos packing mirrors queries.q_chunk_dedup
    out["q_chunk_dedup"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS i
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents)
), chunks AS (
  SELECT doc_id, (i - 1) // 4 AS chunk_idx, string_agg(tok, ' ' ORDER BY i) AS chunk
  FROM toks GROUP BY doc_id, (i - 1) // 4
), marked AS (
  SELECT doc_id, chunk_idx, chunk,
         doc_id * 1048576 + chunk_idx AS pos,
         min(doc_id * 1048576 + chunk_idx) OVER (PARTITION BY chunk) AS min_pos
  FROM chunks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM marked WHERE pos = min_pos
GROUP BY doc_id ORDER BY doc_id"""

    out["q_anti_join"] = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey"""

    from textpipe_ray.pipelines.queries import RANGE_JOIN_WINDOW_US

    out["q_range_join"] = f"""
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(count(b.event_id) AS BIGINT) AS n_views
FROM events p LEFT JOIN events b
  ON b.user_id = p.user_id AND b.event_type = 'view'
 AND epoch_us(b.ts) BETWEEN epoch_us(p.ts) - {RANGE_JOIN_WINDOW_US} AND epoch_us(p.ts)
WHERE p.event_type = 'click'
GROUP BY p.event_id ORDER BY event_id"""

    from textpipe_ray.functions.tokenize import BPE_PATTERN

    out["q_token_count"] = (
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST(len(regexp_extract_all(text, {q(BPE_PATTERN)})) AS BIGINT) AS n_tokens "
        f"FROM documents ORDER BY doc_id"
    )

    out["q_distinct_tokens"] = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), {q(RE2_PATTERNS['nwords'])})) AS tok
  FROM documents
)
SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_total
FROM toks GROUP BY lang ORDER BY lang"""

    # learned linear quality score — the SAME left-nested float64 chain
    # as functions/quality_score.score_batch, over the bit-exact feature
    # CTEs, so the score doubles match bitwise (no quantization needed)
    from textpipe_ray.functions.quality_score import load_weights, score_sql_expr

    _w = load_weights()
    out["q_quality_score"] = f"""
WITH f AS (SELECT doc_id, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f)
SELECT doc_id, {score_sql_expr(_w)} AS score,
       {score_sql_expr(_w)} > 0.0 AS quality_label
FROM r"""

    from textpipe_ray.pipelines.queries import QUALITY_PCT_Q

    _qnum, _qden = QUALITY_PCT_Q
    out["q_quality_percentile"] = f"""
WITH f AS (SELECT doc_id, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
s AS (SELECT doc_id, CAST(floor(({score_sql_expr(_w)}) * 1e6) AS BIGINT) AS score_micro FROM r),
t AS (SELECT quantile_disc(score_micro, {_qnum / _qden}) AS thr FROM s)
SELECT s.doc_id, s.score_micro FROM s, t WHERE s.score_micro >= t.thr ORDER BY doc_id"""

    # per-language quantile normalization: strict-rank permille via a
    # RANGE window counting scores <= score-1 (integer scores, so
    # RANGE ... 1 PRECEDING is exactly "strictly below"); integer //
    # matches the engine's int64 floor division bit-for-bit
    out["q_lang_quantile_norm"] = f"""
WITH f AS (SELECT doc_id, coalesce(lang, '') AS lang, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
s AS (SELECT doc_id, lang,
             CAST(floor(({score_sql_expr(_w)}) * 1e6) AS BIGINT) AS score_micro FROM r)
SELECT doc_id, lang, score_micro,
       (1000 * count(*) OVER (PARTITION BY lang ORDER BY score_micro
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         // count(*) OVER (PARTITION BY lang) AS pct_milli
FROM s"""

    # code detection: the planted snippet + plain substring counts
    # (replace-length idiom; multi-char counts divide by the literal's
    # length, exact integers end to end)
    from textpipe_ray.pipelines.queries import (
        CODE_KEYWORDS,
        CODE_MOD,
        CODE_SNIPPET,
        CODE_SYMBOLS,
    )

    def _subcnt(expr: str, lit: str) -> str:
        sq = lit.replace("'", "''")
        n = f"(length({expr}) - length(replace({expr}, '{sq}', '')))"
        return n if len(lit) == 1 else f"{n} // {len(lit)}"

    _snip = CODE_SNIPPET.replace("'", "''").replace("\n", "' || chr(10) || '")
    _kw = " + ".join(_subcnt("t", k) for k in CODE_KEYWORDS)
    _sym = {s: _subcnt("t", s) for s in CODE_SYMBOLS}
    out["q_code_detect"] = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CODE_MOD} = 0
              THEN coalesce(text, '') || '{_snip}'
              ELSE coalesce(text, '') END AS t
  FROM documents),
c AS (
  SELECT doc_id,
         CAST({_kw} AS BIGINT) AS kw_hits,
         CAST({_sym["{"]} + {_sym["}"]} AS BIGINT) AS n_braces,
         CAST({_sym[";"]} AS BIGINT) AS n_semi,
         CAST({_sym["="]} AS BIGINT) AS n_eq,
         CAST(length(t) AS BIGINT) AS n_chars
  FROM d)
SELECT doc_id, kw_hits, n_braces, n_semi, n_eq,
       CASE WHEN n_chars > 0
            THEN (1000 * (n_braces + n_semi + n_eq)) // n_chars
            ELSE 0 END AS code_milli,
       kw_hits >= 2 AND n_braces >= 2 AND n_semi >= 1 AS is_code
FROM c"""

    # citation density: the planted marker suffix + DuckDB's own regexp
    # engine re-counting the [n] markers (independent of Arrow's RE2)
    from textpipe_ray.pipelines.queries import CITE_MIN_HITS, CITE_MOD, CITE_SUFFIX

    _cite_sfx = CITE_SUFFIX.replace("'", "''")
    out["q_citation_density"] = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CITE_MOD} = 0
              THEN coalesce(text, '') || '{_cite_sfx}'
              ELSE coalesce(text, '') END AS t
  FROM documents),
c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '\\[[0-9]+\\]')) AS BIGINT) AS n_cites,
         CAST(length(t) AS BIGINT) AS n_chars
  FROM d)
SELECT doc_id, n_cites, n_chars,
       (10000 * n_cites) // greatest(n_chars, 1) AS cites_per_10k,
       n_cites >= {CITE_MIN_HITS} AS is_reference
FROM c"""

    # k-anonymity release audit: plain grouped count + threshold flag
    from textpipe_ray.pipelines.queries import K_ANON

    out["q_k_anonymity"] = f"""
SELECT coalesce(lang, '') AS lang, coalesce(source, '') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       count(*) < {K_ANON} AS suppressed
FROM documents GROUP BY 1, 2"""

    # DoReMi-style domain reweighting: the multiplicative-weights
    # rounds unroll into generated chained CTEs; every division operand
    # is positive (the engine's DOREMI_OFFSET), so DuckDB's truncating
    # // and Python's flooring // agree exactly
    from textpipe_ray.pipelines.queries import (
        DOREMI_CLIP_MICRO,
        DOREMI_OFFSET,
        DOREMI_ROUNDS,
        DOREMI_SCALE,
    )

    _dw_ctes = [
        f"w0 AS (SELECT source, n_docs, sm // n_docs AS mean, "
        f"CAST({DOREMI_SCALE} AS BIGINT) AS w FROM d)"
    ]
    for _t in range(1, DOREMI_ROUNDS + 1):
        _prev = f"w{_t - 1}"
        _gm = (
            f"(SELECT CAST(sum(w * mean) AS BIGINT) // CAST(sum(w) AS BIGINT) "
            f"FROM {_prev})"
        )
        _dw_ctes.append(
            f"w{_t} AS (SELECT source, n_docs, mean, "
            f"w * ({DOREMI_SCALE} + greatest(-{DOREMI_CLIP_MICRO}, "
            f"least({DOREMI_CLIP_MICRO}, mean - {_gm}))) // {DOREMI_SCALE} AS w "
            f"FROM {_prev})"
        )
    _dw_last = f"w{DOREMI_ROUNDS}"
    out["q_domain_reweight"] = f"""
WITH f AS (SELECT doc_id, coalesce(source, '') AS source, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
s AS (SELECT source,
             CAST(floor(({score_sql_expr(_w)}) * 1e6) AS BIGINT) + {DOREMI_OFFSET} AS m
      FROM r),
d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(m) AS BIGINT) AS sm FROM s GROUP BY source),
{",".join(_dw_ctes)}
SELECT source, n_docs, mean - {DOREMI_OFFSET} AS mean_score_micro,
       CAST(w * {DOREMI_SCALE} // (SELECT CAST(sum(w) AS BIGINT) FROM {_dw_last}) AS BIGINT)
         AS weight_micro
FROM {_dw_last}"""

    # keyed PII pseudonymization: the planted emails + DuckDB's own
    # regexp split/extract and md5 rebuilding the interleaved text —
    # pseudonym stability (same entity → same token across docs) is
    # value-checked by construction
    from textpipe_ray.pipelines.queries import PSEUDO_EMAIL_RE, PSEUDO_MOD

    _ppat = q(PSEUDO_EMAIL_RE)
    out["q_pseudonymize"] = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PSEUDO_MOD} = 0
              THEN coalesce(text, '') || ' Contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com and admin@example.com.'
              ELSE coalesce(text, '') END AS t
  FROM documents),
m AS (
  SELECT doc_id, t,
         regexp_extract_all(t, {_ppat}) AS ms,
         regexp_split_to_array(t, {_ppat}) AS parts
  FROM d)
SELECT doc_id,
       parts[1] || coalesce(list_aggregate(
          list_transform(list_zip(ms, parts[2:]),
             p -> '<EMAIL_' || substr(md5(p[1]), 1, 8) || '>' || p[2]),
          'string_agg', ''), '') AS scrubbed,
       CAST(len(ms) AS BIGINT) AS n_pii,
       CAST(len(list_distinct(ms)) AS BIGINT) AS n_distinct
FROM m"""

    # bottom-k quantile sketch: DuckDB's md5() replays the engine's
    # EXACT deterministic sample (k smallest md5(doc_id) per lang), so
    # the sketch estimate itself is SQL-value-checked, not just bounded
    from textpipe_ray.pipelines.queries import SKETCH_QUANTILES, SKETCH_SAMPLE_K

    _qcols = ", ".join(
        f"quantile_disc(score_micro, {num / den}) AS p{num * 100 // den}"
        for num, den in SKETCH_QUANTILES
    )
    out["q_quantile_sketch"] = f"""
WITH f AS (SELECT doc_id, lang, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
s AS (SELECT doc_id, lang,
             CAST(floor(({score_sql_expr(_w)}) * 1e6) AS BIGINT) AS score_micro,
             md5(CAST(doc_id AS VARCHAR)) AS key FROM r),
k AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn FROM s)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sample, {_qcols}
FROM k WHERE rn <= {SKETCH_SAMPLE_K} GROUP BY lang ORDER BY lang"""

    from textpipe_ray.pipelines.queries import (
        PR_THR_MAX_MICRO,
        PR_THR_MIN_MICRO,
        PR_THR_STEP_MICRO,
    )

    out["q_filter_pr_curve"] = f"""
WITH f AS (SELECT doc_id, {feats} FROM documents),
r AS (SELECT *, {ratios} FROM f),
s AS (SELECT CAST(floor(({score_sql_expr(_w)}) * 1e6) AS BIGINT) AS sm,
             {keep_expr(t)} AS keep FROM r),
g AS (SELECT range AS thr_micro
      FROM range({PR_THR_MIN_MICRO}, {PR_THR_MAX_MICRO}, {PR_THR_STEP_MICRO}))
SELECT g.thr_micro,
  CAST(sum(CASE WHEN s.sm >= g.thr_micro AND s.keep THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(sum(CASE WHEN s.sm >= g.thr_micro AND NOT s.keep THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(sum(CASE WHEN s.sm < g.thr_micro AND s.keep THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(sum(CASE WHEN s.sm < g.thr_micro AND NOT s.keep THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM s CROSS JOIN g GROUP BY g.thr_micro ORDER BY g.thr_micro"""

    out["q_dup_stats"] = """
SELECT source,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source ORDER BY source"""

    # fixed-point centroid: element-wise floor(x*1e6) BEFORE the sum
    # makes the aggregate exact integers (order-independent), and the
    # mean an exact int/int double division — matching any distributed
    # summation order on the Ray side
    out["q_embedding_centroid"] = """
WITH u AS (
  SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS centroid_micro
FROM u GROUP BY label, dim ORDER BY label, dim"""

    from textpipe_ray.pipelines.queries import DOMAIN_MIX_CAP

    out["q_domain_mix"] = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
r AS (SELECT source, least(1000, ({DOMAIN_MIX_CAP} * 1000) // n) AS rate FROM c)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE CAST(('0x' || substr(md5(d.text), 1, 8)) AS BIGINT) % 1000 < r.rate"""

    out["q_topk_per_group"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 3
ORDER BY lang, doc_id"""

    # temperature rebalancing: rate = floor(1000 * sqrt(n_min/n_l)) —
    # sqrt and / are correctly-rounded IEEE ops, so DuckDB and numpy
    # produce bit-identical doubles and the floor cannot disagree
    # (a pow()-based rate would not have that guarantee)
    out["q_lang_temperature"] = """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS n_min FROM c),
r AS (SELECT lang,
             least(1000, CAST(floor(1000 * sqrt(CAST((SELECT n_min FROM m) AS DOUBLE)
                                                / CAST(n AS DOUBLE))) AS BIGINT)) AS rate
      FROM c)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(d.text), 1, 8)) AS BIGINT) % 1000 < r.rate"""

    out["q_json_extract"] = """
WITH e AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM e GROUP BY event_type ORDER BY event_type"""

    from textpipe_ray.pipelines.queries import N_SHUFFLE_SHARDS

    out["q_shuffle_shards"] = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {N_SHUFFLE_SHARDS} AS shard_id,
         md5('pos:' || CAST(doc_id AS VARCHAR)) AS pos_key
  FROM documents
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY pos_key, doc_id) - 1 AS BIGINT) AS pos,
       CAST(doc_id AS BIGINT) AS doc_id
FROM h ORDER BY shard_id, pos"""

    out["q_char_coverage"] = """
WITH c AS (
  SELECT lang, unnest(string_split(text, '')) AS ch FROM documents
)
SELECT lang, CAST(unicode(ch) AS BIGINT) AS cp, CAST(count(*) AS BIGINT) AS n
FROM c WHERE ch <> ''
GROUP BY lang, cp ORDER BY lang, cp"""

    pii_ctes, pii_last, pii_carried = scrub_ctes("documents", id_col="lang")
    pii_aggs = ",\n       ".join(
        f"CAST(sum({c}) AS BIGINT) AS {c.removeprefix('scrub_')}_matches,\n       "
        f"CAST(sum(CASE WHEN {c} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS "
        f"{c.removeprefix('scrub_')}_docs"
        for c in pii_carried
    )
    out["q_pii_stats"] = (
        f"{pii_ctes}\nSELECT lang,\n       {pii_aggs}\n"
        f"FROM {pii_last} GROUP BY lang ORDER BY lang"
    )

    from textpipe_ray.pipelines.queries import SPAN_S, SPAN_W

    out["q_span_dedup"] = f"""
WITH w AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), {SPAN_W}) AS win
  FROM documents
  CROSS JOIN unnest(generate_series(1, len(text) - {SPAN_W - 1}, {SPAN_S})) AS t(i)
),
d AS (
  SELECT win, min(doc_id) <> max(doc_id) AS is_dup FROM w GROUP BY win
)
SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(floor(1000.0 * sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) / count(*)) AS BIGINT)
         AS dup_permille
FROM w JOIN d USING (win) GROUP BY w.doc_id ORDER BY doc_id"""

    from textpipe_ray.pipelines.queries import FUNNEL_STEPS, FUNNEL_WINDOW_US

    _s1, _s2, _s3 = FUNNEL_STEPS
    out["q_funnel"] = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
  WHERE event_type IN ('{_s1}', '{_s2}', '{_s3}')
),
v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = '{_s1}' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click FROM e JOIN v USING (user_id)
      WHERE e.event_type = '{_s2}' AND e.ts > v.t_view AND e.ts <= v.t_view + {FUNNEL_WINDOW_US} GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e JOIN c USING (user_id)
      WHERE e.event_type = '{_s3}' AND e.ts > c.t_click AND e.ts <= c.t_click + {FUNNEL_WINDOW_US} GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM e)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
          + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
          + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage,
       CAST(v.t_view AS BIGINT) AS t_view,
       CAST(c.t_click AS BIGINT) AS t_click,
       CAST(p.t_purchase AS BIGINT) AS t_purchase
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
ORDER BY user_id"""

    from textpipe_ray.pipelines.queries import NORM_DUP_TAG

    _sel = "CAST(('0x' || substr(md5('norm:' || CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER)"
    out["q_normalized_dedup"] = rf"""
WITH v AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NORM_DUP_TAG}, upper(text) FROM documents WHERE {_sel} % 2 = 1
  UNION ALL
  SELECT doc_id + {2 * NORM_DUP_TAG}, '  ' || replace(text, ' ', e'\n\t ') || e' \n'
  FROM documents WHERE ({_sel} // 2) % 2 = 1
),
n AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[\t\n\f\r ]+', ' ', 'g'))) AS dedup_key
  FROM v
)
SELECT dedup_key, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM n GROUP BY dedup_key ORDER BY dedup_key"""

    from textpipe_ray.pipelines.queries import BUDGET_MIX_CHARS

    out["q_budget_mix"] = f"""
WITH h AS (
  SELECT doc_id, source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents
),
c AS (
  SELECT *, sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id) - n_chars AS prev_cum
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(prev_cum AS BIGINT) AS prev_cum
FROM c WHERE prev_cum < {BUDGET_MIX_CHARS}
ORDER BY source, prev_cum, doc_id"""

    from textpipe_ray.pipelines.queries import TRIGRAM_TOPK

    out["q_trigram_lm"] = f"""
WITH g AS (
  SELECT lang, substr(lower(text), CAST(i AS INTEGER), 3) AS tri
  FROM documents CROSS JOIN unnest(generate_series(1, len(text) - 2, 1)) AS t(i)
),
c AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY lang, tri),
tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_total FROM c GROUP BY lang)
SELECT lang, tri, n, n_total
FROM c JOIN tot USING (lang)
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri) <= {TRIGRAM_TOPK}
ORDER BY lang, n DESC, tri"""

    from textpipe_ray.pipelines.queries import COLLOC_TOKEN_RE2, COLLOC_TOPK

    out["q_collocations"] = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), {q(COLLOC_TOKEN_RE2)}) AS ts FROM documents
),
bi AS (
  SELECT ts[CAST(i AS INTEGER)] AS w1, ts[CAST(i AS INTEGER) + 1] AS w2
  FROM toks CROSS JOIN unnest(generate_series(1, len(ts) - 1, 1)) AS t(i)
),
uni AS (
  SELECT u AS w, CAST(count(*) AS BIGINT) AS nw
  FROM (SELECT unnest(ts) AS u FROM toks) GROUP BY u
),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM bi GROUP BY w1, w2)
SELECT bc.w1, bc.w2, bc.n_xy, u1.nw AS n_x, u2.nw AS n_y
FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w
ORDER BY n_xy DESC, w1, w2 LIMIT {COLLOC_TOPK}"""

    from textpipe_ray.pipelines.queries import (
        GOPHER_ALPHA_WORD_RE2,
        GOPHER_ELLIPSIS_RE2,
        GOPHER_MAX_SYMBOL_MILLI,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_MILLI,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_MWL_MAX_MILLI,
        GOPHER_MWL_MIN_MILLI,
        GOPHER_STOP_RE2,
    )

    # same RE2 patterns, same int64 milli math, same first-failure
    # rule order as q_gopher_rules (both engines run RE2)
    nw_expr = count_expr("text", r"\S+")
    ws_expr = count_expr("text", r"\s")
    alpha_expr = count_expr("text", GOPHER_ALPHA_WORD_RE2)
    stop_expr = count_expr("lower(text)", GOPHER_STOP_RE2)
    ell_expr = count_expr("text", GOPHER_ELLIPSIS_RE2)
    # the feature+flag CTE block is SHARED by q_gopher_rules and
    # q_rule_ablation (one definition — the two cannot diverge)
    _gopher_ctes = f"""
WITH f AS (
  SELECT doc_id,
    {nw_expr} AS n_words,
    length(text) - {ws_expr} AS wchars,
    {alpha_expr} AS alphaw,
    {stop_expr} AS stop_hits,
    (length(text) - length(replace(text, '#', ''))) + {ell_expr} AS sym
  FROM documents
),
m AS (
  SELECT doc_id, n_words, stop_hits,
    wchars * 1000 // greatest(n_words, 1) AS mean_word_len_milli,
    sym * 1000 // greatest(n_words, 1) AS symbol_milli,
    alphaw * 1000 // greatest(n_words, 1) AS alpha_milli
  FROM f
),
r AS (
  SELECT *,
    (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS r_nw,
    (mean_word_len_milli >= {GOPHER_MWL_MIN_MILLI} AND mean_word_len_milli <= {GOPHER_MWL_MAX_MILLI}) AS r_mwl,
    (symbol_milli <= {GOPHER_MAX_SYMBOL_MILLI}) AS r_sym,
    (alpha_milli >= {GOPHER_MIN_ALPHA_MILLI}) AS r_alpha,
    (stop_hits >= {GOPHER_MIN_STOP_HITS}) AS r_stop
  FROM m
)"""
    out["q_gopher_rules"] = f"""{_gopher_ctes}
SELECT doc_id, n_words, mean_word_len_milli, symbol_milli, alpha_milli, stop_hits,
  (r_nw AND r_mwl AND r_sym AND r_alpha AND r_stop) AS keep,
  CASE WHEN NOT r_nw THEN 'n_words'
       WHEN NOT r_mwl THEN 'mean_word_len'
       WHEN NOT r_sym THEN 'symbol_ratio'
       WHEN NOT r_alpha THEN 'alpha_words'
       WHEN NOT r_stop THEN 'stop_words'
       ELSE '' END AS drop_reason
FROM r ORDER BY doc_id"""

    # per-rule ablation over the same flag CTE: n_fail / n_unique
    # (docs failing ONLY that rule) / exact integer permille
    _abl_flags = {
        "n_words": "r_nw",
        "mean_word_len": "r_mwl",
        "symbol_ratio": "r_sym",
        "alpha_words": "r_alpha",
        "stop_words": "r_stop",
    }
    _abl_nfails = " + ".join(
        f"(CASE WHEN NOT {c} THEN 1 ELSE 0 END)" for c in _abl_flags.values()
    )
    _abl_rows = "\nUNION ALL ".join(
        f"""SELECT '{name}' AS rule,
  CAST(sum(CASE WHEN NOT {col} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
  CAST(sum(CASE WHEN NOT {col} AND n_fails = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
  CAST((1000 * sum(CASE WHEN NOT {col} THEN 1 ELSE 0 END)) // greatest(count(*), 1) AS BIGINT) AS fail_permille
FROM x"""
        for name, col in _abl_flags.items()
    )
    out["q_rule_ablation"] = f"""{_gopher_ctes},
x AS (SELECT *, ({_abl_nfails}) AS n_fails FROM r)
{_abl_rows}"""

    # Gopher repetition rules: word grams rebuilt with list lambdas;
    # char contribution of a gram string g of n words is length(g)-(n-1)
    # (the joining spaces), so both engines do identical int64 math
    from textpipe_ray.pipelines.queries import (
        REP_DUP2_MAX_MILLI,
        REP_TOP2_MAX_MILLI,
        REP_TOP3_MAX_MILLI,
        REP_TOP4_MAX_MILLI,
    )

    out["q_repetition_rules"] = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') ws,
         length(replace(text, ' ', '')) wchars
  FROM documents
),
g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) g FROM w),
g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) g FROM w),
g4 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) g FROM w),
t2 AS (SELECT doc_id, max(cnt * (length(g) - 1)) c FROM (SELECT doc_id, g, count(*) cnt FROM g2 GROUP BY 1,2) GROUP BY 1),
t3 AS (SELECT doc_id, max(cnt * (length(g) - 2)) c FROM (SELECT doc_id, g, count(*) cnt FROM g3 GROUP BY 1,2) GROUP BY 1),
t4 AS (SELECT doc_id, max(cnt * (length(g) - 3)) c FROM (SELECT doc_id, g, count(*) cnt FROM g4 GROUP BY 1,2) GROUP BY 1),
d2 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) dup,
         sum(cnt) inst
  FROM (SELECT doc_id, g, count(*) cnt FROM g2 GROUP BY 1,2) GROUP BY 1
),
m AS (
  SELECT w.doc_id,
    coalesce(t2.c, 0) * 1000 // greatest(w.wchars, 1) AS top2_milli,
    coalesce(t3.c, 0) * 1000 // greatest(w.wchars, 1) AS top3_milli,
    coalesce(t4.c, 0) * 1000 // greatest(w.wchars, 1) AS top4_milli,
    CAST(coalesce(d2.dup, 0) * 1000 // greatest(coalesce(d2.inst, 0), 1) AS BIGINT) AS dup2_milli
  FROM w LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
         LEFT JOIN t4 USING (doc_id) LEFT JOIN d2 USING (doc_id)
),
r AS (
  SELECT *,
    (top2_milli <= {REP_TOP2_MAX_MILLI}) AS r_t2,
    (top3_milli <= {REP_TOP3_MAX_MILLI}) AS r_t3,
    (top4_milli <= {REP_TOP4_MAX_MILLI}) AS r_t4,
    (dup2_milli <= {REP_DUP2_MAX_MILLI}) AS r_d2
  FROM m
)
SELECT doc_id, top2_milli, top3_milli, top4_milli, dup2_milli,
  (r_t2 AND r_t3 AND r_t4 AND r_d2) AS keep,
  CASE WHEN NOT r_t2 THEN 'top2'
       WHEN NOT r_t3 THEN 'top3'
       WHEN NOT r_t4 THEN 'top4'
       WHEN NOT r_d2 THEN 'dup2'
       ELSE '' END AS drop_reason
FROM r ORDER BY doc_id"""

    # connected components over the SAME pair graph as q_ngram_jaccard:
    # recursive-CTE transitive closure (exact but quadratic-ish in
    # component size — a small-scale oracle only; the Ray plan is the
    # iterative min-label propagation in stages/dedup)
    pairs_sql = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.i, i.i + 2), ' ') AS shingle
  FROM toks CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
  ) i
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n AS DOUBLE) / CAST(sa.sz + sb.sz - n AS DOUBLE) >= 0.8"""
    out["q_dup_clusters"] = f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
)
SELECT node AS doc_id, least(node, min(r)) AS root FROM reach GROUP BY node"""

    # keeper selection over the SAME clusters: per-root argmax of the
    # Gopher n_words feature (ties -> min doc_id), mirroring
    # queries.q_keeper_selection's lexsort rule exactly
    # data-quality family: column profile + constraint validation,
    # generated from the SAME column/rule declarations as queries.py
    from textpipe_ray.pipelines.queries import PROFILE_COLUMNS

    prof_parts = []
    for col, kind in PROFILE_COLUMNS:
        if kind == "num":
            prof_parts.append(f"""
SELECT '{col}' AS col, count(*) AS n_rows, count(*) - count({col}) AS n_nulls,
  CAST(-1 AS BIGINT) AS n_distinct,
  COALESCE(CAST(CAST(min(floor({col} * 100)) AS BIGINT) AS VARCHAR), '') AS min_repr,
  COALESCE(CAST(CAST(max(floor({col} * 100)) AS BIGINT) AS VARCHAR), '') AS max_repr
FROM lineitem""")
        elif kind == "ts":
            prof_parts.append(f"""
SELECT '{col}' AS col, count(*) AS n_rows, count(*) - count({col}) AS n_nulls,
  CAST(-1 AS BIGINT) AS n_distinct,
  COALESCE(CAST(min(epoch_us({col})) AS VARCHAR), '') AS min_repr,
  COALESCE(CAST(max(epoch_us({col})) AS VARCHAR), '') AS max_repr
FROM lineitem""")
        else:
            prof_parts.append(f"""
SELECT '{col}' AS col, count(*) AS n_rows, count(*) - count({col}) AS n_nulls,
  CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
  COALESCE(min({col}), '') AS min_repr, COALESCE(max({col}), '') AS max_repr
FROM lineitem""")
    out["q_profile"] = "\nUNION ALL\n".join(prof_parts)

    def _rule(name: str, table: str, viol: str, key: str) -> str:
        return f"""
SELECT '{name}' AS rule, count(*) AS n_checked,
  CAST(COALESCE(sum(CASE WHEN {viol} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations,
  COALESCE(min(CASE WHEN {viol} THEN {key} END), -1) AS sample_key
FROM {table}"""

    out["q_validate"] = f"""
WITH pk AS (
  SELECT l_orderkey AS k1, l_linenumber AS k2, count(*) AS c
  FROM lineitem GROUP BY 1, 2
)
{_rule("lineitem_quantity_range", "lineitem", "l_quantity < 1.0 OR l_quantity > 50.0", "l_orderkey")}
UNION ALL
{_rule("lineitem_discount_range", "lineitem", "l_discount < 0.0 OR l_discount > 0.1", "l_orderkey")}
UNION ALL
{_rule("orders_totalprice_positive", "orders", "NOT (o_totalprice > 0.0)", "o_orderkey")}
UNION ALL
{_rule("documents_nchars_consistent", "documents", "n_chars <> coalesce(length(text), -1)", "doc_id")}
UNION ALL
{_rule("documents_text_nonempty", "documents", "length(trim(coalesce(text, ''))) = 0", "doc_id")}
UNION ALL
SELECT 'lineitem_pk_unique' AS rule,
  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_checked,
  CAST(COALESCE((SELECT sum(c - 1) FROM pk WHERE c > 1), 0) AS BIGINT) AS n_violations,
  COALESCE((SELECT min(k1) FROM pk WHERE c > 1), -1) AS sample_key
UNION ALL
SELECT 'lineitem_fk_orders' AS rule,
  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_checked,
  CAST((SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    AS n_violations,
  COALESCE((SELECT min(l_orderkey) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), -1)
    AS sample_key"""

    nw_keeper = count_expr("text", r"\S+")
    out["q_keeper_selection"] = f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT s, d FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
),
clusters AS (SELECT node AS doc_id, least(node, min(r)) AS root FROM reach GROUP BY node),
nw AS (SELECT doc_id, {nw_keeper} AS n_words FROM documents),
j AS (SELECT c.doc_id, c.root, nw.n_words FROM clusters c JOIN nw ON nw.doc_id = c.doc_id)
SELECT doc_id, root, n_words,
  first_value(doc_id) OVER w AS keeper_id,
  doc_id = first_value(doc_id) OVER w AS is_keeper
FROM j
WINDOW w AS (PARTITION BY root ORDER BY n_words DESC, doc_id)"""

    # BM25 top-k retrieval: generated from the SAME constants as
    # queries.q_bm25 (terms, k1, b, K) with the float expression tree
    # mirrored exactly — left-fold term sum, same parenthesization, same
    # floor(score*1e6) quantization before the (micro DESC, doc_id) rank
    from textpipe_ray.pipelines.queries import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
    )

    tf_cols = ",\n  ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf{j}"
        for j, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}"
        for j in range(len(BM25_TERMS))
    )
    k1p1, omb = repr(BM25_K1 + 1.0), repr(1.0 - BM25_B)
    term_exprs = []
    for j in range(len(BM25_TERMS)):
        idf = (
            f"ln(1.0 + ((CAST(n AS DOUBLE) - CAST(df{j} AS DOUBLE)) + 0.5)"
            f" / (CAST(df{j} AS DOUBLE) + 0.5))"
        )
        term_exprs.append(
            f"{idf} * ((CAST(tf{j} AS DOUBLE) * {k1p1}) / (CAST(tf{j} AS DOUBLE)"
            f" + {BM25_K1!r} * ({omb} + {BM25_B!r} * (CAST(dl AS DOUBLE) / avgdl))))"
        )
    score = term_exprs[0]
    for e in term_exprs[1:]:
        score = f"({score} + {e})"
    out["q_bm25"] = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents),
f AS (SELECT doc_id, len(ws) AS dl,
  {tf_cols}
  FROM toks),
st AS (SELECT count(*) AS n,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       {df_cols} FROM f),
sc AS (SELECT doc_id, {score} AS score FROM f, st)
SELECT doc_id, CAST(floor(score * 1000000.0) AS BIGINT) AS bm25_micro
FROM sc QUALIFY row_number() OVER (ORDER BY bm25_micro DESC, doc_id) <= {BM25_TOPK}"""

    # pruned-read layout variant: identical scoring, restricted to docs
    # matching >=1 query term (a zero-match doc has no posting row)
    any_tf = " + ".join(f"tf{j}" for j in range(len(BM25_TERMS)))
    out["q_bm25_layout"] = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents),
f AS (SELECT doc_id, len(ws) AS dl,
  {tf_cols}
  FROM toks),
st AS (SELECT count(*) AS n,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       {df_cols} FROM f),
sc AS (SELECT doc_id, {score} AS score FROM f, st WHERE ({any_tf}) > 0)
SELECT doc_id, CAST(floor(score * 1000000.0) AS BIGINT) AS bm25_micro
FROM sc QUALIFY row_number() OVER (ORDER BY bm25_micro DESC, doc_id) <= {BM25_TOPK}"""

    # lifecycle variant scores the SAME full corpus (base half + appended
    # half), so the oracle is identical
    out["q_bm25_append"] = out["q_bm25_layout"]

    # date-partitioned layout: day-aligned range scan (queries.q_time_layout)
    from textpipe_ray.pipelines.queries import TIME_LAYOUT_END, TIME_LAYOUT_START

    out["q_time_layout"] = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
WHERE ts >= TIMESTAMP '{TIME_LAYOUT_START}' AND ts < TIMESTAMP '{TIME_LAYOUT_END}'
GROUP BY event_type"""

    # snapshot CDC: full outer join on doc_id, text inequality = changed
    # (the engine compares 64-bit content hashes — exact at any test
    # scale, collision-improbable at corpus scale and documented)
    from textpipe_ray.pipelines.queries import CDC_CHANGE_MOD

    out["q_cdc_diff"] = f"""
WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 != 2),
b AS (SELECT doc_id,
        CASE WHEN doc_id % {CDC_CHANGE_MOD} = 0 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 3 != 0)
SELECT CAST(coalesce(a.doc_id, b.doc_id) AS BIGINT) AS doc_id,
  CASE WHEN b.doc_id IS NULL THEN 'removed'
       WHEN a.doc_id IS NULL THEN 'added'
       ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE b.doc_id IS NULL OR a.doc_id IS NULL OR a.text <> b.text"""

    # snapshot distribution drift: histograms on the DECLARED bucket
    # edges (queries.DRIFT_EDGES), TVD in exact integer micro units —
    # both engines use pure integer arithmetic, so the match is exact
    from textpipe_ray.pipelines.queries import (
        DRIFT_EDGES,
        DRIFT_TVD_MICRO_BAR,
    )

    _WS_TOKEN_RE = r"\S+"  # whitespace-token count, RE2 on both engines

    def _bucket_case(col: str, edges: tuple) -> str:
        whens = " ".join(
            f"WHEN {col} < {edges[i + 1]} THEN {i}" for i in range(len(edges) - 1)
        )
        return f"CASE {whens} ELSE {len(edges) - 1} END"

    _drift_feats = "\n       UNION ALL ".join(
        f"SELECT '{feat}' AS feature, {_bucket_case(feat, e)} AS bucket FROM {{side}}"
        for feat, e in DRIFT_EDGES.items()
    )
    out["q_drift"] = f"""
WITH src AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
a0 AS (SELECT len(text) AS n_chars,
              len(regexp_extract_all(text, {q(_WS_TOKEN_RE)})) AS n_words
       FROM src WHERE doc_id % 3 != 2),
b0 AS (SELECT len(t) AS n_chars,
              len(regexp_extract_all(t, {q(_WS_TOKEN_RE)})) AS n_words
       FROM (SELECT CASE WHEN doc_id % {CDC_CHANGE_MOD} = 0
                         THEN text || ' [rev2]' ELSE text END AS t
             FROM src WHERE doc_id % 3 != 0)),
fa AS ({_drift_feats.format(side="a0")}),
fb AS ({_drift_feats.format(side="b0")}),
ha AS (SELECT feature, bucket, count(*) AS n_a FROM fa GROUP BY 1, 2),
hb AS (SELECT feature, bucket, count(*) AS n_b FROM fb GROUP BY 1, 2),
h AS (SELECT coalesce(ha.feature, hb.feature) AS feature,
             coalesce(ha.bucket, hb.bucket) AS bucket,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      FROM ha FULL OUTER JOIN hb
        ON ha.feature = hb.feature AND ha.bucket = hb.bucket),
t AS (SELECT (SELECT count(*) FROM a0) AS na, (SELECT count(*) FROM b0) AS nb),
w AS (SELECT feature, bucket, n_a, n_b,
        CASE WHEN t.na = 0 AND t.nb = 0 THEN 0
             WHEN t.na = 0 OR t.nb = 0 THEN 1000000
             ELSE (1000000 * SUM(ABS(n_a * t.nb - n_b * t.na)) OVER (PARTITION BY feature))
                    // (2 * t.na * t.nb) END AS tvd_micro
      FROM h CROSS JOIN t)
SELECT feature, CAST(bucket AS BIGINT) AS bucket,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(tvd_micro AS BIGINT) AS tvd_micro,
       tvd_micro >= {DRIFT_TVD_MICRO_BAR} AS drifted
FROM w"""

    # repeat-upsampling: same factor clamp, same md5-prefix shard math
    from textpipe_ray.pipelines.queries import (
        EPOCH_MIX_MAX_FACTOR,
        EPOCH_MIX_SHARDS,
        EPOCH_MIX_TARGET,
    )

    out["q_epoch_mix"] = f"""
WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
f AS (SELECT source,
        least(greatest({EPOCH_MIX_TARGET} // n, 1), {EPOCH_MIX_MAX_FACTOR}) AS factor
      FROM n),
r AS (SELECT d.doc_id, d.source,
        unnest(generate_series(0, f.factor - 1)) AS epoch
      FROM documents d JOIN f USING (source))
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(epoch AS BIGINT) AS epoch,
  CAST(('0x' || substr(md5('epoch:' || CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT)
    % {EPOCH_MIX_SHARDS} AS shard
FROM r"""

    # bitext mining: mutual-best cosine with the q_ann_topk quantize +
    # min-id tie-break contract; threshold applied on the quantized value
    from textpipe_ray.pipelines.queries import BITEXT_MIN_COS_Q

    out["q_bitext_mine"] = f"""
WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id % 2 = 1),
s AS (SELECT a.vec_id sa, b.vec_id sb,
       CAST(floor(list_cosine_similarity(a.e, b.e) * 1e9) AS BIGINT) q
      FROM a CROSS JOIN b),
ab AS (SELECT sa, sb, q, row_number() OVER (PARTITION BY sa ORDER BY q DESC, sb) r FROM s),
ba AS (SELECT sa, sb, row_number() OVER (PARTITION BY sb ORDER BY q DESC, sa) r FROM s)
SELECT ab.sa AS src_id, ab.sb AS tgt_id
FROM ab JOIN ba USING (sa, sb)
WHERE ab.r = 1 AND ba.r = 1 AND ab.q >= {BITEXT_MIN_COS_Q}"""

    # OLAP reshaping family: integer-unit measures so every sum is
    # order-independent (queries.q_rollup / q_pivot)
    from textpipe_ray.pipelines.queries import PIVOT_LANGS, ROLLUP_ALL

    out["q_rollup"] = f"""
WITH f AS (SELECT l_returnflag, l_linestatus,
                  CAST(floor(l_quantity) AS BIGINT) AS qty,
                  CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS pcents
           FROM lineitem)
SELECT coalesce(l_returnflag, '{ROLLUP_ALL}') AS rflag,
       coalesce(l_linestatus, '{ROLLUP_ALL}') AS lstatus,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(pcents) AS BIGINT) AS sum_price_cents,
       CAST(count(*) AS BIGINT) AS n
FROM f GROUP BY ROLLUP(l_returnflag, l_linestatus)"""

    lang_cells = ",\n       ".join(
        f"CAST(sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{lg}"
        for lg in PIVOT_LANGS
    )
    declared = ", ".join(f"'{lg}'" for lg in PIVOT_LANGS)
    out["q_pivot"] = f"""
SELECT source,
       {lang_cells},
       CAST(sum(CASE WHEN lang NOT IN ({declared}) THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source"""

    return out


def golden_oracle_sql() -> dict[str, str]:
    """Golden-parquet oracles for queries DuckDB cannot compute
    (model-scored / sketch / pipeline outputs): the committed golden
    table for the running input scale is read back, discriminated by a
    content hash of the input's first document (see
    scripts/make_goldens.py — regenerate + recommit after intentional
    kernel changes).  Moves these queries from rows-only to full
    value-hash checks."""
    import json
    from pathlib import Path

    manifest_path = Path(__file__).resolve().parents[2] / "goldens" / "manifest.json"
    if not manifest_path.exists():
        return {}
    with open(manifest_path, "r", encoding="utf8") as f:
        manifest = json.load(f)
    disc = manifest["discriminator_sql"]
    base = manifest_path.parent
    out: dict[str, str] = {}
    for name, entries in manifest["queries"].items():
        branches = [
            f"SELECT g.* FROM read_parquet('{base / e['file']}') g "
            f"WHERE {disc} = '{e['input_md5']}'"
            for e in entries
        ]
        out[name] = "\nUNION ALL\n".join(branches)
    return out


def complexity_expr(text: str = "text") -> str:
    w = count_expr(f"lower({text})", ALPHA_WORD_RE2)
    vg = count_expr(f"lower({text})", VOWEL_GROUP_RE2)
    cw = count_expr(f"lower({text})", CONSONANT_WORD_RE2)
    s = count_expr(text, SENT_RE2)
    return (
        f"(CASE WHEN ({vg} + {cw}) = 0 OR {w} = 0 OR {s} = 0 THEN 100.0 "
        f"ELSE 206.835 - 1.015 * (CAST({w} AS DOUBLE) / CAST(greatest({s}, 1) AS DOUBLE)) "
        f"- 84.6 * (CAST({vg} + {cw} AS DOUBLE) / CAST(greatest({w}, 1) AS DOUBLE)) END)"
    )
