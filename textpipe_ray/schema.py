"""Column constants + Arrow schemas for the engine's tables.

Input `pages` schema is fixed by the north rule (BASELINE.json
``input_hint``): Common-Crawl-style web pages.
"""

from __future__ import annotations

import pyarrow as pa

# ---- pages (flagship input) -------------------------------------------------
URL = "url"
WARC_TS = "warc_ts"
HTML = "html"
TEXT = "text"
LANG = "lang"

PAGES_SCHEMA = pa.schema(
    [
        (URL, pa.string()),
        (WARC_TS, pa.timestamp("us")),
        (HTML, pa.binary()),
        (TEXT, pa.string()),
        (LANG, pa.string()),
    ]
)

# ---- columns appended by pipeline stages -----------------------------------
CLEAN = "clean"                 # extracted+normalised text (byte-identity invariant)
PRED_LANG = "pred_lang"         # language-ID output
LANG_RELIABLE = "lang_reliable"
LANG_MARGIN = "lang_margin"
RESOLVED_LANG = "resolved_lang"  # lang if reliable else hint (doc.py:146 rule)
PERPLEXITY = "perplexity"
KEEP = "keep"
DROP_REASON = "drop_reason"     # first failing rule name, '' if kept
SCRUBBED = "scrubbed_text"
PART_ID = "part_id"             # url-hash partition id
CONTENT_HASH = "content_hash"   # md5 hex of clean text (exact dedup key)

# documents table (driver-provided)
DOC_ID = "doc_id"
DOC_TEXT = "text"
DOC_LANG = "lang"
DOC_SOURCE = "source"
