"""Emoji → unicode name + sentiment table.

The data is the public **Emoji Sentiment Ranking 1.0** (Kralj Novak,
Petra; Smailović, Jasmina; Sluban, Borut; Mozetič, Igor, 2015 —
Slovenian language resource repository CLARIN.SI,
http://hdl.handle.net/11356/1048), the same dataset behind the
reference's generated data module (/root/reference/textpipe/data/
emoji.py), with sentiment = (pos - neg) / max(100, pos + neut + neg)
(emoji.py:26-30).  Stored here as a JSON sidecar
(``emoji_sentiment_ranking.json``: emoji → [unicode_name, sentiment])
and loaded once at import; the ``Emojis`` op's doctest-parity values
(reference doc.py:266-270) are asserted in tests/test_ops_registry.py.
"""

from __future__ import annotations

import json
from pathlib import Path

_DATA_PATH = Path(__file__).resolve().parent / "emoji_sentiment_ranking.json"

with open(_DATA_PATH, "r", encoding="utf8") as _f:
    _EMOJI_DATA: dict[str, list] = json.load(_f)

EMOJI_TO_UNICODE_NAME: dict[str, str] = {e: v[0] for e, v in _EMOJI_DATA.items()}
EMOJI_TO_SENTIMENT: dict[str, float] = {e: float(v[1]) for e, v in _EMOJI_DATA.items()}
