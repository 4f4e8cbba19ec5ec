"""Regex PII / toxicity scrubbing.

The reference's analog is ``Doc.match`` — a pattern matcher over the
cleaned text returning ``[(span, rule_name)]``
(/root/reference/textpipe/doc.py:246-258); the scrub stage is the
north-rule extension of it: count matches per rule, then rewrite the
text with replacement tokens.

Rules are a versioned committed artifact (``models/scrub_rules.json``)
applied IN ORDER (order matters: credit-card before phone, or the
phone pattern eats card digits).  All patterns are RE2-safe (no
backreferences / lookaround) so the identical pattern + order runs in
the Arrow stage (``pc.replace_substring_regex``), in DuckDB oracle SQL
(nested ``regexp_replace(..., 'g')``), and scalar here.
"""

from __future__ import annotations

import functools as _functools

import json
from pathlib import Path

import regex as _regex

SCRUB_RULES_PATH = Path(__file__).resolve().parents[2] / "models" / "scrub_rules.json"

# Demo toxicity lexicon (placeholder terms — swap for a production list).
TOXIC_TERMS = ["idiot", "stupid", "moron", "scum", "garbagehead", "hateful"]

from textpipe_ray.functions.tokenize import assert_plain_terms  # noqa: E402

assert_plain_terms(TOXIC_TERMS, "TOXIC_TERMS")

DEFAULT_RULES = {
    "version": 1,
    "rules": [
        {"name": "email", "pattern": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "replacement": "<EMAIL>"},
        {"name": "url", "pattern": r"https?://[^\s]+", "replacement": "<URL>"},
        {"name": "ip", "pattern": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "replacement": "<IP>"},
        {"name": "ssn", "pattern": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "replacement": "<SSN>"},
        {"name": "credit_card", "pattern": r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b", "replacement": "<CC>"},
        {"name": "phone", "pattern": r"\+[0-9][0-9() -]{6,}[0-9]|\b[0-9]{3}[ -][0-9]{3}[ -][0-9]{4}\b", "replacement": "<PHONE>"},
        {"name": "placeholder", "pattern": r"<<[^>]*>>", "replacement": ""},
        {"name": "toxic", "pattern": r"(?i)\b(?:" + "|".join(TOXIC_TERMS) + r")\b", "replacement": "<TOXIC>"},
    ],
}


@_functools.lru_cache(maxsize=8)
def load_rules(path: str | Path = SCRUB_RULES_PATH) -> dict:
    with open(path, "r", encoding="utf8") as f:
        return json.load(f)


class Scrubber:
    """Compiled rule set; build once per worker, apply per doc/batch."""

    def __init__(self, rules: dict | None = None):
        rules = rules if rules is not None else load_rules()
        self.version = rules["version"]
        self.rules = [
            (r["name"], _regex.compile(r["pattern"]), r["replacement"]) for r in rules["rules"]
        ]

    def scrub(self, text: str) -> tuple[str, dict[str, int]]:
        """→ (scrubbed_text, {rule_name: match_count})."""
        counts: dict[str, int] = {}
        for name, creg, repl in self.rules:
            text, n = creg.subn(repl, text)
            counts[name] = n
        return text, counts


def main() -> None:  # pragma: no cover
    SCRUB_RULES_PATH.parent.mkdir(parents=True, exist_ok=True)
    with open(SCRUB_RULES_PATH, "w", encoding="utf8") as f:
        json.dump(DEFAULT_RULES, f, indent=2, sort_keys=True)
    print(f"wrote {SCRUB_RULES_PATH}")


if __name__ == "__main__":  # pragma: no cover
    main()
