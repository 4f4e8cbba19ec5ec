"""Emoji → unicode name + sentiment table.

Mirrors the shape of the reference's generated data module
(/root/reference/textpipe/data/emoji.py: ``EMOJI_TO_UNICODE_NAME``,
``EMOJI_TO_SENTIMENT``, sentiment = (pos-neg)/max(100, pos+neut+neg),
emoji.py:26-30 — the public Emoji Sentiment Ranking formula).  The
occurrence counts here are this repo's own small deterministic table —
swap in the full public ranking data for production use.
"""

# emoji: (unicode_name, pos, neutral, neg)
_EMOJI_DATA: dict[str, tuple[str, int, int, int]] = {
    "😀": ("GRINNING FACE", 300, 150, 50),
    "😂": ("FACE WITH TEARS OF JOY", 5000, 2000, 1000),
    "😊": ("SMILING FACE WITH SMILING EYES", 800, 300, 100),
    "😍": ("SMILING FACE WITH HEART-SHAPED EYES", 1500, 400, 150),
    "😋": ("FACE SAVOURING DELICIOUS FOOD", 400, 150, 50),
    "😢": ("CRYING FACE", 100, 200, 500),
    "😭": ("LOUDLY CRYING FACE", 300, 400, 900),
    "😡": ("POUTING FACE", 50, 150, 700),
    "👍": ("THUMBS UP SIGN", 900, 300, 80),
    "👎": ("THUMBS DOWN SIGN", 40, 100, 400),
    "❤": ("HEAVY BLACK HEART", 2000, 500, 150),
    "💔": ("BROKEN HEART", 100, 200, 800),
    "🔥": ("FIRE", 500, 300, 120),
    "🎉": ("PARTY POPPER", 700, 200, 40),
    "😐": ("NEUTRAL FACE", 80, 500, 150),
    "😴": ("SLEEPING FACE", 150, 400, 120),
    "🙏": ("PERSON WITH FOLDED HANDS", 600, 250, 90),
    "💩": ("PILE OF POO", 120, 200, 350),
    "🤔": ("THINKING FACE", 200, 600, 180),
    "😅": ("SMILING FACE WITH OPEN MOUTH AND COLD SWEAT", 350, 250, 120),
}


def _sentiment(pos: int, neut: int, neg: int) -> float:
    # exact formula of the reference's generator (emoji.py:26-30)
    return (pos - neg) / max(100, pos + neut + neg)


EMOJI_TO_UNICODE_NAME: dict[str, str] = {e: v[0] for e, v in _EMOJI_DATA.items()}
EMOJI_TO_SENTIMENT: dict[str, float] = {
    e: _sentiment(v[1], v[2], v[3]) for e, v in _EMOJI_DATA.items()
}
