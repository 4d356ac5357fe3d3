"""Text normalization utilities (reference scripts/utils/data_utils.py:18-31)."""

import re


def normalize_string(s):
    """Lowercase, trim, isolate punctuation, strip non-letters."""
    s = s.lower().strip()
    s = re.sub(r"([,.!?])", r" \1 ", s)     # isolate some marks
    s = re.sub(r"(['])", r"", s)            # remove apostrophe
    s = re.sub(r"[^a-zA-Z,.!?]+", r" ", s)  # other characters -> whitespace
    s = re.sub(r"\s+", r" ", s).strip()
    return s


def remove_tags_marks(text):
    """Strip SSML/HTML tags and punctuation (used by TTS input cleanup)."""
    reg_expr = re.compile("<.*?>|[.,:;!?]+")
    return re.sub(reg_expr, "", text)
