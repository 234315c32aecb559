"""Text helpers for TTS frontends.

Equivalents of the reference's contains_cjk / prepare_tts_text
(src/utils/mod.rs:724-800), used by the Moss-TTS processor
(moss_tts_nano/processor.rs:119-121) to normalize target/prompt text
before tokenization.
"""

from __future__ import annotations

_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # CJK Unified Ideographs Extension A
    (0x3040, 0x30FF),   # Hiragana and Katakana
    (0xAC00, 0xD7AF),   # Hangul Syllables
)

_CJK_END_PUNCT = set("。！？….!?")


def contains_cjk(text: str) -> bool:
    """True if any char is CJK/Kana/Hangul (utils/mod.rs:724-738)."""
    for ch in text:
        c = ord(ch)
        for lo, hi in _CJK_RANGES:
            if lo <= c <= hi:
                return True
    return False


def prepare_tts_text(text: str) -> str:
    """Normalize text for TTS synthesis (utils/mod.rs:740-800).

    - collapse newlines and repeated spaces
    - CJK: ensure a sentence-final punctuation mark (append '。')
    - non-CJK: capitalize the first letter, append '.' after a trailing
      alphanumeric, and left-pad very short texts (<5 words) with 8 spaces
      so the model has warm-up frames
    """
    normalized = text.strip()
    if not normalized:
        raise ValueError("Text cannot be empty.")
    normalized = normalized.replace("\n", " ").replace("\r", " ")
    while "  " in normalized:
        normalized = normalized.replace("  ", " ")

    if contains_cjk(normalized):
        if normalized[-1] not in _CJK_END_PUNCT:
            normalized += "。"
        return normalized

    first = normalized[0]
    if "a" <= first <= "z":
        normalized = first.upper() + normalized[1:]
    if normalized[-1].isalnum():
        normalized += "."
    if len(normalized.split()) < 5:
        normalized = " " * 8 + normalized
    return normalized
