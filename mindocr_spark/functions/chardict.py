"""Character-dictionary handling (reference ``rec_postprocess.py:57-99`` and
LMDB label filtering ``rec_lmdb_dataset.py:142-199``).

- ``load_char_dict``: one char per line; optional space char appended; the
  CTC blank is appended last (``blank_at_last``).
- ``ctc_effective_len``: a CTC decoder needs an extra timestep between
  consecutive duplicate characters, so the effective label length is
  ``len + #adjacent-duplicates`` (``count_extra_len_if_repeated``).
- ``valid_rec_label``: the reference's keep-predicate: effective length
  within ``max_text_len`` and at least one in-dictionary character.
"""

from __future__ import annotations

from ..config import CHARSET


def load_char_dict(path: str | None = None, use_space_char: bool = False) -> list[str]:
    """Returns the character list (without the blank); ``None`` path gives
    the default 36-char lowercase-alnum dict."""
    if path is None:
        chars = list(CHARSET)
    else:
        with open(path, encoding="utf-8") as f:
            chars = [line.rstrip("\n\r") for line in f if line.rstrip("\n\r") != ""]
    if use_space_char and " " not in chars:
        chars.append(" ")
    return chars


def ctc_effective_len(text: str) -> int:
    """len(text) plus one per adjacent duplicate pair (CTC needs a blank
    step between repeats)."""
    extra = sum(1 for a, b in zip(text, text[1:]) if a == b)
    return len(text) + extra


def valid_rec_label(
    text: str, max_text_len: int, charset: str | list[str] | None = None
) -> bool:
    """Keep-predicate for recognition labels: non-empty after filtering to
    the dictionary, and CTC-effective length within the budget."""
    chars = set(charset if charset is not None else CHARSET)
    filtered = "".join(c for c in text if c in chars)
    if not filtered:
        return False
    return ctc_effective_len(text) <= max_text_len
