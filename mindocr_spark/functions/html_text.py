"""HTML boilerplate-strip / main-content extraction (the text-span path).

The reference has no text path (it is pure OCR); ``BASELINE.json:north_rule``
requires one. This is a deterministic Arc90/boilerpipe-style heuristic built
only on stdlib: strip script/style/comments, split into block elements, score
blocks by text density and link density, keep content blocks, normalize
whitespace. Pure function of the input string, so the oracle and the Spark
pandas UDF share it bit-for-bit.
"""

from __future__ import annotations

import html as _html
import re

_RE_SCRIPT = re.compile(r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_RE_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_BOILER_CONTAINER = re.compile(
    r"<(nav|footer|header|aside|form)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_RE_BLOCK_SPLIT = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|td|tr|table|section|article|main|blockquote)\b[^>]*>",
    re.I,
)
_RE_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _RE_WS.sub(" ", s).strip()


def extract_main_text(raw: str) -> str:
    """HTML (or plain text) -> main content, single-space normalized.

    Blocks dominated by anchor text (link density > 0.5) or too short to be
    prose (< 2 words after tag strip) are dropped as boilerplate; remaining
    blocks are joined by a single space in document order.
    """
    if raw is None:
        return ""
    if "<" not in raw:
        return _norm(raw)
    s = _RE_COMMENT.sub(" ", raw)
    s = _RE_HEAD.sub(" ", s)  # <title>/meta live in <head>, never content
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_BOILER_CONTAINER.sub(" ", s)
    blocks = _RE_BLOCK_SPLIT.split(s)
    kept: list[str] = []
    for block in blocks:
        anchor_text = " ".join(m for m in _RE_ANCHOR.findall(block))
        anchor_len = len(_norm(_RE_TAG.sub(" ", anchor_text)))
        text = _norm(_html.unescape(_RE_TAG.sub(" ", block)))
        if not text:
            continue
        link_density = anchor_len / len(text) if text else 1.0
        n_words = len(text.split())
        if link_density > 0.5:
            continue
        if n_words < 2:
            continue
        kept.append(text)
    return _norm(" ".join(kept))
