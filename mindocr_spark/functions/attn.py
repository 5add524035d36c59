"""Attention-head label decode (the reference's ``RecAttnLabelDecode``,
``mindocr/postprocess/rec_postprocess.py:255-366``).

Class layout: index 0 = <GO>, index 1 = <STOP>, then the character dict —
``num_classes = 2 + len(CHARSET)``. Decode semantics follow the reference
exactly: argmax per step, cut at the first <STOP>, text = the chars before
it (a predicted <GO> inside the prefix is emitted literally, as the
reference's dict-join does), confidence = mean of the per-step max
probabilities before <STOP>; no <STOP> anywhere -> empty text with the
reference's sentinel confidence 0.0.
"""

from __future__ import annotations

import numpy as np

from ..config import CHARSET

ATTN_GO_IDX = 0
ATTN_STOP_IDX = 1
ATTN_NUM_CLASSES = 2 + len(CHARSET)

_CHARS = ["<GO>", "<STOP>", *CHARSET]


def attn_greedy_decode(logits: np.ndarray) -> tuple[str, float]:
    """logits: (T, 2 + num_chars) float. Returns (text, confidence)."""
    if logits.size == 0:
        return "", 0.0
    ids = logits.argmax(axis=1)
    probs = logits[np.arange(len(ids)), ids]
    stop = np.nonzero(ids == ATTN_STOP_IDX)[0]
    if len(stop) == 0:
        return "", 0.0
    eos = int(stop[0])
    text = "".join(_CHARS[i] for i in ids[:eos])
    if eos == 0:
        return "", 0.0
    conf = float(np.asarray(probs[:eos], dtype=np.float32).mean())
    return text, conf


def attn_logits_from_analysis(
    analysis: list[tuple[tuple[int, int, int, int], np.ndarray]],
) -> np.ndarray:
    """Glyph analyses (``kernels/rec.py:analyze_crop``) -> (T, 2+36) probs in
    the attention-head contract: one step per glyph (char scores at offset
    2), then a <STOP> step — the deterministic stand-in for a RARE/attention
    forward, sharing the same crop analysis as the CTC head (the two heads
    differ only in sequence framing, like the reference's model zoo)."""
    steps: list[np.ndarray] = []
    for _box, sims in analysis:
        row = np.zeros(ATTN_NUM_CLASSES, dtype=np.float32)
        row[2 : 2 + len(sims)] = sims
        steps.append(row)
    stop = np.zeros(ATTN_NUM_CLASSES, dtype=np.float32)
    stop[ATTN_STOP_IDX] = 1.0
    steps.append(stop)
    return np.stack(steps).astype(np.float32)
