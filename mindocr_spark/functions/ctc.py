"""CTC greedy decode (the reference's ``RecCTCLabelDecode``).

Semantics follow ``mindocr/postprocess/rec_postprocess.py:101-164`` exactly:
argmax per timestep -> drop consecutive duplicates -> drop blank (appended at
the last index) -> map through the character dict; confidence = mean of the
max-probabilities at the kept positions (empty decode -> conf 0.0).
"""

from __future__ import annotations

import numpy as np

from ..config import BLANK_IDX, CHARSET


def ctc_greedy_decode(logits: np.ndarray) -> tuple[str, float]:
    """logits: (T, num_classes) float. Returns (text, confidence)."""
    if logits.size == 0:
        return "", 0.0
    ids = logits.argmax(axis=1)
    probs = logits[np.arange(len(ids)), ids]
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]  # remove consecutive duplicates
    keep &= ids != BLANK_IDX  # remove blank
    if not keep.any():
        return "", 0.0
    text = "".join(CHARSET[i] for i in ids[keep])
    conf = float(np.asarray(probs[keep], dtype=np.float32).mean())
    return text, conf
