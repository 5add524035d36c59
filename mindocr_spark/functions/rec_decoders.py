"""The remaining recognition decode heads (round 5): Master, SAR,
ABINet, VisionLAN — pure-numpy, reference-exact.

These complete SURVEY §2.8's decode family beyond CTC
(``functions/ctc.py``) and RARE-attention (``functions/attn.py``).  The
NN forwards stay excluded (§2.13); what each class contributes beyond its
network is a distinct DECODE contract — vocabulary layout, stop/pad
semantics, confidence formula — and those are carried here exactly:

- ``master_decode`` — ``RecMasterLabelDecode``
  (``mindocr/postprocess/rec_postprocess.py:363-460``): vocabulary
  ``[<GO>, <STOP>, <PAD>] + chars (+ <UNKNOWN>)``, decode inherited from
  ``RecAttnLabelDecode`` (:318-347): cut at the first ``<STOP>``, join
  the tokens before it verbatim (a ``<PAD>`` inside the prefix is emitted
  literally, as the reference's dict-join does), confidence = mean of the
  per-step probabilities before the stop, ``[0]`` when no stop.
- ``sar_decode`` — ``SARLabelDecode`` (:494-547): vocabulary
  ``chars + [<UKN>, <BOS/EOS>, <PAD>]`` with start == end index, skip
  ``<PAD>``, break at ``<BOS/EOS>`` (at position 0 it is skipped instead
  when no probabilities are given), optional ``rm_symbol`` lowercase +
  strip-non-alnum cleanup.
- ``abinet_decode`` — ``ABINetLabelDecode``
  (``rec_abinet_postprocess.py:15-55``) over ``CharsetMapper``
  (``models/utils/abinet_layers.py:97-128``): charset
  ``'░abcdefghijklmnopqrstuvwxyz1234567890'`` with the null char at
  index 0, softmax -> per-step argmax -> text cut at the first null,
  length = min(len(text)+1, max_length).
- ``visionlan_decode`` — ``VisionLANPostProcess`` (:399-491): blank at
  index 0, per-sample length = first step whose argmax is blank (+1),
  else max_text_length; softmax over the kept steps; chars for idx > 0
  (blank contributes ''); confidence = exp(sum(log p) / (n + 1e-6)) —
  the reference's length-normalized geometric mean.
"""

from __future__ import annotations

import re

import numpy as np

from ..config import CHARSET

# --- Master -----------------------------------------------------------------

MASTER_GO_IDX, MASTER_STOP_IDX, MASTER_PAD_IDX = 0, 1, 2
MASTER_UNKNOWN_TOKEN = "<UNKNOWN>"


def master_charset(use_unknown_char: bool = False) -> list[str]:
    chars = ["<GO>", "<STOP>", "<PAD>", *CHARSET]
    if use_unknown_char:
        chars.append(MASTER_UNKNOWN_TOKEN)
    return chars


def master_decode(
    char_indices: np.ndarray,
    probs: np.ndarray | None = None,
    use_unknown_char: bool = False,
) -> tuple[list[str], list[float]]:
    """(B, T) indices -> (texts, confs), RecAttnLabelDecode.decode over
    the Master vocabulary."""
    chars = master_charset(use_unknown_char)
    texts: list[str] = []
    confs: list[float] = []
    for b in range(len(char_indices)):
        toks = [chars[int(i)] for i in char_indices[b]]
        eos = toks.index("<STOP>") if "<STOP>" in toks else -1
        if eos != -1:
            texts.append("".join(toks[:eos]))
        else:
            texts.append("")
        if probs is not None and eos != -1:
            conf = probs[b][:eos]
        else:
            conf = [0]
        confs.append(float(np.mean(conf)) if len(conf) else float("nan"))
    return texts, confs


# --- SAR --------------------------------------------------------------------


def sar_charset() -> list[str]:
    return [*CHARSET, "<UKN>", "<BOS/EOS>", "<PAD>"]


SAR_UNKNOWN_IDX = len(CHARSET)
SAR_START_IDX = SAR_END_IDX = len(CHARSET) + 1
SAR_PADDING_IDX = len(CHARSET) + 2

_RM_SYMBOL_RE = re.compile("[^A-Z^a-z^0-9^一-龥]")


def sar_decode(
    char_indices: np.ndarray,
    probs: np.ndarray | None = None,
    rm_symbol: bool = False,
) -> tuple[list[str], list[float]]:
    """(B, T) indices -> (texts, confs), SARLabelDecode.decode semantics:
    skip padding, break at <BOS/EOS> (skipped at idx 0 when probs is
    None), conf = mean of kept-step probabilities."""
    chars = sar_charset()
    texts: list[str] = []
    confs: list[float] = []
    for b in range(len(char_indices)):
        kept: list[str] = []
        conf: list[float] = []
        for idx, ci in enumerate(char_indices[b]):
            ci = int(ci)
            if ci == SAR_PADDING_IDX:
                continue
            if ci == SAR_END_IDX:
                if probs is None and idx == 0:
                    continue
                break
            kept.append(chars[ci])
            conf.append(float(probs[b][idx]) if probs is not None else 1.0)
        text = "".join(kept)
        if rm_symbol:
            text = _RM_SYMBOL_RE.sub("", text.lower())
        texts.append(text)
        confs.append(float(np.mean(conf)) if conf else float("nan"))
    return texts, confs


# --- ABINet -----------------------------------------------------------------

ABINET_CHARSET = "░abcdefghijklmnopqrstuvwxyz1234567890"
ABINET_NULL_CHAR = "░"
ABINET_MAX_LENGTH = 26


def abinet_decode(
    logits: np.ndarray, max_length: int = ABINET_MAX_LENGTH
) -> dict:
    """(B, T, 37) raw logits -> {"texts", "scores", "lengths"}:
    softmax, argmax per step via CharsetMapper, text cut at the first
    null char and trimmed; scores = per-step max probabilities; length =
    min(len(text) + 1, max_length) (one for the end token)."""
    logits = np.asarray(logits, dtype=np.float64)
    e = np.exp(logits - logits.max(axis=2, keepdims=True))
    soft = e / e.sum(axis=2, keepdims=True)
    texts: list[str] = []
    scores: list[np.ndarray] = []
    lengths: list[int] = []
    for o in soft:
        ids = o.argmax(axis=1)
        raw = "".join(ABINET_CHARSET[int(i)] for i in ids)
        text = raw.split(ABINET_NULL_CHAR)[0]
        texts.append(text.replace(ABINET_NULL_CHAR, ""))
        scores.append(o.max(axis=1))
        lengths.append(min(len(text) + 1, max_length))
    return {"texts": texts, "scores": scores, "lengths": lengths}


# --- VisionLAN --------------------------------------------------------------


def visionlan_decode(
    text_pre: np.ndarray, max_text_length: int = 25
) -> dict:
    """(B, T, C) PRE-softmax step scores with the blank at index 0
    (blank_at_last=False) -> {"texts", "confs", "raw_chars"}.

    Per sample: prediction length = 1 + the first step whose top-1 class
    is blank (max_text_length when blank never wins); softmax over the
    kept steps; characters for indices in [1, num_chars], blank -> '';
    confidence = exp(sum(log p_top1) / (n + 1e-6))."""
    text_pre = np.asarray(text_pre, dtype=np.float64)
    b = text_pre.shape[0]
    nsteps = max_text_length
    texts: list[str] = []
    confs: list[float] = []
    raw_chars: list[list[str]] = []
    for i in range(b):
        steps = text_pre[i][:nsteps]
        ids = steps.argmax(axis=1)
        blank_hits = np.nonzero(ids == 0)[0]
        length = int(blank_hits[0]) + 1 if len(blank_hits) else nsteps
        kept = steps[:length]
        e = np.exp(kept)
        soft = e / (e.sum(axis=1, keepdims=True) + 1e-7)
        top = soft.argmax(axis=1)
        chars = [
            CHARSET[int(t) - 1] if 0 < int(t) <= len(CHARSET) else ""
            for t in top
        ]
        probs = soft.max(axis=1)
        conf = float(np.exp(np.log(probs).sum() / (probs.shape[0] + 1e-6)))
        texts.append("".join(chars))
        raw_chars.append(chars)
        confs.append(conf)
    return {"texts": texts, "confs": confs, "raw_chars": raw_chars}


# --- deterministic-scorer framings (end-to-end reachability) ----------------
# Same contract as functions/attn.attn_logits_from_analysis: one step per
# glyph from the shared crop analysis (kernels/rec.analyze_crop), then the
# head's own stop token — the heads differ only in vocabulary layout and
# sequence framing, like the reference's rec model zoo.


def master_logits_from_analysis(analysis) -> np.ndarray:
    """Glyph analyses -> (T, 3 + num_chars) probs in the Master head
    contract (char scores at offset 3, <STOP> step at index 1)."""
    n = 3 + len(CHARSET)
    steps: list[np.ndarray] = []
    for _box, sims in analysis:
        row = np.zeros(n, dtype=np.float32)
        row[3 : 3 + len(sims)] = sims
        steps.append(row)
    stop = np.zeros(n, dtype=np.float32)
    stop[MASTER_STOP_IDX] = 1.0
    steps.append(stop)
    return np.stack(steps).astype(np.float32)


def sar_logits_from_analysis(analysis) -> np.ndarray:
    """Glyph analyses -> (T, num_chars + 3) probs in the SAR head
    contract (chars at their own indices, <BOS/EOS> step at the end)."""
    n = len(CHARSET) + 3
    steps: list[np.ndarray] = []
    for _box, sims in analysis:
        row = np.zeros(n, dtype=np.float32)
        row[: len(sims)] = sims
        steps.append(row)
    stop = np.zeros(n, dtype=np.float32)
    stop[SAR_END_IDX] = 1.0
    steps.append(stop)
    return np.stack(steps).astype(np.float32)


def master_greedy_decode(logits: np.ndarray) -> tuple[str, float]:
    """(T, 3+36) probs -> (text, conf) — the single-sequence wrapper the
    fused kernel uses."""
    if logits.size == 0:
        return "", 0.0
    ids = logits.argmax(axis=1)[None, :]
    probs = logits.max(axis=1)[None, :]
    texts, confs = master_decode(ids, probs)
    return texts[0], float(confs[0])


def sar_greedy_decode(logits: np.ndarray) -> tuple[str, float]:
    if logits.size == 0:
        return "", 0.0
    ids = logits.argmax(axis=1)[None, :]
    probs = logits.max(axis=1)[None, :]
    texts, confs = sar_decode(ids, probs)
    c = float(confs[0])
    return texts[0], (0.0 if np.isnan(c) else c)
