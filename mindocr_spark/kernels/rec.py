"""Recognition scorer: crop -> CTC logits via glyph template matching.

``rec_resize_norm`` mirrors RecResizeNormForInfer (keep-ratio resize to
target height 32, width capped at ``target_h * max_wh_ratio``;
``mindocr/data/transforms/rec_transforms.py:548-636``).

``rec_logits`` is the deterministic stand-in for the CRNN/CTC forward: the
binarized crop is segmented into ink column-runs (glyph candidates), each
glyph is area-resampled to the 7x5 font grid and matched against all 36
templates; output is a (T, 37) prob array with blanks between glyph steps,
satisfying the reference's rec contract ``[T, num_classes]``
(``rec_postprocess.py:139-157``) so ``ctc_greedy_decode`` applies unchanged.
Confidence therefore equals the mean template-match similarity of the kept
characters — garbage crops score low and fall to the drop-score filter.
"""

from __future__ import annotations

import numpy as np

from ..config import BLANK_IDX, NUM_CLASSES, REC_MAX_WH_RATIO, REC_TARGET_HEIGHT
from ..functions.glyphs import GLYPH_H, GLYPH_W, templates
from ..functions.imaging import resize_bilinear

_INK_THRESH = 128.0


def rec_resize_norm(crop: np.ndarray) -> np.ndarray:
    """Crop (float gray) -> float32 (32, W') keep-ratio, W' capped."""
    h, w = crop.shape[:2]
    target_h = REC_TARGET_HEIGHT
    ratio = target_h / max(h, 1)
    target_w = max(1, int(round(w * ratio)))
    max_w = int(target_h * REC_MAX_WH_RATIO)
    target_w = min(target_w, max_w)
    return resize_bilinear(crop, target_h, target_w)


from functools import lru_cache


@lru_cache(maxsize=4096)
def _area_grid(h: int, w: int, out_h: int, out_w: int):
    ys = np.linspace(0.0, float(h), out_h + 1)
    xs = np.linspace(0.0, float(w), out_w + 1)
    y0 = np.minimum(ys.astype(np.int64), h)
    x0 = np.minimum(xs.astype(np.int64), w)
    y1 = np.minimum(y0 + 1, h)
    x1 = np.minimum(x0 + 1, w)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    areas = np.outer(np.diff(ys), np.diff(xs))
    return y0, x0, y1, x1, fy, fx, areas


def area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-average resample (like cv2 INTER_AREA) via the integral
    image evaluated (bilinearly — exact for piecewise-constant pixels) at
    fractional cell boundaries."""
    h, w = img.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(img, axis=0, dtype=np.float64, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])

    y0, x0, y1, x1, fy, fx, areas = _area_grid(h, w, out_h, out_w)
    yi0 = y0[:, None]
    yi1 = y1[:, None]
    a = ii[yi0, x0[None, :]]
    b = ii[yi0, x1[None, :]]
    c = ii[yi1, x0[None, :]]
    d = ii[yi1, x1[None, :]]
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    grid = top + (bot - top) * fy
    cell = grid[1:, 1:] - grid[:-1, 1:] - grid[1:, :-1] + grid[:-1, :-1]
    return (cell / areas).astype(np.float32)


def _segment_glyphs(ink: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Binary ink mask -> list of glyph boxes (y0, y1, x0, x1) from column
    runs; each run's row extent is its own ink bounding rows."""
    cols = ink.any(axis=0)
    if not cols.any():
        return []
    padded = np.concatenate(([False], cols, [False]))
    d = np.diff(padded.astype(np.int8))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    boxes = []
    for x0, x1 in zip(starts, ends):
        rows = np.nonzero(ink[:, x0:x1].any(axis=1))[0]
        boxes.append((int(rows[0]), int(rows[-1]) + 1, int(x0), int(x1)))
    return boxes


_BBOX_TEMPLATES: np.ndarray | None = None


def _bbox_templates() -> np.ndarray:
    """Templates cropped to their own ink bbox then resampled to 7x5 — the
    shape-normalized frame glyph patches are compared in (a crop carries no
    baseline metadata, so matching must be translation/scale invariant)."""
    global _BBOX_TEMPLATES
    if _BBOX_TEMPLATES is None:
        out = []
        for t in templates():
            rows = np.nonzero(t.any(axis=1))[0]
            cols = np.nonzero(t.any(axis=0))[0]
            patch = t[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]
            out.append(area_resize(patch.astype(np.float32), GLYPH_H, GLYPH_W) >= 0.5)
        _BBOX_TEMPLATES = np.stack(out).astype(np.float32)
    return _BBOX_TEMPLATES


# Cross-row memo: rendered corpora draw from a fixed glyph set, so the same
# ink patch recurs across crops/rows/images — one resample+match per distinct
# patch instead of one per occurrence (the "batch the numpy kernels across
# rows" lever: work is shared at patch granularity). Keyed by exact bytes, so
# a hit returns the bit-identical scores the cold path would; bounded size.
_MATCH_CACHE: dict[tuple[tuple[int, ...], bytes], np.ndarray] = {}
_MATCH_CACHE_MAX = 65536


def match_glyph(patch_ink: np.ndarray) -> np.ndarray:
    """Binary glyph patch (its own ink bbox) -> similarity scores (36,)."""
    key = (patch_ink.shape, patch_ink.tobytes())
    hit = _MATCH_CACHE.get(key)
    if hit is not None:
        return hit
    grid = area_resize(patch_ink.astype(np.float32), GLYPH_H, GLYPH_W)
    bitmap = (grid >= 0.5).astype(np.float32)
    t = _bbox_templates()  # (36,7,5)
    scores = 1.0 - np.abs(t - bitmap[None]).mean(axis=(1, 2))
    if len(_MATCH_CACHE) < _MATCH_CACHE_MAX:
        _MATCH_CACHE[key] = scores
    return scores


def analyze_crop(
    resized_crop: np.ndarray,
) -> list[tuple[tuple[int, int, int, int], np.ndarray]]:
    """Segment a resized crop into glyph boxes and match each against all
    templates. The single shared analysis consumed by BOTH the angle
    classifier (orientation evidence) and the recognizer (CTC logits) — one
    pass instead of three per crop."""
    ink = resized_crop < _INK_THRESH
    return [
        ((y0, y1, x0, x1), match_glyph(ink[y0:y1, x0:x1]))
        for (y0, y1, x0, x1) in _segment_glyphs(ink)
    ]


def logits_from_analysis(
    analysis: list[tuple[tuple[int, int, int, int], np.ndarray]],
) -> np.ndarray:
    """Glyph analyses -> (T, 37) probs; blank-sandwiched glyph steps."""
    blank = np.zeros(NUM_CLASSES, dtype=np.float32)
    blank[BLANK_IDX] = 1.0
    steps: list[np.ndarray] = [blank]
    for _box, sims in analysis:
        row = np.zeros(NUM_CLASSES, dtype=np.float32)
        row[: len(sims)] = sims
        steps.append(row)
        steps.append(blank)
    return np.stack(steps).astype(np.float32)


def rec_logits(resized_crop: np.ndarray) -> np.ndarray:
    """(32, W) float crop -> (T, 37) probs (analyze + assemble)."""
    return logits_from_analysis(analyze_crop(resized_crop))


def rec_resize_padded(
    crop: np.ndarray, image_shape: tuple[int, int] = (32, 320), padding: bool = True
) -> tuple[np.ndarray, float]:
    """``resize_norm_img`` (``rec_transforms.py:457-484``, the
    RecResizeImg/SVTR fixed-shape variant): keep-ratio resize to target
    height, right-pad with zeros to the FIXED width (vs
    :func:`rec_resize_norm`'s variable width); ``padding=False`` stretches.
    Returns (float32 (imgH, imgW), valid_ratio = resized_w / imgW)."""
    import math

    img_h, img_w = image_shape
    h, w = crop.shape[:2]
    if not padding:
        return resize_bilinear(crop, img_h, img_w), 1.0
    ratio = w / float(max(h, 1))
    resized_w = img_w if math.ceil(img_h * ratio) > img_w else int(math.ceil(img_h * ratio))
    resized = resize_bilinear(crop, img_h, max(resized_w, 1))
    out = np.zeros((img_h, img_w), dtype=np.float32)
    out[:, : resized.shape[1]] = resized
    return out, min(1.0, float(resized_w / img_w))
