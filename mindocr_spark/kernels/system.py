"""Per-image OCR system: detect -> sort -> crop -> cls -> rec -> merge.

This is the single-image core of the reference's ``TextSystem.__call__``
(``tools/infer/text/predict_system.py:255-355``), shared verbatim between
the single-process oracle and the Spark media-path UDFs. Exposed in stages
so the Spark plan can explode at crop level for skew handling.
"""

from __future__ import annotations

import numpy as np

from ..config import CLS_LABELS, CLS_THRESH, DROP_SCORE
from ..functions.ctc import ctc_greedy_decode
from ..functions.imaging import rotate180, warp_perspective_crop
from ..functions.ordering import sorted_boxes
from .cls import cls_probs
from .det import db_postprocess, det_resize, det_score, validate_det_res
from .rec import rec_logits, rec_resize_norm


def detect_boxes(img: np.ndarray) -> list[np.ndarray]:
    """Gray uint8 image -> reading-ordered int64 (4,2) quads in source coords."""
    resized, shape_list = det_resize(img)
    prob = det_score(resized)
    polys, _scores = db_postprocess(prob, shape_list)
    polys = validate_det_res(polys, img.shape[0], img.shape[1])
    order = sorted_boxes(polys)
    return [polys[i] for i in order]


def crop_box(img: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Perspective-crop one quad (``crop_text_region`` semantics).

    Returns uint8 — cv2.warpPerspective on a uint8 source yields uint8
    (rounded), and the reference feeds uint8 crops to cls/rec preprocess.
    Also quarters the crop-shuffle bytes in exploded mode."""
    out = warp_perspective_crop(img, poly.astype(np.float64))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def classify_and_rotate(crop: np.ndarray) -> tuple[np.ndarray, str, float]:
    """Angle-cls a crop; rotate 180 when label=='180' and conf >= thresh
    (``predict_system.py:294-309``)."""
    probs = cls_probs(crop)
    idx = int(probs.argmax())
    label, conf = CLS_LABELS[idx], float(probs[idx])
    if label == "180" and conf >= CLS_THRESH:
        crop = rotate180(crop)
    return crop, label, conf


def recognize_crop(crop: np.ndarray) -> tuple[str, float]:
    """Crop -> (text, confidence) via resize-norm + template logits + CTC."""
    resized = rec_resize_norm(crop)
    return ctc_greedy_decode(rec_logits(resized))


def classify_and_recognize(
    crop: np.ndarray, use_cls: bool = True, decoder: str = "ctc"
) -> tuple[str, float]:
    """Fused cls+rec: one resize, one glyph analysis per orientation —
    the cls evidence and the chosen orientation's logits share the
    analysis instead of recomputing it (3 passes -> 2).

    ``decoder`` selects the head contract: ``'ctc'`` (RecCTCLabelDecode,
    blank-sandwiched steps), ``'attn'`` (RecAttnLabelDecode, GO/STOP
    framing, ``rec_postprocess.py:255-366``), ``'master'``
    (RecMasterLabelDecode: GO/STOP/PAD vocabulary, ``:363-460``) or
    ``'sar'`` (SARLabelDecode: trailing UKN/BOS-EOS/PAD specials,
    ``:494-547``) — the decode families of the reference's rec model zoo
    over the same crop analysis."""
    from .cls import cls_probs_from_analyses
    from .rec import analyze_crop, logits_from_analysis

    def _decode(analysis):
        if decoder == "attn":
            from ..functions.attn import attn_greedy_decode, attn_logits_from_analysis

            return attn_greedy_decode(attn_logits_from_analysis(analysis))
        if decoder == "master":
            from ..functions.rec_decoders import (
                master_greedy_decode,
                master_logits_from_analysis,
            )

            return master_greedy_decode(master_logits_from_analysis(analysis))
        if decoder == "sar":
            from ..functions.rec_decoders import (
                sar_greedy_decode,
                sar_logits_from_analysis,
            )

            return sar_greedy_decode(sar_logits_from_analysis(analysis))
        return ctc_greedy_decode(logits_from_analysis(analysis))

    resized = rec_resize_norm(crop)
    up = analyze_crop(resized)
    if not use_cls:
        return _decode(up)
    flipped = analyze_crop(rotate180(resized))
    probs = cls_probs_from_analyses(up, flipped)
    idx = int(probs.argmax())
    if CLS_LABELS[idx] == "180" and float(probs[idx]) >= CLS_THRESH:
        chosen = flipped
    else:
        chosen = up
    return _decode(chosen)


def detect_polys(img: np.ndarray) -> tuple[list[np.ndarray], list[float]]:
    """Poly-mode detection (``box_type='poly'``): ragged polygons in source
    coords, validated (clip + area>=3) like the quad path, with scores.
    Returned in component order (deterministic top-left)."""
    from .det import db_postprocess_poly

    resized, shape_list = det_resize(img)
    prob = det_score(resized)
    polys, scores = db_postprocess_poly(prob, shape_list)
    kept_polys: list[np.ndarray] = []
    kept_scores: list[float] = []
    for p, s in zip(polys, scores):
        v = validate_det_res([p], img.shape[0], img.shape[1])
        if v:
            kept_polys.append(v[0])
            kept_scores.append(s)
    return kept_polys, kept_scores


def layout_region_text(img: np.ndarray, bbox: tuple[float, float, float, float]) -> str:
    """The layout-region recognition route
    (``tools/infer/text/predict_table_e2e.py:170-189``): crop the region
    bbox, add 10px white padding (``add_padding``, better recognition on
    tight region crops), OCR, join transcriptions in ``sort_words_by_poly``
    order."""
    from ..functions.imaging import add_padding
    from ..functions.ordering import sort_words_reading_order

    left, top, right, bottom = (int(v) for v in bbox)
    crop = img[max(top, 0) : bottom, max(left, 0) : right]
    if crop.size == 0:
        return ""
    crop = add_padding(crop, 10, 255.0).astype(np.uint8)
    recs = ocr_image(crop)
    polys = [np.array(r["points"], dtype=np.float64) for r in recs]
    order = sort_words_reading_order(polys)
    return " ".join(recs[i]["transcription"] for i in order)


def detect_quads(img: np.ndarray, box_mode: str = "quad") -> list[np.ndarray]:
    """Reading-ordered recognition quads under either detection mode.

    ``box_mode='quad'`` is :func:`detect_boxes`; ``box_mode='poly'`` runs
    poly-mode detection (``box_type='poly'``) and fits each ragged polygon's
    min-area rect — the quad the crop stage needs (the reference's
    ``crop_text_region`` consumes 4-point boxes regardless of det box_type).
    """
    if box_mode == "quad":
        return detect_boxes(img)
    from ..functions.geometry import min_area_rect, order_points_clockwise

    polys, _scores = detect_polys(img)
    quads = [
        order_points_clockwise(
            min_area_rect(p.astype(np.float64))[0]
        ).astype(np.int64)
        for p in polys
    ]
    order = sorted_boxes(quads)
    return [quads[i] for i in order]


def ocr_image(
    img: np.ndarray,
    use_cls: bool = True,
    decoder: str = "ctc",
    box_mode: str = "quad",
) -> list[dict]:
    """Full per-image system; returns kept records in reading order:
    ``[{"transcription": str, "score": float, "points": [[x,y]x4]}]``
    with the drop-score filter applied (``predict_system.py:327-336``).

    ``decoder``/``box_mode`` select the rec-head and det-output contracts
    (the reference's config axes: ``rec_postprocess.py:255-366`` attn family,
    ``det_db_postprocess.py:103-107`` box_type='poly')."""
    records: list[dict] = []
    for poly in detect_quads(img, box_mode=box_mode):
        crop = crop_box(img, poly)
        text, conf = classify_and_recognize(crop, use_cls=use_cls, decoder=decoder)
        if not text or conf < DROP_SCORE:
            continue
        records.append(
            {
                "transcription": text,
                "score": conf,
                "points": poly.astype(int).tolist(),
            }
        )
    return records


def media_payload_text(
    payload: bytes | None, use_cls: bool = True, profile: str | None = None
) -> str:
    """Route a media payload by magic bytes: PDFs go through the text-layer
    parser (north rule: 'PDF/layout parse'), images through decode+OCR;
    junk/missing yields '' (decode-skip semantics).

    ``profile`` is per-item pipeline metadata (the media table's ``profile``
    column — the per-source analogue of the reference's yaml config choice):
    ``'attn'`` decodes recognition with the attention head contract,
    ``'poly'`` detects with ``box_type='poly'``; None/'default' is the
    CTC+quad system."""
    decoder = "attn" if profile == "attn" else "ctc"
    box_mode = "poly" if profile == "poly" else "quad"
    if payload is None:
        return ""
    payload = bytes(payload)
    if payload.startswith(b"%PDF"):
        from ..functions.pdf_text import extract_pdf_text

        try:
            return extract_pdf_text(payload)
        except Exception:  # noqa: BLE001
            return ""
    from ..functions.png_codec import decode_png

    try:
        img = decode_png(payload)
    except Exception:  # noqa: BLE001
        return ""
    if img.ndim == 3:
        img = (
            (299 * img[:, :, 0].astype(np.uint32)
             + 587 * img[:, :, 1].astype(np.uint32)
             + 114 * img[:, :, 2].astype(np.uint32)) // 1000
        ).astype(np.uint8)
    # ruled-table images take the table-structure path (grid lines would
    # otherwise be mis-read as glyph blobs); cells joined row-major,
    # matching the reference's table e2e text assembly
    from .table import detect_grid, extract_table

    h_lines, v_lines = detect_grid(img)
    if len(h_lines) >= 2 and len(v_lines) >= 2:
        table = extract_table(img)
        return " ".join(
            t for row in table["cells"] for t in row if t
        )
    return media_span_text(img, use_cls=use_cls, decoder=decoder, box_mode=box_mode)


def media_span_text(
    img: np.ndarray,
    use_cls: bool = True,
    decoder: str = "ctc",
    box_mode: str = "quad",
) -> str:
    """The extracted text of one media span: kept transcriptions in reading
    order joined by single spaces (join convention from
    ``predict_table_e2e.py:186-189``; ordering ``utils.py:95-103``)."""
    return " ".join(
        r["transcription"]
        for r in ocr_image(img, use_cls=use_cls, decoder=decoder, box_mode=box_mode)
    )
