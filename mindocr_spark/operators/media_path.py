"""Media-span path: decode -> detect -> crop -> cls -> rec as mapInPandas
stages over Arrow batches (SURVEY.md §3.1 Spark rebuild).

Two physical strategies, same semantics:

- **fused**: one ``mapInPandas`` runs the whole per-image system
  (``kernels.system.ocr_image``). Zero extra shuffle; per-row cost bounded
  by the reference's own ``max_candidates=1000`` cap. Best when box counts
  per image are modest.
- **exploded**: a det stage emits one output row per crop (the reference's
  ``DetPostNode`` crop fan-out, ``det_post_node.py:19-52``), letting Spark
  redistribute recognition work across executors — the skew answer for
  1000-box images. Crops travel as raw uint8 bytes + dims (cheaper than
  re-encoding PNG); order is preserved by an explicit ``box_idx`` from the
  reading-order sort, never by row order.

Both share every kernel bit-for-bit with the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..functions.png_codec import decode_png
from ..kernels.system import (
    classify_and_recognize,
    crop_box,
    detect_boxes,
    media_payload_text,
    ocr_image,
)

# schemas for mapInPandas stages. ``profile`` is per-item pipeline metadata
# from the media table (None/'default' = CTC+quad; 'attn' = attention-head
# rec decode; 'poly' = box_type='poly' detection) — the per-source analogue
# of the reference's yaml config axes, carried through the exploded plan so
# the rec stage decodes each crop under its source's contract.
FUSED_SCHEMA = "doc_id string, offset int, media_ref string, text string"
DET_CROPS_SCHEMA = (
    "doc_id string, offset int, media_ref string, box_idx int, "
    "crop binary, crop_h int, crop_w int, profile string"
)
REC_SCHEMA = (
    "doc_id string, offset int, media_ref string, box_idx int, "
    "text string, conf double"
)


def _profiles_col(pdf: pd.DataFrame) -> "pd.Series | list[None]":
    """The optional ``profile`` column (older corpora lack it)."""
    if "profile" in pdf.columns:
        return pdf["profile"]
    return [None] * len(pdf)


def _safe_decode(png: bytes | None) -> np.ndarray | None:
    """Decode-failure skip semantics (``decode_node.py:30-42``)."""
    if png is None:
        return None
    try:
        img = decode_png(bytes(png))
    except Exception:  # noqa: BLE001 - any junk input -> skip, not fail job
        return None
    if img.ndim == 3:  # RGB -> gray (luminance, deterministic integer math)
        img = (
            (299 * img[:, :, 0].astype(np.uint32)
             + 587 * img[:, :, 1].astype(np.uint32)
             + 114 * img[:, :, 2].astype(np.uint32)) // 1000
        ).astype(np.uint8)
    return img


def ocr_fused_iter(
    batches: Iterator[pd.DataFrame], use_cls: bool = True
) -> Iterator[pd.DataFrame]:
    """(doc_id, offset, media_ref, image) -> (doc_id, offset, media_ref, text)."""
    for pdf in batches:
        texts = []
        for blob, prof in zip(pdf["image"], _profiles_col(pdf)):
            texts.append(media_payload_text(blob, use_cls=use_cls, profile=prof))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "offset": pdf["offset"],
                "media_ref": pdf["media_ref"],
                "text": texts,
            }
        )


def det_crops_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, offset, media_ref, image) -> one row per crop + one sentinel
    row (box_idx = -1, empty crop) per media span.

    ``box_idx`` is the reading-order index (``sorted_boxes`` applied inside
    ``detect_boxes``). The sentinel guarantees every media span — including
    unreadable/missing media and spans whose every crop falls to the
    drop-score filter — survives the downstream groupBy without a restore
    join (it contributes an empty text the final assembly drops).
    """
    from ..kernels.system import detect_quads

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "offset": [], "media_ref": [],
            "box_idx": [], "crop": [], "crop_h": [], "crop_w": [], "profile": [],
        }

        def emit(doc_id, offset, media_ref, idx, blob, ch, cw, prof):
            out["doc_id"].append(doc_id)
            out["offset"].append(offset)
            out["media_ref"].append(media_ref)
            out["box_idx"].append(idx)
            out["crop"].append(blob)
            out["crop_h"].append(ch)
            out["crop_w"].append(cw)
            out["profile"].append(prof)

        for doc_id, offset, media_ref, png, prof in zip(
            pdf["doc_id"], pdf["offset"], pdf["media_ref"], pdf["image"],
            _profiles_col(pdf),
        ):
            emit(doc_id, offset, media_ref, -1, b"", 0, 0, prof)  # sentinel
            if png is not None and bytes(png).startswith(b"%PDF"):
                # PDF media: text layer extracted here; carried verbatim to
                # the rec stage as a box_idx=-2 row (no crops to explode)
                text = media_payload_text(png)
                emit(
                    doc_id, offset, media_ref, -2,
                    text.encode("utf-8"), len(text), 0, prof,
                )
                continue
            img = _safe_decode(png)
            if img is None:
                continue
            from ..kernels.table import detect_grid

            h_lines, v_lines = detect_grid(img)
            if len(h_lines) >= 2 and len(v_lines) >= 2:
                # ruled table: structured path, verbatim text row (same
                # routing as media_payload_text, keeps modes identical)
                text = media_payload_text(png)
                emit(
                    doc_id, offset, media_ref, -2,
                    text.encode("utf-8"), len(text), 0, prof,
                )
                continue
            box_mode = "poly" if prof == "poly" else "quad"
            for idx, poly in enumerate(detect_quads(img, box_mode=box_mode)):
                crop = crop_box(img, poly)  # uint8
                emit(
                    doc_id, offset, media_ref, idx,
                    crop.tobytes(), crop.shape[0], crop.shape[1], prof,
                )
        yield pd.DataFrame(out)


def recognize_iter(
    batches: Iterator[pd.DataFrame], use_cls: bool = True, decoder: str = "ctc"
) -> Iterator[pd.DataFrame]:
    """Crop rows -> (…, text, conf): cls-rotate then recognition.
    ``decoder`` picks the head contract ('ctc' | 'attn')."""
    for pdf in batches:
        texts: list[str] = []
        confs: list[float] = []
        for blob, h, w, bidx, prof in zip(
            pdf["crop"], pdf["crop_h"], pdf["crop_w"], pdf["box_idx"],
            _profiles_col(pdf),
        ):
            if int(bidx) == -2:  # verbatim payload text (PDF text layer)
                texts.append(bytes(blob).decode("utf-8"))
                confs.append(1.0)
                continue
            if int(bidx) < 0:  # sentinel: no OCR, empty text
                texts.append("")
                confs.append(0.0)
                continue
            crop = np.frombuffer(blob, dtype=np.uint8).reshape(int(h), int(w))
            text, conf = classify_and_recognize(
                crop,
                use_cls=use_cls,
                decoder="attn" if prof == "attn" else decoder,
            )
            texts.append(text)
            confs.append(conf)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "offset": pdf["offset"],
                "media_ref": pdf["media_ref"],
                "box_idx": pdf["box_idx"],
                "text": texts,
                "conf": confs,
            }
        )


def ocr_records_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(media_ref, image) -> per-image OCR record rows (transcription, score,
    points json) — the det/system golden-file shape (FIXTURES.md F3)."""
    import json

    for pdf in batches:
        out: dict[str, list] = {"media_ref": [], "transcription": [], "score": [], "points": []}
        for media_ref, png in zip(pdf["media_ref"], pdf["image"]):
            img = _safe_decode(png)
            if img is None:
                continue
            for rec in ocr_image(img):
                out["media_ref"].append(media_ref)
                out["transcription"].append(rec["transcription"])
                out["score"].append(rec["score"])
                out["points"].append(json.dumps(rec["points"]))
        yield pd.DataFrame(out)


OCR_RECORDS_SCHEMA = "media_ref string, transcription string, score double, points string"


DET_POLYS_SCHEMA = (
    "media_ref string, poly_idx int, points array<array<int>>, score double"
)


def det_polys_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(media_ref, image) -> one row per detected POLYGON (box_type='poly',
    ``det_db_postprocess.py:103-107``): ragged ``array<array<int>>`` points
    instead of the fixed 4-point quad — the output representation for
    curved/irregular text regions."""
    from ..kernels.system import detect_polys

    for pdf in batches:
        out: dict[str, list] = {
            "media_ref": [], "poly_idx": [], "points": [], "score": [],
        }
        for media_ref, png in zip(pdf["media_ref"], pdf["image"]):
            img = _safe_decode(png)
            if img is None:
                continue
            polys, scores = detect_polys(img)
            for i, (p, s) in enumerate(zip(polys, scores)):
                out["media_ref"].append(media_ref)
                out["poly_idx"].append(i)
                out["points"].append([[int(x), int(y)] for x, y in p])
                out["score"].append(float(s))
        yield pd.DataFrame(out)
