"""Deterministic interleaved text+media corpus generator (FIXTURES.md F1/F2).

Produces the engine's primary input shape (``BASELINE.json:input_hint``):

- ``documents_spans``: ``doc_id string,
  spans array<struct<kind:string,text:string,media_ref:string,offset:int>>``
- ``media``: ``media_ref string, image binary (PNG), width int, height int,
  gt string (JSON [{"transcription","points"}])``

Determinism: each doc is generated from ``RandomState(seed * 1_000_003 +
doc_index)`` so generation is order-independent and can run partitioned on
executors with identical output at any parallelism. Rendering mirrors the
reference's system-test trick (``tests/st/test_online_infer.py:10-44``) —
known words at known boxes, so detection/recognition goldens are exact.

Skew preset: ``media_heavy_frac`` of documents get 6-8 media spans
(exercises salting/AQE skew handling per SURVEY.md §4).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..functions.glyphs import mixed_height as _mixed_height
from ..functions.glyphs import render_page
from ..functions.pdf_text import make_simple_pdf
from ..functions.png_codec import encode_png

# charset-only vocabulary (2-7 chars, lowercase alnum). Fixed order matters
# for determinism.
VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "pack",
    "my", "box", "with", "five", "dozen", "liquor", "jugs", "how", "vexing",
    "daft", "zebras", "jump", "waltz", "bad", "nymph", "for", "quartz",
    "jig", "spark", "table", "query", "shuffle", "join", "filter", "group",
    "sort", "merge", "index", "batch", "stream", "vector", "column", "row",
    "plan", "stage", "task", "node", "core", "disk", "memory", "cache",
    "data", "text", "image", "span", "doc", "page", "word", "glyph",
    "model", "score", "decode", "crop", "angle", "rotate", "detect",
    "invoice", "total", "paid", "due", "date", "item", "price", "count",
    "order", "ship", "bill", "tax", "sum", "net", "gross", "rate",
    "alpha", "beta", "gamma", "delta", "omega", "sigma", "theta", "kappa",
    "zero", "one", "two", "three", "four", "five5", "six", "seven",
    "eight", "nine", "ten", "x1", "y2", "z3", "a42", "b77", "c99", "d2024",
    "north", "south", "east", "west", "red", "green", "blue", "black",
    "white", "gray", "gold", "silver", "iron", "copper", "zinc", "lead",
]

_BOILER_NAV = "<nav><a href='/'>home</a> <a href='/a'>about</a> <a href='/c'>contact</a></nav>"
_BOILER_FOOTER = "<footer>copyright 2024 example site all rights reserved</footer>"
_BOILER_SCRIPT = "<script>var tracker = init('UA-1234'); tracker.send();</script>"
_BOILER_STYLE = "<style>.main { color: #333; } nav { display: flex; }</style>"
_BOILER_MENU = "<div><a href='/x'>one</a> <a href='/y'>two</a> <a href='/z'>three</a></div>"

# word-cell geometry (see kernels/det.py invariants: words >=40px apart,
# lines >=16px apart, page dims multiples of 32)
_CELL_W = 224
_CELL_H = 64
_WORD_MAX_LEN = 7


def _sentence(rng: np.random.RandomState, lo: int = 4, hi: int = 10) -> str:
    n = int(rng.randint(lo, hi + 1))
    return " ".join(VOCAB[int(i)] for i in rng.randint(0, len(VOCAB), n))


def make_text_span_html(rng: np.random.RandomState) -> tuple[str, str]:
    """Returns (raw html, expected extracted body)."""
    body = [_sentence(rng) for _ in range(int(rng.randint(1, 4)))]
    parts = []
    if rng.rand() < 0.7:
        parts.append(_BOILER_NAV)
    if rng.rand() < 0.5:
        parts.append(_BOILER_STYLE)
    for s in body:
        parts.append(f"<p>{s}</p>")
        if rng.rand() < 0.3:
            parts.append(_BOILER_MENU)
    if rng.rand() < 0.5:
        parts.append(_BOILER_SCRIPT)
    if rng.rand() < 0.7:
        parts.append(_BOILER_FOOTER)
    return "".join(parts), " ".join(body)


def make_media_image(
    rng: np.random.RandomState,
) -> tuple[bytes, int, int, str, str]:
    """Render one media image. Returns (png, width, height, gt_json,
    expected_text) where expected_text = gt words in reading order."""
    n_rows = int(rng.randint(1, 3))
    n_cols = int(rng.randint(1, 3))
    words = []
    placed = []
    for r in range(n_rows):
        for c in range(n_cols):
            w = VOCAB[int(rng.randint(0, len(VOCAB)))][:_WORD_MAX_LEN]
            jx = int(rng.randint(0, 12))
            # y jitter <= 1px: detected box tops on one line can already
            # differ by 8px (x-height vs ascender ink tops); jitter must keep
            # the total under the 10px same-line tolerance (utils.py:95-103)
            jy = int(rng.randint(0, 2))
            placed.append((w, 16 + r * _CELL_H + jy, 16 + c * _CELL_W + jx))
            words.append(w)
    height = ((n_rows * _CELL_H + 31) // 32) * 32
    width = ((n_cols * _CELL_W + 31) // 32) * 32
    rotate = bool(rng.rand() < 0.1) and all(_mixed_height(w) for w in words)
    page, gt = render_page(placed, height, width, rotate180=rotate)
    png = encode_png(page)
    # expected reading order: placement order for upright pages; a rotated
    # page is read in its own (flipped) frame, where boxes appear in exactly
    # reverse placement order — the cls stage un-rotates crop CONTENT, not
    # box positions (predict_system.py:300-304).
    if rotate:
        words = words[::-1]
    return png, width, height, json.dumps(gt), " ".join(words)


def make_media_pdf(rng: np.random.RandomState) -> tuple[bytes, str]:
    """A synthetic text-layer PDF media payload (north rule: PDF parse)."""
    lines = [_sentence(rng, 3, 7) for _ in range(int(rng.randint(1, 4)))]
    return make_simple_pdf(lines), " ".join(lines)


def gen_doc(
    seed: int, doc_index: int, media_heavy_frac: float = 0.05
) -> tuple[dict, list[dict]]:
    """Generate one document. Returns (spans_row, media_rows)."""
    rng = np.random.RandomState((seed * 1_000_003 + doc_index) % (2**31 - 1))
    doc_id = f"doc_{doc_index:08d}"
    if rng.rand() < media_heavy_frac:
        n_media = int(rng.randint(6, 9))
        n_text = int(rng.randint(0, 3))
    else:
        n_media = int(rng.randint(0, 3))
        n_text = int(rng.randint(1, 5))
    kinds = ["text"] * n_text + ["media"] * n_media
    rng.shuffle(kinds)
    spans = []
    media_rows = []
    for offset, kind in enumerate(kinds):
        if kind == "text":
            html, _expected = make_text_span_html(rng)
            spans.append(
                {"kind": "text", "text": html, "media_ref": None, "offset": offset}
            )
        else:
            if rng.rand() < 0.15:  # PDF media (text layer, no rendering)
                media_ref = f"pdf_{doc_index:08d}_{offset:02d}"
                payload, expected = make_media_pdf(rng)
                width = height = 0
                gt_json = "[]"
            else:
                media_ref = f"img_{doc_index:08d}_{offset:02d}"
                payload, width, height, gt_json, expected = make_media_image(rng)
            spans.append(
                {"kind": "media", "text": None, "media_ref": media_ref, "offset": offset}
            )
            media_rows.append(
                {
                    "media_ref": media_ref,
                    "image": payload,
                    "width": width,
                    "height": height,
                    "gt": gt_json,
                    "expected_text": expected,
                }
            )
    return {"doc_id": doc_id, "spans": spans}, media_rows


def gen_corpus_pandas(
    n_docs: int, seed: int = 42, media_heavy_frac: float = 0.05
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate (documents_spans, media) as pandas DataFrames."""
    span_rows = []
    media_rows = []
    for i in range(n_docs):
        s, m = gen_doc(seed, i, media_heavy_frac)
        span_rows.append(s)
        media_rows.extend(m)
    spans_df = pd.DataFrame(span_rows)
    media_df = pd.DataFrame(
        media_rows, columns=["media_ref", "image", "width", "height", "gt", "expected_text"]
    )
    return spans_df, media_df


def write_corpus_parquet(
    out_dir: str, n_docs: int, seed: int = 42, media_heavy_frac: float = 0.05
) -> tuple[str, str]:
    """Write documents_spans.parquet + media.parquet under ``out_dir``."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    spans_df, media_df = gen_corpus_pandas(n_docs, seed, media_heavy_frac)
    span_struct = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    spans_tbl = pa.table(
        {
            "doc_id": pa.array(spans_df["doc_id"], pa.string()),
            "spans": pa.array(spans_df["spans"], pa.list_(span_struct)),
        }
    )
    media_tbl = pa.table(
        {
            "media_ref": pa.array(media_df["media_ref"], pa.string()),
            "image": pa.array(media_df["image"], pa.binary()),
            "width": pa.array(media_df["width"], pa.int32()),
            "height": pa.array(media_df["height"], pa.int32()),
            "gt": pa.array(media_df["gt"], pa.string()),
            "expected_text": pa.array(media_df["expected_text"], pa.string()),
        }
    )
    spans_path = str(pathlib.Path(out_dir) / "documents_spans.parquet")
    media_path = str(pathlib.Path(out_dir) / "media.parquet")
    pq.write_table(spans_tbl, spans_path)
    pq.write_table(media_tbl, media_path)
    return spans_path, media_path
