"""Derive an interleaved spans+media corpus from the driver's ``documents``
table — deterministically, on executors (no driver-side rendering).

Each document row (doc_id bigint, text) maps to:
- 1-2 text spans: the document text wrapped in deterministic HTML
  boilerplate (nav/script/footer variants chosen by doc_id),
- 1 media span: a page rendering the first 1-3 charset-safe tokens of the
  text, PNG-encoded.

Everything is a pure function of (doc_id, text), so Spark executors and the
pandas oracle produce identical corpora at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..config import CHARSET
from ..functions.glyphs import render_page
from ..functions.png_codec import encode_png

_CHARSET_SET = set(CHARSET)

_WRAPPERS = [
    ("<nav><a href='/'>home</a> <a href='/b'>blog</a></nav><p>{}</p>"
     "<footer>copyright 2024 example corp</footer>"),
    ("<style>.x{{color:red}}</style><div><p>{}</p></div>"
     "<script>track('pageview');</script>"),
    ("<p>{}</p><div><a href='/1'>one</a> <a href='/2'>two</a> "
     "<a href='/3'>three</a></div>"),
]


def media_words_for(text: str) -> list[str]:
    """First up to 3 tokens that are charset-only, 2-7 chars."""
    out = []
    for tok in text.split(" "):
        if 2 <= len(tok) <= 7 and all(c in _CHARSET_SET for c in tok):
            out.append(tok)
        if len(out) == 3:
            break
    return out or ["empty"]


def spans_for_doc(
    doc_id: int, text: str, with_media: bool = True
) -> tuple[list[dict], list[dict]]:
    """Pure mapping: one driver document -> (spans, media rows).

    ``with_media=False`` skips the (CPU-heavy) page rendering when only the
    spans side is being generated."""
    did = f"doc_{int(doc_id):08d}"
    wrapper = _WRAPPERS[int(doc_id) % len(_WRAPPERS)]
    words = media_words_for(text)
    # every 4th document's media is a text-layer PDF instead of an image
    if int(doc_id) % 4 == 0:
        from ..functions.pdf_text import make_simple_pdf

        media_ref = f"pdf_{int(doc_id):08d}_01"
        spans = [
            {"kind": "text", "text": wrapper.format(text), "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": media_ref, "offset": 1},
        ]
        media = [
            {
                "media_ref": media_ref,
                "image": make_simple_pdf([" ".join(words)]),
                "width": 0,
                "height": 0,
            }
        ]
        return [{"doc_id": did, "spans": spans}], media
    media_ref = f"img_{int(doc_id):08d}_01"
    spans = [
        {"kind": "text", "text": wrapper.format(text), "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": media_ref, "offset": 1},
    ]
    if not with_media:
        return [{"doc_id": did, "spans": spans}], []
    height = ((len(words) * 64 + 31) // 32) * 32
    width = ((max(len(w) for w in words) * 24 + 48 + 31) // 32) * 32
    page, _gt = render_page(
        [(w, 16 + i * 64, 16) for i, w in enumerate(words)], height, width
    )
    media = [
        {
            "media_ref": media_ref,
            "image": encode_png(page),
            "width": width,
            "height": height,
        }
    ]
    return [{"doc_id": did, "spans": spans}], media


_SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
_MEDIA_SCHEMA = "media_ref string, image binary, width int, height int"


def _gen_spans_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            srows, _ = spans_for_doc(int(doc_id), text, with_media=False)
            rows.extend(
                {
                    "doc_id": r["doc_id"],
                    "spans": [
                        (s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in r["spans"]
                    ],
                }
                for r in srows
            )
        yield pd.DataFrame(rows, columns=["doc_id", "spans"])


def _gen_media_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            _, mrows = spans_for_doc(int(doc_id), text)
            rows.extend(mrows)
        yield pd.DataFrame(rows, columns=["media_ref", "image", "width", "height"])


def derive_from_docs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    docs = docs.select("doc_id", "text")
    # rendering is CPU-bound Python: spread over task slots even when the
    # source parquet is one small split
    n = docs.sparkSession.sparkContext.defaultParallelism * 2
    docs = docs.repartition(n, "doc_id")
    spans = docs.mapInPandas(_gen_spans_iter, _SPANS_SCHEMA)
    media = docs.mapInPandas(_gen_media_iter, _MEDIA_SCHEMA)
    return spans, media


def derive_corpus(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    return derive_from_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def derive_corpus_pandas(docs_pdf: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Oracle-side derivation (same pure function)."""
    span_rows: list[dict] = []
    media_rows: list[dict] = []
    for _, row in docs_pdf.iterrows():
        srows, mrows = spans_for_doc(int(row["doc_id"]), row["text"])
        span_rows.extend(srows)
        media_rows.extend(mrows)
    return (
        pd.DataFrame(span_rows, columns=["doc_id", "spans"]),
        pd.DataFrame(media_rows, columns=["media_ref", "image", "width", "height"]),
    )
