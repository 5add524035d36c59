"""Incremental (Structured Streaming) extraction: stream output == batch
output; checkpoint prevents reprocessing."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mindocr_spark.plans.extract import extract, load_corpus
from mindocr_spark.streaming.incremental import stream_extract


def _write_spans_slice(spans_pdf, path):
    span_struct = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(spans_pdf["doc_id"], pa.string()),
            "spans": pa.array(spans_pdf["spans"], pa.list_(span_struct)),
        }
    )
    pq.write_table(tbl, path)


def _tuples(df):
    return sorted(
        (
            r["doc_id"],
            tuple(
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in r["out_spans"]
            ),
        )
        for r in df.collect()
    )


def test_stream_matches_batch(spark, small_corpus, tmp_path):
    corpus_dir, spans_pdf, _ = small_corpus
    _, media = load_corpus(spark, corpus_dir)

    spans_dir = tmp_path / "spans_stream"
    spans_dir.mkdir()
    # two arriving files
    _write_spans_slice(spans_pdf.iloc[:10], str(spans_dir / "part0.parquet"))
    _write_spans_slice(spans_pdf.iloc[10:], str(spans_dir / "part1.parquet"))

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, str(spans_dir), media, out_dir, ckpt)
    q.awaitTermination(240)

    got = _tuples(spark.read.parquet(out_dir))
    spans, _ = load_corpus(spark, corpus_dir)
    want = _tuples(extract(spark, spans, media, mode="fused"))
    assert got == want

    # restart on the same checkpoint: nothing reprocessed, no duplicates
    q2 = stream_extract(spark, str(spans_dir), media, out_dir, ckpt)
    q2.awaitTermination(120)
    assert _tuples(spark.read.parquet(out_dir)) == want
