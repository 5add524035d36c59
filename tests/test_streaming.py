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


def test_watermarked_window_drops_late_events(spark, tmp_path):
    """Tumbling 1h windows with a 30min watermark: an event arriving after
    the watermark passed its window is dropped; closed windows emit once."""
    import time as _time

    import pandas as pd

    from mindocr_spark.streaming.incremental import stream_windowed_counts

    ev_dir = tmp_path / "events"
    ev_dir.mkdir()

    def write(rows, name):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
        tbl = pa.table(
            {
                "ts": pa.array(pd.to_datetime(pdf["ts"]), pa.timestamp("us")),
                "user_id": pa.array(pdf["user_id"], pa.int64()),
                "value": pa.array(pdf["value"], pa.float64()),
            }
        )
        pq.write_table(tbl, str(ev_dir / name))
        _time.sleep(1.1)  # distinct mtimes (fs granularity) -> deterministic batches

    # batch 1: window 10:00 gets 2 events
    write([("2024-01-01 10:05:00", 1, 1.0), ("2024-01-01 10:20:00", 2, 2.0)], "f1.parquet")
    # batches 2-3: advance the watermark past 11:00 (wm lags one batch:
    # it is computed at batch end and applied to the NEXT batch)
    write([("2024-01-01 13:00:00", 3, 3.0)], "f2.parquet")
    write([("2024-01-01 13:30:00", 5, 5.0)], "f3.parquet")
    # batch 4: late event for window 10:00 — beyond watermark, dropped
    write([("2024-01-01 10:40:00", 4, 100.0)], "f4.parquet")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_windowed_counts(spark, str(ev_dir), out, ckpt)
    q.awaitTermination(240)

    rows = {r["window_start"]: r for r in spark.read.parquet(out).collect()}
    # the 10:00 window closed with ONLY the two on-time events
    assert rows["2024-01-01 10:00:00"]["n"] == 2
    assert rows["2024-01-01 10:00:00"]["sum_value"] == 3.0


def test_stream_replay_is_idempotent(spark, small_corpus, tmp_path):
    """Exactly-once = offsets + idempotent sink: reprocessing the same input
    (checkpoint lost, batches replayed with the same batch ids) dynamically
    overwrites each batch_id=N partition instead of appending duplicates."""
    corpus_dir, spans_pdf, _ = small_corpus
    _, media = load_corpus(spark, corpus_dir)
    spans_dir = tmp_path / "spans_stream"
    spans_dir.mkdir()
    _write_spans_slice(spans_pdf, str(spans_dir / "part0.parquet"))
    out_dir = str(tmp_path / "out")

    q = stream_extract(spark, str(spans_dir), media, out_dir, str(tmp_path / "c1"))
    q.awaitTermination(240)
    want = _tuples(spark.read.parquet(out_dir))

    # fresh checkpoint, same sink: the whole input replays as batch 0 again
    q2 = stream_extract(spark, str(spans_dir), media, out_dir, str(tmp_path / "c2"))
    q2.awaitTermination(240)
    assert _tuples(spark.read.parquet(out_dir)) == want
