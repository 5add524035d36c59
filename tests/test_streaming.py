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


def test_stream_windowed_counts_batch_equals_closed_windows(spark):
    """The driver facade (round 5): the availableNow streaming job over the
    events table must emit exactly the CLOSED windows — the batch tumbling
    aggregation restricted to windows whose end precedes the final
    watermark (max ts - 30min) — in append mode, regardless of micro-batch
    splits."""
    from pyspark.sql import functions as F

    from mindocr_spark.streaming.incremental import (
        stream_windowed_counts_batch,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in stream_windowed_counts_batch(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    mx = ev.agg(F.max("ts").alias("m"))
    want = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in (
            ev.groupBy(F.date_trunc("hour", "ts").alias("ws"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .crossJoin(mx)
            .filter(
                F.col("ws") + F.expr("INTERVAL 1 HOUR")
                <= F.col("m") - F.expr("INTERVAL 30 MINUTE")
            )
            .select(
                F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n",
                "sum_value",
            )
        ).collect()
    }
    assert got == want and len(got) > 0


def test_salted_flagship_equals_unsalted(spark, small_corpus):
    """salt_buckets is an execution-strategy knob, not a semantics knob:
    the two-phase salted reassembly must produce byte-identical serialized
    output (round 5, the oracle-equality contract behind
    extract_interleaved_salted)."""
    from mindocr_spark.plans.extract import extract_serialized, load_corpus

    corpus_dir, _, _ = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    plain = {
        (r["doc_id"], r["out_spans_json"])
        for r in extract_serialized(
            spark, spans, media, mode="exploded"
        ).collect()
    }
    salted = {
        (r["doc_id"], r["out_spans_json"])
        for r in extract_serialized(
            spark, spans, media, mode="exploded", salt_buckets=8
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_stream_dedup_flags_probe_stored_state(spark, tmp_path):
    """Streaming daily-crawl dedup: arriving docs (exact copies of every
    10th corpus doc under new ids) probe the stored band/shingle state;
    every arrival must flag its original as a near-dup, flags must match
    the same probe run as one batch, and checkpoint restart must be a
    no-op."""
    import pandas as pd
    import pyspark.sql.functions as F

    from mindocr_spark.streaming.incremental import (
        build_dedup_state,
        stream_dedup_flags,
    )

    sf = "/root/testdata/sf0.001"
    state = str(tmp_path / "state")
    build_dedup_state(spark, sf, state)

    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    arriving = docs[docs.doc_id % 10 == 0].copy()
    arriving["doc_id"] = arriving.doc_id + 10_000_000
    land = tmp_path / "arrivals"
    land.mkdir()
    half = len(arriving) // 2
    arriving.iloc[:half].to_parquet(land / "b0.parquet", index=False)
    arriving.iloc[half:].to_parquet(land / "b1.parquet", index=False)

    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    q = stream_dedup_flags(spark, str(land), state, out, ckpt)
    q.awaitTermination(240)

    flags = spark.read.parquet(out).toPandas().sort_values("doc_id", ignore_index=True)
    assert len(flags) == len(arriving)
    assert sorted(flags.batch_id.unique().tolist()) == [0, 1]
    # an exact text copy always clears the jaccard threshold: every
    # arrival is flagged, and its nearest partner is <= its original id
    assert (flags.n_dups >= 1).all()
    assert (flags.nearest <= flags.doc_id - 10_000_000).all()

    # batch equivalence: the same probe as one non-streaming pass
    from mindocr_spark.operators.dedup import (
        _shingles,
        _verify_candidates,
        _xxhash_bands,
    )

    adf = spark.createDataFrame(arriving)
    sh = _shingles(adf)
    ab = _xxhash_bands(sh)
    corpus_bands = spark.read.parquet(f"{state}/bands")
    corpus_sh = spark.read.parquet(f"{state}/shingles")
    swap = F.col("a.doc_id") > F.col("b.doc_id")
    cand = (
        ab.alias("a")
        .join(corpus_bands.alias("b"), ["band_no", "band_key"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            F.when(swap, F.col("b.n")).otherwise(F.col("a.n")).alias("na"),
            F.when(swap, F.col("a.n")).otherwise(F.col("b.n")).alias("nb"),
        )
        .distinct()
    )
    verified = _verify_candidates(corpus_sh.unionByName(sh), cand).toPandas()
    want = (
        pd.concat(
            [
                verified.rename(columns={"doc_a": "doc_id", "doc_b": "partner"}),
                verified.rename(columns={"doc_b": "doc_id", "doc_a": "partner"}),
            ]
        )
        .groupby("doc_id")
        .agg(n_dups=("partner", "size"), nearest=("partner", "min"))
        .reindex(arriving.doc_id)
    )
    want_flags = want[want.n_dups.notna()]
    got_flagged = flags[flags.n_dups > 0].set_index("doc_id")
    assert got_flagged.n_dups.to_dict() == want_flags.n_dups.astype(int).to_dict()
    assert got_flagged.nearest.to_dict() == want_flags.nearest.astype(int).to_dict()

    # restart: availableNow over a consumed checkpoint is a no-op
    q2 = stream_dedup_flags(spark, str(land), state, out, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out).toPandas()
    assert len(again) == len(flags)


def test_stream_image_dedup_flags(spark, tmp_path):
    """Arriving images probe the stored dHash state: a lightly perturbed
    copy of a stored page flags its original; a fresh random image flags
    nothing; junk bytes flag -1 (decode-skip contract)."""
    import numpy as np
    import pandas as pd

    from mindocr_spark.functions.png_codec import decode_png, encode_png
    from mindocr_spark.streaming.incremental import (
        build_image_dedup_state,
        stream_image_dedup_flags,
    )

    sf = "/root/testdata/sf0.001"
    state = str(tmp_path / "istate")
    build_image_dedup_state(spark, sf, state)
    combos = spark.read.parquet(f"{state}/image_combos")
    sigs = combos.limit(1).collect()
    assert sigs, "corpus must contribute at least one decodable image"
    # round-6 layout: the stored state is the Manku combo table (35 rows
    # per image on >= 2^36-key prefixes), not the bounded 16-bit bands
    n_imgs = combos.select("media_ref").distinct().count()
    assert combos.count() == 35 * n_imgs
    ref0 = sigs[0]["media_ref"]

    from mindocr_spark.data.derive_corpus import derive_corpus

    _, media = derive_corpus(spark, sf)
    src = media.filter(media.media_ref == ref0).select("image").collect()[0][0]
    img = decode_png(bytes(src)).astype(np.int16)
    img[::17, ::13] += 1
    perturbed = encode_png(np.clip(img, 0, 255).astype("uint8"))
    rng = np.random.default_rng(3)
    fresh = encode_png(rng.integers(0, 256, size=(64, 96), dtype="uint8"))

    land = tmp_path / "img_arrivals"
    land.mkdir()
    pd.DataFrame(
        {
            "media_ref": ["arr_copy", "arr_fresh", "arr_junk"],
            "image": [perturbed, fresh, b"not a png"],
        }
    ).to_parquet(land / "b0.parquet", index=False)

    out = str(tmp_path / "iflags")
    q = stream_image_dedup_flags(
        spark, str(land), state, out, str(tmp_path / "ickpt")
    )
    q.awaitTermination(240)
    flags = {
        r.media_ref: r.asDict() for r in spark.read.parquet(out).collect()
    }
    assert flags["arr_copy"]["n_dups"] >= 1
    assert flags["arr_fresh"]["n_dups"] == 0
    assert flags["arr_junk"]["n_dups"] == -1 and flags["arr_junk"]["nearest_ref"] is None
