"""Stateful streaming collect (CollectNode semantics): fragments split
across micro-batches assemble exactly once."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mindocr_spark.streaming.collect_state import (
    FRAGMENT_DDL,
    stream_collect_documents,
)


def _write_fragments(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "n_total", "offset", "kind", "text", "media_ref"]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "n_total": pa.array(pdf["n_total"], pa.int32()),
            "offset": pa.array(pdf["offset"], pa.int32()),
            "kind": pa.array(pdf["kind"], pa.string()),
            "text": pa.array(pdf["text"], pa.string()),
            "media_ref": pa.array(pdf["media_ref"], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_fragments_across_batches_assemble_once(spark, tmp_path):
    frag_dir = tmp_path / "frags"
    frag_dir.mkdir()
    # doc_a: 3 fragments split across two files (out of order); doc_b: 1 frag
    _write_fragments(
        [
            ("doc_a", 3, 2, "text", "last", None),
            ("doc_a", 3, 0, "text", "first", None),
            ("doc_b", 1, 0, "media", "img words", "m1"),
        ],
        str(frag_dir / "f0.parquet"),
    )
    _write_fragments(
        [("doc_a", 3, 1, "media", "middle", "m2")],
        str(frag_dir / "f1.parquet"),
    )
    stream = (
        spark.readStream.schema(FRAGMENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(frag_dir))
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_collect_documents(stream, ckpt, out_dir)
    q.awaitTermination(240)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {"doc_a", "doc_b"}
    a = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in rows["doc_a"]["out_spans"]]
    assert a == [
        ("text", "first", None, 0),
        ("media", "middle", "m2", 1),
        ("text", "last", None, 2),
    ]
    assert rows["doc_b"]["out_spans"][0]["text"] == "img words"
