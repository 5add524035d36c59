"""Stateful streaming collect: the reference's CollectNode as
``applyInPandasWithState``.

The reference's pipeline engine accumulates per-image sub-results and
counts down ``sub_image_size`` until the image is complete
(``deploy/py_infer/src/parallel/module/common/collect_node.py:75-131``).
Streaming-native equivalent: span fragments for a document may arrive
across micro-batches; per-doc state accumulates ``(offset, kind, text,
media_ref)`` until ``n_total`` fragments arrived, then the assembled
document is emitted (ordered by offset) and the state cleared.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRAGMENT_DDL = (
    "doc_id string, n_total int, offset int, kind string, text string, "
    "media_ref string"
)
OUTPUT_DDL = (
    "doc_id string, out_spans array<struct<kind:string,text:string,"
    "media_ref:string,order:int>>"
)
STATE_DDL = "acc string"


def collect_doc_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate fragments; emit the document once all arrived."""
    (doc_id,) = key
    if state.exists:
        acc = json.loads(state.get[0])
    else:
        acc = {"n_total": None, "spans": []}
    for pdf in pdfs:
        for _, r in pdf.iterrows():
            acc["n_total"] = int(r["n_total"])
            acc["spans"].append(
                [int(r["offset"]), r["kind"], r["text"], r["media_ref"]]
            )
    if acc["n_total"] is not None and len(acc["spans"]) >= acc["n_total"]:
        spans = sorted(acc["spans"], key=lambda s: s[0])
        out_spans = [
            (kind, text, media_ref, order)
            for order, (_off, kind, text, media_ref) in enumerate(spans)
        ]
        state.remove()
        yield pd.DataFrame({"doc_id": [doc_id], "out_spans": [out_spans]})
    else:
        state.update((json.dumps(acc),))
        yield pd.DataFrame({"doc_id": [], "out_spans": []})


def stream_collect_documents(fragments_stream, checkpoint_dir: str, out_dir: str):
    """fragments_stream: streaming DataFrame with FRAGMENT_DDL columns."""
    assembled = fragments_stream.groupBy("doc_id").applyInPandasWithState(
        collect_doc_state,
        OUTPUT_DDL,
        STATE_DDL,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return (
        assembled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
