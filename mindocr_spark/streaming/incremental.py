"""Incremental extraction over a growing spans table.

The reference's "streaming" is pipeline parallelism over bounded queues
(``deploy/py_infer``, SURVEY.md §2.11) — batch semantics with flow control.
The Spark-native equivalent for a continuously-ingested corpus is a file
(or Iceberg incremental) stream + ``foreachBatch`` running the SAME batch
extraction plan per micro-batch, writing partition-append output with an
exactly-once checkpoint. The media table is a static (slowly-changing) side
input joined per micro-batch, as the reference joins crops to their source
image.

``availableNow`` trigger processes the backlog and stops — the batch-job
mode used in tests; remove the trigger for a long-running tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..plans.extract import extract

SPANS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def stream_extract(
    spark: SparkSession,
    spans_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "fused",
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream the spans table; extract per micro-batch; parquet-append.

    Exactly-once: the stream checkpoint tracks consumed input files; the
    sink is append-only keyed by doc_id (re-runs after checkpoint restore do
    not duplicate completed micro-batches).
    """
    stream = (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(spans_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = extract(batch_df.sparkSession, batch_df, media, mode=mode)
        out.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
