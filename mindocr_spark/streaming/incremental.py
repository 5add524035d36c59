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
    """File-stream the spans table; extract per micro-batch; parquet sink
    partitioned by ``batch_id``.

    Exactly-once = checkpointed offsets + an idempotent sink. foreachBatch
    alone is at-least-once (a crash between the sink write and the offset
    commit replays the micro-batch), so the sink must absorb replays: each
    micro-batch dynamically OVERWRITES its own ``batch_id=N`` partition —
    Structured Streaming guarantees a replayed batch has the same batch_id
    and the same input rows, so the rewrite is a no-op, never a duplicate.
    """
    stream = (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(spans_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import functions as F

        sess = batch_df.sparkSession
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out = extract(sess, batch_df, media, mode=mode).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        out.write.partitionBy("batch_id").mode("overwrite").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Watermarked tumbling-window aggregation over an event stream.

    Late events older than the watermark relative to the max seen ts are
    dropped; windows close and emit once finalized (append mode) — the
    Structured Streaming windowing the reference's pipeline engine has no
    counterpart for (SURVEY.md §2.11 note).
    """
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- driver-gated batch facade (round 5, verdict #5) -------------------------

STREAM_WINDOWED_SQL = """
WITH mx AS (SELECT max(ts) AS m FROM events),
agg AS (SELECT date_trunc('hour', ts) AS ws, count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, n, sum_value
FROM agg, mx WHERE ws + INTERVAL 1 HOUR <= m - INTERVAL 30 MINUTE
"""


def stream_windowed_counts_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run :func:`stream_windowed_counts` over the events table as an
    availableNow job and return the sink's contents — the driver-oracled
    surface for the watermarked-window streaming path (round 5).

    Append-mode watermark semantics are DETERMINISTIC here and exactly
    SQL-expressible (``STREAM_WINDOWED_SQL``): the job processes the
    backlog, the watermark settles at max(ts) - 30min, and the final
    no-data micro-batch flushes every window whose END is <= that
    watermark — so the emitted set is "all closed windows", regardless of
    how the backlog was split into micro-batches.  Windows still open at
    end-of-backlog are (correctly) withheld; a real deployment's next run
    emits them from the checkpointed state.

    The single-file events table is symlinked into a fresh landing
    directory because FileStreamSource requires a directory source; sink
    and checkpoint live in the same per-call tempdir (removed at
    interpreter exit — the driver contract is stateless)."""
    import atexit
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mindocr_stream_counts_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    landing = os.path.join(tmp, "events")
    os.makedirs(landing)
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if os.path.isdir(src):
        for name in os.listdir(src):
            if name.endswith(".parquet"):
                os.symlink(
                    os.path.join(src, name), os.path.join(landing, name)
                )
    else:
        os.symlink(src, os.path.join(landing, "part-0.parquet"))
    q = stream_windowed_counts(
        spark,
        landing,
        os.path.join(tmp, "out"),
        os.path.join(tmp, "ckpt"),
    )
    q.awaitTermination(600)
    return spark.read.parquet(os.path.join(tmp, "out"))
