"""Checkpointed, exactly-resumable extraction job (north_rule requirement).

Protocol (SURVEY.md §4 item 3):

- The corpus is split into ``n_buckets`` deterministic doc_id hash buckets
  (``pmod(xxhash64(doc_id), N)`` — the parquet stand-in for an Iceberg
  ``bucket(N, doc_id)`` partition transform).
- Output is written ``partitionBy(bucket)`` with dynamic partition
  overwrite, so re-processing a bucket is an idempotent partition rewrite
  (the parquet analogue of Iceberg ``overwritePartitions``).
- A lineage table ``{out}/_lineage`` records one row per completed bucket
  with counters and wall time (the metrics table the reference's
  pipeline profiler approximates, ``pipeline_manager.py:98-136``).
- On (re)start, completed buckets are anti-joined away: only incomplete
  buckets are recomputed, in one Spark job (not a per-bucket loop), so
  resume costs one scan + the remaining work.

Crash window analysis: lineage is appended only after a bucket's output
partition commit; a crash between the two leaves the bucket marked
incomplete and it is rewritten on resume — output is never read between
jobs, so the resume is exact.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract

LINEAGE_SCHEMA = (
    "bucket int, status string, n_docs long, n_out_spans long, "
    "n_media_spans long, wall_sec double, run_id string"
)


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    try:
        return spark.read.parquet(f"{out_dir}/_lineage")
    except Exception:  # noqa: BLE001 - first run: no lineage yet
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    lin = read_lineage(spark, out_dir)
    return [
        r["bucket"]
        for r in lin.filter(F.col("status") == "complete")
        .select("bucket")
        .distinct()
        .collect()
    ]


def run_extract_job(
    spark: SparkSession,
    spans: DataFrame,
    media: DataFrame,
    out_dir: str,
    mode: str = "fused",
    n_buckets: int = 32,
    run_id: str = "run",
    salt_buckets: int = 0,
) -> dict:
    """Run (or resume) the bucketed extraction job. Returns stats."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = set(completed_buckets(spark, out_dir))
    todo_spans = spans.withColumn("bucket", _bucket_col(n_buckets))
    if done:
        todo_spans = todo_spans.filter(~F.col("bucket").isin(sorted(done)))
    t0 = time.time()
    result = extract(
        spark, todo_spans.drop("bucket"), media, mode=mode,
        salt_buckets=salt_buckets,
    )
    result = result.withColumn("bucket", _bucket_col(n_buckets))
    result.write.partitionBy("bucket").mode("overwrite").parquet(out_dir)
    wall = time.time() - t0

    # per-bucket metrics from the committed output (exactly what landed).
    # Filter on the PHYSICAL partition column `bucket`: Catalyst prunes the
    # completed buckets' directories at the file-index level, so a resume
    # reads only the freshly-written partitions (a recomputed-hash filter
    # would force a full-output scan — at 100 TB that is the whole dataset).
    out = spark.read.parquet(out_dir)
    fresh = out.filter(~F.col("bucket").isin(sorted(done)) if done else F.lit(True))
    stats = (
        fresh.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("out_spans")).cast("long").alias("n_out_spans"),
            F.sum(
                F.size(F.filter("out_spans", lambda s: s["kind"] == F.lit("media")))
            )
            .cast("long")
            .alias("n_media_spans"),
        )
        .withColumn("status", F.lit("complete"))
        .withColumn("wall_sec", F.lit(float(wall)))
        .withColumn("run_id", F.lit(run_id))
        .select(
            "bucket", "status", "n_docs", "n_out_spans", "n_media_spans",
            "wall_sec", "run_id",
        )
    )
    # one job, not two: stats is <= n_buckets rows — collect it once, append
    # via a local DataFrame (recomputing the aggregation for the count would
    # re-run the whole stats scan)
    stat_rows = stats.collect()
    spark.createDataFrame(stat_rows, LINEAGE_SCHEMA).write.mode("append").parquet(
        f"{out_dir}/_lineage"
    )
    n_processed = len(stat_rows)
    return {
        "buckets_total": n_buckets,
        "buckets_skipped": len(done),
        "buckets_processed": int(n_processed),
        "wall_sec": wall,
    }


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir).drop("bucket")
