"""SparkSession factory with the engine's tuned defaults.

Tuning rationale (SURVEY.md §4):
- AQE on: runtime re-plan + skew splitting for media-heavy documents.
- Arrow on + small ``maxRecordsPerBatch``: media rows carry whole images;
  a batch of 64 bounds executor-python memory while still amortizing the
  Arrow IPC boundary (the analogue of the reference's ``rec_batch_num``
  micro-batching, ``predict_rec.py:139-197``).
- shuffle partitions sized for local[32]; on a real cluster AQE coalesces.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import ARROW_MAX_RECORDS, SHUFFLE_PARTITIONS


def _pin_blas_threads() -> None:
    """One BLAS/OMP thread per python worker: each Spark task is already a
    process; letting OpenBLAS fan out inside every worker oversubscribes the
    box and collapses scaling of the numpy-heavy UDF stages."""
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(var, "1")


def _export_pkg_pythonpath() -> None:
    """Make the package root importable in python WORKERS regardless of the
    driver's cwd: the JVM passes the driver process's PYTHONPATH env through
    to every worker, and the round-7 daemon shim
    (``spark.python.daemon.module=mindocr_spark.spark_daemon``) must be
    importable there before any task runs."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )


def get_spark(
    app_name: str = "mindocr_spark",
    cores: int | None = None,
    shuffle_partitions: int = SHUFFLE_PARTITIONS,
) -> SparkSession:
    _pin_blas_threads()
    _export_pkg_pythonpath()
    master = None
    if cores is not None:
        master = f"local[{cores}]"
    elif os.environ.get("SPARK_GRAFT_CPUS"):
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled", "true"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Round 7: wide-aggregate codegen — the 129-column minhash
        # aggregates exceed the default 100-field whole-stage-codegen
        # ceiling and fell back to interpreted evaluation; 1024 keeps them
        # compiled (paired in-session A/B: md5 minhash agg ~12% faster
        # steady-state; one-time Janino compile absorbed by warmup).
        .config("spark.sql.codegen.maxFields", "1024")
        # Round 7: python workers boot through our daemon shim, which
        # backports CPython 3.12's zipimport.invalidate_caches mtime check
        # (gh-87382). Without it, EVERY task's setup_spark_files re-parses
        # the pyspark.zip central directory — measured 160 ms of worker CPU
        # per task, the largest single per-task cost in every Python stage
        # (see mindocr_spark/spark_daemon.py and OPTIMIZATION_r07.md).
        # Overridable for stock behavior via MINDOCR_PYTHON_DAEMON=pyspark.daemon.
        .config(
            "spark.python.daemon.module",
            os.environ.get("MINDOCR_PYTHON_DAEMON", "mindocr_spark.spark_daemon"),
        )
    )
    if os.name == "posix":
        # Round 7: JVM<->python-worker channel over a unix domain socket
        # (Spark 4.1 feature) — skips the localhost TCP stack + per-connect
        # auth on every worker channel; measured ~5-10% off python-stage
        # task latency (ABAB microbench, OPTIMIZATION_r07.md).
        builder = builder.config(
            "spark.python.unix.domain.socket.enabled", "true"
        )
    # scale/deploy-specific overrides without code changes (e.g. a cluster
    # points MINDOCR_SPARK_EXTRA_CONF at its shuffle/io/codegen settings);
    # ';'-separated key=value pairs, applied last so they win
    extra = os.environ.get("MINDOCR_SPARK_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    if master:
        builder = builder.master(master)
    else:
        builder = builder.master("local[*]")
    return builder.getOrCreate()
