"""Checkpointed lineage + exact resume (north_rule: 'resumable from
checkpoint with per-partition lineage + metrics')."""

import shutil

import pytest
from pyspark.sql import functions as F

from mindocr_spark.plans.extract import extract, load_corpus
from mindocr_spark.plans.lineage import (
    completed_buckets,
    read_lineage,
    read_output,
    run_extract_job,
)

N_BUCKETS = 4


@pytest.fixture()
def corpus(spark, small_corpus):
    corpus_dir, _, _ = small_corpus
    return load_corpus(spark, corpus_dir)


def _sorted_tuples(df):
    rows = df.orderBy("doc_id").collect()
    return [
        (
            r["doc_id"],
            tuple(
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in r["out_spans"]
            ),
        )
        for r in rows
    ]


def test_full_run_then_noop_resume(spark, corpus, tmp_path):
    spans, media = corpus
    out = str(tmp_path / "out")
    stats1 = run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r1")
    assert stats1["buckets_skipped"] == 0
    assert sorted(completed_buckets(spark, out)) == sorted(
        set(completed_buckets(spark, out))
    )

    # output equals the direct plan
    direct = extract(spark, spans, media, mode="fused")
    assert _sorted_tuples(read_output(spark, out)) == _sorted_tuples(direct)

    # resume with everything complete: nothing reprocessed
    stats2 = run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r2")
    assert stats2["buckets_processed"] == 0
    assert stats2["buckets_skipped"] == len(completed_buckets(spark, out))


def test_resume_recomputes_only_missing_bucket(spark, corpus, tmp_path):
    spans, media = corpus
    out = str(tmp_path / "out")
    run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r1")
    direct = _sorted_tuples(extract(spark, spans, media, mode="fused"))

    # simulate a crash that lost one bucket: drop its lineage rows AND its
    # output partition
    done = completed_buckets(spark, out)
    victim = sorted(done)[0]
    lin = read_lineage(spark, out).filter(F.col("bucket") != victim)
    lin_pdf = lin.toPandas()
    shutil.rmtree(f"{out}/_lineage")
    spark.createDataFrame(lin_pdf, lin.schema).write.mode("overwrite").parquet(
        f"{out}/_lineage"
    )
    shutil.rmtree(f"{out}/bucket={victim}")

    stats = run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r2")
    assert stats["buckets_processed"] >= 1
    redone = read_lineage(spark, out).filter(F.col("run_id") == "r2")
    assert victim in {r["bucket"] for r in redone.select("bucket").collect()}
    assert _sorted_tuples(read_output(spark, out)) == direct


def test_lineage_metrics_counters(spark, corpus, tmp_path):
    spans, media = corpus
    out = str(tmp_path / "out")
    run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r1")
    lin = read_lineage(spark, out)
    total_docs = lin.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == spans.count()
    row = lin.limit(1).collect()[0]
    assert row["status"] == "complete"
    assert row["run_id"] == "r1"
    assert row["wall_sec"] > 0


def test_lineage_exploded_salted(spark, corpus, tmp_path):
    """Resume machinery composes with exploded mode + salting."""
    spans, media = corpus
    out = str(tmp_path / "out")
    stats = run_extract_job(
        spark, spans, media, out, mode="exploded", n_buckets=N_BUCKETS,
        run_id="r1", salt_buckets=3,
    )
    assert stats["buckets_processed"] == len(completed_buckets(spark, out))
    direct = extract(spark, spans, media, mode="fused")
    assert _sorted_tuples(read_output(spark, out)) == _sorted_tuples(direct)


def test_resume_stats_scan_prunes_partitions(spark, corpus, tmp_path):
    """The post-write stats scan filters on the PHYSICAL partition column, so
    Catalyst prunes completed buckets at the file index (round-1 verdict: a
    recomputed-hash filter forced a full-output rescan on every resume)."""
    spans, media = corpus
    out = str(tmp_path / "out")
    run_extract_job(spark, spans, media, out, n_buckets=N_BUCKETS, run_id="r1")
    done = sorted(completed_buckets(spark, out))
    assert len(done) > 1
    # the exact filter shape run_extract_job uses for the fresh-stats scan
    fresh = spark.read.parquet(out).filter(~F.col("bucket").isin(done[:-1]))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: []" not in plan
    assert "PartitionFilters" in plan
    # and the file index only surfaces the un-pruned bucket's files
    files = {
        r[0] for r in fresh.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(f"bucket={done[-1]}" in f for f in files)
