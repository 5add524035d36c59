"""The correctness gate: Spark extraction == single-process oracle,
span-sequence equality (kind, text, media_ref, order) per document
(``BASELINE.json:north_rule`` / input_hint invariant)."""

import pytest

from mindocr_spark.oracle.pipeline import extract_documents_oracle
from mindocr_spark.plans.extract import extract, load_corpus


def _spans_tuples(out_spans):
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in out_spans]


@pytest.fixture(scope="module")
def oracle_result(small_corpus):
    _, spans_pdf, media_pdf = small_corpus
    return extract_documents_oracle(spans_pdf, media_pdf)


@pytest.mark.parametrize(
    ("mode", "salt"), [("fused", 0), ("exploded", 0), ("fused", 4)]
)
def test_span_sequence_equality(spark, small_corpus, oracle_result, mode, salt):
    corpus_dir, _, _ = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    rows = (
        extract(spark, spans, media, mode=mode, salt_buckets=salt)
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows) == len(oracle_result)
    for row, (_, orow) in zip(rows, oracle_result.iterrows()):
        assert row["doc_id"] == orow["doc_id"]
        assert _spans_tuples(row["out_spans"]) == _spans_tuples(orow["out_spans"]), (
            row["doc_id"]
        )


def test_output_schema(spark, small_corpus):
    corpus_dir, _, _ = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    df = extract(spark, spans, media, mode="fused")
    fields = dict(df.dtypes)
    assert fields["doc_id"] == "string"
    assert (
        fields["out_spans"]
        == "array<struct<kind:string,text:string,media_ref:string,order:int>>"
    )


def test_unreadable_media_yields_empty_text(spark, small_corpus):
    """Decode-failure skip semantics (decode_node.py:30-42)."""
    import pandas as pd

    corpus_dir, spans_pdf, media_pdf = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    # corrupt every image
    bad_media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": media_pdf["media_ref"],
                "image": [b"not a png" for _ in range(len(media_pdf))],
            }
        )
    )
    rows = extract(spark, spans, bad_media, mode="fused").collect()
    for row in rows:
        for s in row["out_spans"]:
            if s["media_ref"] is not None:
                assert s["text"] == ""


@pytest.mark.parametrize("mode", ["fused", "exploded"])
def test_missing_media_yields_empty_span(spark, small_corpus, mode):
    """A media span whose media_ref is absent from the media table still
    appears, with empty text (decode-skip semantics)."""
    corpus_dir, _, _ = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    from pyspark.sql import functions as F

    half_media = media.filter(F.pmod(F.xxhash64("media_ref"), F.lit(2)) == 0)
    kept_refs = {r["media_ref"] for r in half_media.select("media_ref").collect()}
    rows = extract(spark, spans, half_media, mode=mode).collect()
    n_docs_in = spans.count()
    assert len(rows) == n_docs_in  # no document lost
    checked = 0
    for row in rows:
        for s in row["out_spans"]:
            if s["media_ref"] is not None and s["media_ref"] not in kept_refs:
                assert s["text"] == ""
                checked += 1
    assert checked > 0


def test_empty_spans_doc_survives(spark):
    """A document with spans=[] yields a row with out_spans=[]."""
    spans = spark.createDataFrame(
        [("doc_a", [("text", "<p>hello there</p>", None, 0)]), ("doc_b", [])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    media = spark.createDataFrame(
        [], "media_ref string, image binary"
    )
    rows = {r["doc_id"]: r for r in extract(spark, spans, media, mode="fused").collect()}
    assert set(rows) == {"doc_a", "doc_b"}
    assert rows["doc_b"]["out_spans"] == []
    assert rows["doc_a"]["out_spans"][0]["text"] == "hello there"


def test_partitioning_invariance(spark, small_corpus):
    """Same result regardless of shuffle partitioning (no implicit-order
    dependence anywhere in the plan)."""
    corpus_dir, _, _ = small_corpus
    spans, media = load_corpus(spark, corpus_dir)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = extract(spark, spans.repartition(3), media.repartition(5), mode="fused").orderBy("doc_id").collect()
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        b = extract(spark, spans.repartition(11), media.repartition(2), mode="exploded").orderBy("doc_id").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [_spans_tuples(r["out_spans"]) for r in a] == [
        _spans_tuples(r["out_spans"]) for r in b
    ]
