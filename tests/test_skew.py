"""Heavy media-skew corpus: equality holds and the exploded (crop-granular)
mode handles skewed documents identically to the oracle."""

import pytest

from mindocr_spark.data.gen_corpus import gen_corpus_pandas, write_corpus_parquet
from mindocr_spark.oracle.pipeline import extract_documents_oracle
from mindocr_spark.plans.extract import extract, load_corpus


@pytest.fixture(scope="module")
def skewed_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("skewed")
    # 40% media-heavy docs (6-8 media spans each)
    write_corpus_parquet(str(out), 10, seed=7, media_heavy_frac=0.4)
    return str(out), *gen_corpus_pandas(10, seed=7, media_heavy_frac=0.4)


def test_skewed_corpus_has_heavy_docs(skewed_corpus):
    _, spans_pdf, _ = skewed_corpus
    heavy = [
        r for _, r in spans_pdf.iterrows()
        if sum(1 for s in r["spans"] if s["kind"] == "media") >= 6
    ]
    assert len(heavy) >= 2


@pytest.mark.parametrize("mode", ["exploded", "fused"])
def test_skewed_equality(spark, skewed_corpus, mode):
    corpus_dir, spans_pdf, media_pdf = skewed_corpus
    want = extract_documents_oracle(spans_pdf, media_pdf)
    spans, media = load_corpus(spark, corpus_dir)
    rows = extract(spark, spans, media, mode=mode).orderBy("doc_id").collect()
    assert len(rows) == len(want)
    for row, (_, orow) in zip(rows, want.iterrows()):
        got = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["out_spans"]]
        exp = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in orow["out_spans"]]
        assert got == exp, row["doc_id"]
