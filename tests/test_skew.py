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


def test_extreme_skew_doc_and_dense_image(spark):
    """One document with 40 media spans + one image with a dense word grid:
    exploded mode stays correct (crop-granular) and matches the oracle."""
    import pandas as pd

    from mindocr_spark.functions.glyphs import render_page
    from mindocr_spark.functions.png_codec import encode_png
    from mindocr_spark.oracle.pipeline import extract_documents_oracle

    # dense page: 4 rows x 3 cols = 12 words
    words = ["w%02d" % i for i in range(12)]
    placed = [
        (w, 16 + (i // 3) * 64, 16 + (i % 3) * 224) for i, w in enumerate(words)
    ]
    dense_png = encode_png(render_page(placed, 288, 704)[0])

    spans = []
    media_rows = []
    for k in range(40):
        ref = f"m{k:03d}"
        spans.append(("media", None, ref, k))
        media_rows.append({"media_ref": ref, "image": dense_png})
    spans_pdf = pd.DataFrame(
        [{"doc_id": "heavy", "spans": [
            {"kind": s[0], "text": s[1], "media_ref": s[2], "offset": s[3]}
            for s in spans
        ]}]
    )
    media_pdf = pd.DataFrame(media_rows)
    want = extract_documents_oracle(spans_pdf, media_pdf)

    spans_df = spark.createDataFrame(
        [("heavy", [tuple(s) for s in spans])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(media_pdf)
    from mindocr_spark.plans.extract import extract

    row = extract(spark, spans_df, media_df, mode="exploded").collect()[0]
    got = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["out_spans"]]
    exp = [
        (s["kind"], s["text"], s["media_ref"], s["order"])
        for s in want.iloc[0]["out_spans"]
    ]
    assert got == exp
    assert len(got) == 40
    assert got[0][1] == " ".join(words)
