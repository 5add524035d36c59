"""Generator determinism + oracle quality (media texts == rendered ground
truth; text extraction == known body)."""

import numpy as np

from mindocr_spark.data.gen_corpus import (
    gen_corpus_pandas,
    gen_doc,
    make_text_span_html,
)
from mindocr_spark.functions.html_text import extract_main_text
from mindocr_spark.oracle.pipeline import extract_documents_oracle


def test_generation_deterministic():
    a, _ = gen_doc(42, 7)
    b, _ = gen_doc(42, 7)
    assert a == b


def test_generation_order_independent():
    # doc i is a pure function of (seed, i) — parallelizable on executors
    spans1, media1 = gen_corpus_pandas(5, seed=42)
    solo, solo_media = gen_doc(42, 3)
    assert spans1.iloc[3]["spans"] == solo["spans"]


def test_spans_schema(small_corpus):
    _, spans_pdf, media_pdf = small_corpus
    for _, row in spans_pdf.iterrows():
        assert row["doc_id"].startswith("doc_")
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == list(range(len(offsets)))
        for s in row["spans"]:
            assert s["kind"] in ("text", "media")
            assert (s["kind"] == "text") == (s["media_ref"] is None)


def test_oracle_media_matches_ground_truth(small_corpus):
    _, spans_pdf, media_pdf = small_corpus
    out = extract_documents_oracle(spans_pdf, media_pdf)
    expected = dict(zip(media_pdf["media_ref"], media_pdf["expected_text"]))
    n = 0
    for _, row in out.iterrows():
        for s in row["out_spans"]:
            if s["kind"] == "media":
                assert s["text"] == expected[s["media_ref"]], s["media_ref"]
                n += 1
    assert n > 0


def test_text_path_exact_roundtrip():
    rng = np.random.RandomState(999)
    for _ in range(50):
        html, body = make_text_span_html(rng)
        assert extract_main_text(html) == body


def test_oracle_order_is_offset_rank(small_corpus):
    _, spans_pdf, media_pdf = small_corpus
    out = extract_documents_oracle(spans_pdf, media_pdf)
    for _, row in out.iterrows():
        assert [s["order"] for s in row["out_spans"]] == list(
            range(len(row["out_spans"]))
        )
