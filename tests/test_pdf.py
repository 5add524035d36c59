"""PDF text-layer parse (north rule: 'PDF/layout parse')."""

import zlib

import pytest

from mindocr_spark.functions.pdf_text import extract_pdf_text, make_simple_pdf
from mindocr_spark.kernels.system import media_payload_text


def test_roundtrip_compressed():
    pdf = make_simple_pdf(["hello world", "line two 42"])
    assert pdf.startswith(b"%PDF")
    assert extract_pdf_text(pdf) == "hello world line two 42"


def test_roundtrip_uncompressed():
    pdf = make_simple_pdf(["plain stream"], compress=False)
    assert extract_pdf_text(pdf) == "plain stream"


def test_escapes_and_parens():
    pdf = make_simple_pdf(["a (quoted) \\ backslash"])
    assert extract_pdf_text(pdf) == "a (quoted) \\ backslash"


def test_tj_array_operator():
    # hand-built TJ array form
    content = b"BT [(kerned) -120 (pair)] TJ ET"
    body = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "kerned pair"


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        extract_pdf_text(b"plain bytes")


def test_payload_router():
    pdf = make_simple_pdf(["routed text"])
    assert media_payload_text(pdf) == "routed text"
    assert media_payload_text(b"junk") == ""
    assert media_payload_text(None) == ""
    # corrupt PDF body -> empty, not crash
    assert media_payload_text(b"%PDF-1.4 garbage") == ""


def test_corpus_contains_pdfs_and_matches_expected():
    from mindocr_spark.data.gen_corpus import gen_corpus_pandas
    from mindocr_spark.oracle.pipeline import extract_documents_oracle

    spans, media = gen_corpus_pandas(40, seed=42)
    pdf_rows = media[media["media_ref"].str.startswith("pdf_")]
    assert len(pdf_rows) > 0
    out = extract_documents_oracle(spans, media)
    expected = dict(zip(media["media_ref"], media["expected_text"]))
    n = 0
    for _, r in out.iterrows():
        for s in r["out_spans"]:
            if s["media_ref"] and s["media_ref"].startswith("pdf_"):
                assert s["text"] == expected[s["media_ref"]]
                n += 1
    assert n == len(pdf_rows)


def test_flate_stream_ending_in_carriage_return():
    """Regression (round-2 gate catch): zlib.compress('... (fast merge row) ...')
    ends in byte 0x0d; an `\\r?\\nendstream` delimiter regex swallows it and
    truncates the deflate stream. The extractor must honor /Length instead."""
    import zlib

    text = "fast merge row"
    pdf = make_simple_pdf([text])
    content = b"BT /F1 12 Tf 50 750 Td (fast merge row) Tj 0 -16 Td ET"
    assert zlib.compress(content).endswith(b"\r")  # the trap is real
    assert extract_pdf_text(pdf) == text


def test_stream_without_length_falls_back_to_delimiter_scan():
    pdf = make_simple_pdf(["no length key"], compress=False)
    pdf = pdf.replace(b"/Length", b"/XLenX")  # same byte count, key unknown
    assert extract_pdf_text(pdf) == "no length key"


def test_indirect_length_reference_falls_back():
    """'/Length 12 0 R' is an object REFERENCE: treating 12 as a byte count
    slices a 12-byte body and silently drops the stream (ADVICE r2). The
    extractor must detect the '<n> <gen> R' form and use the delimiter scan
    (common in incrementally-written PDFs)."""
    body = zlib.compress(b"BT (indirect length) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 12 0 R >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"12 0 obj\n" + str(len(body)).encode() + b"\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "indirect length"


def test_wrong_direct_length_falls_back():
    """A direct /Length that does not land on 'endstream' (corrupt or
    post-edit stale) must not truncate the body."""
    body = zlib.compress(b"BT (stale length) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 3 >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "stale length"


def test_nested_dict_keeps_filter_and_length():
    """A stream dict containing a nested dict (/DecodeParms <<...>>) must
    keep its own /Filter and /Length — an rsplit on '<<' loses both and the
    deflate body is then scanned as raw bytes (ADVICE r2)."""
    body = zlib.compress(b"BT (nested dict) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode "
        b"/DecodeParms << /Foo 12 >> /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "nested dict"


def test_stream_lookalike_inside_uncompressed_body_is_not_a_stream():
    """'<<...>>stream' byte patterns INSIDE a body must not spawn phantom
    streams: the scan cursor advances past each consumed body."""
    inner = b"BT (real text) Tj ET << /Fake 1 >>\nstream\nBT (phantom) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(inner)).encode()
        + b" >>\nstream\n" + inner + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "real text phantom"
