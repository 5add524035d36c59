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


def test_extract_oracle_assumptions_hold_at_sf01():
    """EXTRACT_ORACLE_SQL is valid only while (a) the HTML strip is an
    identity on wrapper.format(text) and (b) media words are SQL-predictable
    from text. Verify both across the FULL sf0.1 documents table (the gate
    itself only runs sf0.01) so generator drift can't silently invalidate
    the flagship oracle."""
    import duckdb

    from mindocr_spark.data.derive_corpus import _WRAPPERS, media_words_for
    from mindocr_spark.functions.html_text import extract_main_text

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.1/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    assert len(docs) >= 1000
    predicted = con.execute(
        """
        SELECT doc_id,
          coalesce(nullif(array_to_string(
            (list_filter(string_split(text,' '),
                 w -> len(w) BETWEEN 2 AND 7 AND regexp_matches(w,'^[0-9a-z]+$'))
            )[1:3], ' '), ''), 'empty') AS mt
        FROM read_parquet('/root/testdata/sf0.1/documents.parquet')
        ORDER BY doc_id
        """
    ).fetchall()
    # EXTRACT_ORACLE_SQL's m=4 branch self-joins on doc_id - 3: every shared
    # ref must resolve, which requires contiguous doc_ids starting at 0
    ids = sorted(did for did, _ in docs)
    assert ids == list(range(len(ids))), "doc_ids must be contiguous from 0"
    for (did, text), (_, mt) in zip(docs, predicted):
        wrapper = _WRAPPERS[int(did) % len(_WRAPPERS)]
        assert extract_main_text(wrapper.format(text)) == text, did
        # m=2/7 wrap the words string in boilerplate too — strip must be an
        # identity on it as well
        assert extract_main_text(wrapper.format(mt)) == mt, did
        assert " ".join(media_words_for(text)) == mt, did
        # m=3's second media renders words[:1]; the SQL predicts it as the
        # first token of mt
        assert media_words_for(text)[0] == mt.split(" ")[0], did
        # JSON-safety of the oracle's string concatenation
        assert '"' not in text and "\\" not in text, did


def test_round4_oracle_assumptions_hold_at_sf01():
    """The round-4 sub-shape arms of EXTRACT_ORACLE_SQL are valid only while
    (a) the SQL's tall/short regex classes reproduce the font-derived
    ``mixed_height`` gate word-for-word, and (b) the 2x2 table cell layout's
    row-major non-empty join equals ``mt + ' ' + w0``. Verify both across
    the full sf0.1 documents table."""
    import duckdb

    from mindocr_spark.config import CHARSET
    from mindocr_spark.data.derive_corpus import media_words_for
    from mindocr_spark.functions.glyphs import mixed_height, tall_chars

    tall = tall_chars()
    short = "".join(c for c in CHARSET if c not in tall)
    assert set(tall) | set(short) == set(CHARSET)
    assert not set(tall) & set(short)

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id, text,
          len(list_filter(string_split(mt,' '), w -> NOT (
            regexp_matches(w,'[{tall}]') AND regexp_matches(w,'[{short}]')
          ))) = 0 AS allmixed,
          array_to_string(list_reverse(string_split(mt,' ')), ' ') AS rev,
          mt || ' ' || string_split(mt,' ')[1] AS table_text
        FROM (
          SELECT doc_id, text,
            coalesce(nullif(array_to_string(
              (list_filter(string_split(text,' '),
                   w -> len(w) BETWEEN 2 AND 7 AND regexp_matches(w,'^[0-9a-z]+$'))
              )[1:3], ' '), ''), 'empty') AS mt
          FROM read_parquet('/root/testdata/sf0.1/documents.parquet')
        ) ORDER BY doc_id
        """
    ).fetchall()
    assert len(rows) >= 1000
    for did, text, sql_allmixed, sql_rev, sql_table in rows:
        words = media_words_for(text)
        assert all(mixed_height(w) for w in words) == sql_allmixed, did
        assert " ".join(reversed(words)) == sql_rev, did
        cells = [
            [words[0], words[1] if len(words) > 1 else ""],
            [words[2] if len(words) > 2 else "", words[0]],
        ]
        expected = " ".join(t for row in cells for t in row if t)
        assert expected == sql_table, did
