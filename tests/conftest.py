import pytest


@pytest.fixture(scope="session")
def spark():
    from mindocr_spark.session import get_spark

    s = get_spark(app_name="mindocr_spark_tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 20-doc corpus written to parquet once per session."""
    from mindocr_spark.data.gen_corpus import gen_corpus_pandas, write_corpus_parquet

    out = tmp_path_factory.mktemp("corpus")
    write_corpus_parquet(str(out), 20, seed=42)
    spans_pdf, media_pdf = gen_corpus_pandas(20, seed=42)
    return str(out), spans_pdf, media_pdf
