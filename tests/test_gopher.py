"""Gopher repetition-signal tests: hand-computed fixtures pin the score
definitions (dup/top n-gram fractions, floor-div basis points, the
short-doc truncated-gram convention); the driver's DuckDB hash oracle
pins Spark==DuckDB on the corpus."""

from mindocr_spark.operators import quality as Q

SF = "/root/testdata/sf0.001"


def _rep_rows(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r.asDict() for r in Q._gopher_repetition(docs).collect()}


def test_gopher_scores_hand_computed(spark):
    rows = _rep_rows(spark, [
        "a b a b a b",      # doc 0: heavy 2-gram repetition
        "a b c d e f",      # doc 1: no repetition
        "x x x x",          # doc 2: a single repeated token
    ])
    # doc 0: 2-grams of "a b a b a b" = [ab, ba, ab, ba, ab] -> total 5,
    # distinct 2, max 3 -> dup = 10000*3//5 = 6000, top = 10000*3//5 = 6000
    assert rows[0]["dup2_bp"] == 6000 and rows[0]["top2_bp"] == 6000
    # doc 0 3-grams: [aba, bab, aba, bab] -> dup 10000*2//4=5000, top 5000
    assert rows[0]["dup3_bp"] == 5000 and rows[0]["top3_bp"] == 5000
    # doc 1: all n-grams distinct
    assert rows[1]["dup2_bp"] == 0 and rows[1]["dup3_bp"] == 0
    assert rows[1]["top2_bp"] == 10000 * 1 // 5  # 5 distinct 2-grams
    # doc 2: "x x x x" -> 2-grams [xx,xx,xx]: dup 6666, top 10000
    assert rows[2]["dup2_bp"] == 6666 and rows[2]["top2_bp"] == 10000


def test_gopher_short_doc_truncated_gram(spark):
    # single-token doc: every n falls back to one truncated gram
    # (greatest(size-n+1, 1) = 1), total=1 distinct=1 max=1
    rows = _rep_rows(spark, ["solo"])
    for n in Q.GOPHER_NGRAMS:
        assert rows[0][f"dup{n}_bp"] == 0
        assert rows[0][f"top{n}_bp"] == 10000


def test_gopher_filter_composition(spark):
    out = Q.gopher_quality_filter(spark, SF)
    rep = Q.gopher_repetition(spark, SF)
    n_docs = rep.count()
    kept = out.count()
    # thresholds are calibrated to split this corpus: a real filter, not
    # a pass-through and not a wipe-out
    assert 0 < kept < n_docs
    # every kept row satisfies every threshold
    bad = out
    for col, bp in Q.GOPHER_KEEP_BP.items():
        bad = bad.filter(f"{col} > {bp}")
    assert bad.count() == 0
    assert set(out.columns) == {"doc_id", "lang", *Q.GOPHER_KEEP_BP}


def test_decontamination_broadcast_and_semantics(spark):
    """The eval-gram side must BROADCAST (benchmarks are small by nature;
    a shuffle join here would shuffle the training grams), and every
    flagged doc must be a training doc with hit_frac consistent."""
    df = Q.decontamination_flags(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc_id % Q.DECON_EVAL_MOD != 0
        assert 0 < r.n_hits <= r.n_grams
        assert r.hit_frac_bp == 10000 * r.n_hits // r.n_grams


def test_duplicate_span_coverage_semantics(spark):
    """Coverage counts DISTINCT token positions (overlapping duplicated
    spans never double-count), is bounded by n_tokens, and flags only
    docs whose spans actually recur in ANOTHER doc."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y z w v"),     # shares 'a b c d e' with doc 2
            (2, "a b c d e q r s t u"),
            (3, "k l m n o p j h g f"),     # unique
        ],
        "doc_id long, text string",
    )
    import mindocr_spark.operators.quality as Q2
    orig = Q2._docs
    Q2._docs = lambda spark, sf_dir: docs
    try:
        rows = {r.doc_id: r for r in Q2.duplicate_span_coverage(spark, "ignored").collect()}
    finally:
        Q2._docs = orig
    assert set(rows) == {1, 2}  # doc 3 has no cross-doc span
    # 'a b c d e' covers positions 1-5 of each sharer: 5/10 tokens
    for d in (1, 2):
        assert rows[d].covered == 5 and rows[d].n_tokens == 10
        assert rows[d].coverage_bp == 5000


# --- model_quality_filter (round 5) ------------------------------------------


def test_model_weights_match_xxh64_reference(spark):
    # the hashed weight of each token must equal the Python XXH64
    # reference (which tests/test_xxh64_sql.py pins to Spark bit-for-bit)
    from mindocr_spark.functions.xxh64_sql import M64, xxh64_bytes_py

    texts = ["alpha beta", "gamma gamma delta9"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    import pyspark.sql.functions as F

    slots = spark.sparkContext.defaultParallelism
    got = {
        r.doc_id: r.asDict()
        for r in (
            docs.repartition(2 * slots, "doc_id")
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.expr(
                        f"pmod(xxhash64(tok), {Q.MODEL_WEIGHT_MOD})"
                        f" - {Q.MODEL_WEIGHT_MOD // 2}"
                    )
                ).alias("score_fp")
            )
            .collect()
        )
    }

    def w(tok):
        u = xxh64_bytes_py(tok.encode())
        signed = u - M64 if u >= 1 << 63 else u
        return signed % Q.MODEL_WEIGHT_MOD - Q.MODEL_WEIGHT_MOD // 2

    for i, t in enumerate(texts):
        assert got[i]["score_fp"] == sum(w(tok) for tok in t.split(" "))


def test_model_quality_filter_corpus(spark):
    df = Q.model_quality_filter(spark, SF).toPandas()
    assert len(df) == 500
    # integer threshold: keep iff 1000*score_fp >= MODEL_KEEP_MILLI*n_toks
    import numpy as np

    want = (
        1000 * df.score_fp.to_numpy() >= Q.MODEL_KEEP_MILLI * df.n_toks.to_numpy()
    ).astype(np.int32)
    assert (df.keep.to_numpy() == want).all()
    # a real split, not a constant classifier
    assert 0 < df.keep.sum() < len(df)


def test_model_tokens_inside_generated_sql_domain():
    # MODEL_QUALITY_SQL is generated at max_words=1 (len <= 15 bytes);
    # every corpus token must stay inside that domain at every sf
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mx = con.execute(
            "SELECT max(strlen(t.tok)) FROM (SELECT unnest(string_split(text, ' ')) AS tok "
            f"FROM '/root/testdata/{sf}/documents.parquet') t"
        ).fetchone()[0]
        assert mx <= 15, f"{sf}: token of {mx} bytes exceeds the 8*1+7 bound"


def test_model_quality_plan_shape(spark):
    # one compact-table repartition, exchange-free aggregate, zero joins
    plan = (
        Q.model_quality_filter(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
