"""Cross-engine fuzz for the Kirsch-Mitzenmacher minhash arithmetic
(round 5): the expression text produced by ``dedup._km_expr`` must
evaluate to the SAME value on Spark (ANSI mode, wrap-free by
construction), DuckDB (plain BIGINT) and exact Python big-int
``(h1 + s*h2) mod 2^60`` — for every seed and random 60-bit halves.
This is the arithmetic the md5 minhash oracle's hash equality rests on
(same evidence pattern as tests/test_xxh64_sql.py for XXH64)."""

import random

import duckdb
import pandas as pd

from mindocr_spark.operators import dedup

N_RANDOM = 300


def _cases() -> pd.DataFrame:
    rng = random.Random(20260817)
    top = (1 << 60) - 1
    rows = [
        # boundary shapes: zeros, max halves, single bits around the
        # 30-bit split seam
        (0, 0), (top, top), (top, 0), (0, top),
        (1 << 29, 1 << 29), ((1 << 30) - 1, (1 << 30) - 1),
        (1 << 30, 1 << 30), (1 << 59, 1 << 59),
    ]
    rows += [
        (rng.randrange(1 << 60), rng.randrange(1 << 60))
        for _ in range(N_RANDOM)
    ]
    return pd.DataFrame(rows, columns=["h1", "h2"])


def test_km_expr_parity_spark_duckdb_python(spark):
    cases = _cases()
    seeds = [0, 1, 2, 3, 63, 64, 127]  # incl. the s=0 identity shortcut
    exprs = [f"({dedup._km_expr(s)}) AS km{s}" for s in seeds]
    sdf = (
        spark.createDataFrame(cases)
        .selectExpr("h1", "h2", *exprs)
        .toPandas()
        .sort_values(["h1", "h2"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cases", cases)
    ddf = (
        con.execute(
            f"SELECT h1, h2, {', '.join(exprs)} FROM cases"
        )
        .fetchdf()
        .sort_values(["h1", "h2"])
        .reset_index(drop=True)
    )
    for s in seeds:
        col = f"km{s}"
        want = [
            (int(h1) + s * int(h2)) % (1 << 60)
            for h1, h2 in zip(sdf["h1"], sdf["h2"])
        ]
        assert list(sdf[col]) == want, f"spark != exact at s={s}"
        assert list(ddf[col]) == want, f"duckdb != exact at s={s}"


def test_km_expr_intermediates_stay_ansi_safe():
    """Every intermediate is provably < 2^62: h1 < 2^60, the low product
    s*(h2 & M30) < 2^37, the shifted high term < 2^60 — so the sum is
    < 2^61 and Spark's ANSI overflow check can never fire."""
    M30 = (1 << 30) - 1
    s, h2 = 127, (1 << 60) - 1
    assert s * (h2 & M30) < 1 << 37
    assert ((s * (h2 >> 30)) & M30) << 30 < 1 << 60
    assert ((1 << 60) - 1) + (1 << 37) + (1 << 60) < 1 << 62


def test_km_constants_match_threshold():
    assert dedup.JACCARD_T_NUM / dedup.JACCARD_T_DEN == dedup.JACCARD_THRESHOLD
    # _km_expr(0) must be the bare h1 (the identity permutation shortcut)
    assert dedup._km_expr(0) == "h1"
