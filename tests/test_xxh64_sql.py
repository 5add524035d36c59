"""The generated DuckDB XXH64 must equal Spark's xxhash64 bit-for-bit.

Three layers of evidence, cheapest first: (1) the Python reference equals
Spark's xxhash64 on probes covering every code path in the generated
domain (word / 4-byte-chunk / tail bytes, int-literal seeds, chained
longs); (2) the generated SQL equals the Python reference on a
length x seed grid; (3) the corpus the driver oracles over stays inside
the generated domain (ASCII, < 32 bytes per shingle/token).  Together
with CORRECTNESS rows for minhash_lsh_pairs_fast / simhash64_near_dup
(whole-query hash equality at sf0.01), this pins the oracle exactly.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from mindocr_spark.functions import xxh64_sql as X

SF = "/root/testdata/sf0.001"

GRID = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
    "abcdefgh", "abcdefghi", "abcdefghijk", "abcdefghijkl",
    "abcdefghijklmnop", "abcdefghijklmnopq", "abcdefghijklmnopqrst",
    "abcdefghijklmnopqrstuvwx", "abcdefghijklmnopqrstuvwxy",
    "quick brown fox jumps over1", "0123456789012345678901234567890",
]


def test_python_reference_equals_spark(spark):
    rows = spark.createDataFrame([(s,) for s in GRID], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.xxhash64(F.lit(7), F.col("s")).alias("h_seeded"),
    ).collect()
    for r in rows:
        b = r.s.encode()
        assert X.to_signed(X.xxh64_bytes_py(b, X.SPARK_SEED)) == r.h, r.s
        assert (
            X.to_signed(X.xxh64_bytes_py(b, X.xxh64_int_py(7, X.SPARK_SEED)))
            == r.h_seeded
        ), r.s
    lv = spark.createDataFrame(
        [(123456789012345, -987654321098765)], "x long, y long"
    ).select(F.xxhash64("x").alias("hx"), F.xxhash64("x", "y").alias("hxy"))
    g = lv.collect()[0]
    assert g.hx == X.to_signed(X.xxh64_long_py(123456789012345))
    assert g.hxy == X.to_signed(
        X.xxh64_long_py(
            -987654321098765 & (X.M64 - 1), X.xxh64_long_py(123456789012345)
        )
    )


def test_generated_sql_equals_python_reference():
    seeds = [X.SPARK_SEED, X.xxh64_int_py(7), 0, X.M64 - 1]
    fold = X.SqlFold("x")
    prep = X.prep_cols(fold, "s")
    h = X.fold_bytes(fold, prep, "seed")
    con = duckdb.connect()
    con.execute("CREATE TABLE strs AS SELECT unnest(?) AS s", [GRID])
    seed_list = ", ".join(f"{c}::HUGEINT" for c in seeds)
    sql = fold.render(
        f"SELECT s, seed FROM strs, (SELECT unnest([{seed_list}]) AS seed)",
        keep=["s", "seed", h],
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == len(GRID) * len(seeds)
    for s, seed, got in rows:
        assert int(got) == X.xxh64_bytes_py(s.encode(), int(seed)), (s, seed)


def test_generated_long_chain_equals_python_reference():
    fold = X.SqlFold("y")
    h = X.SPARK_SEED
    for c in ("m0", "m1"):
        h = X.fold_long(fold, fold.unsign(c), h)
    sig = fold.sign(h)
    con = duckdb.connect()
    vals = [(0, 1), ((1 << 63) - 1, -(1 << 63) + 1), (-1, -1), (42, -42)]
    vsql = ", ".join(f"({a}::BIGINT, {b}::BIGINT)" for a, b in vals)
    sql = fold.render(
        f"SELECT * FROM (VALUES {vsql}) AS t(m0, m1)", keep=["m0", "m1", sig]
    )
    for m0, m1, got in con.execute(sql).fetchall():
        exp = X.to_signed(
            X.xxh64_long_py(
                int(m1) & (X.M64 - 1),
                X.xxh64_long_py(int(m0) & (X.M64 - 1)),
            )
        )
        assert int(got) == exp, (m0, m1)


def test_corpus_inside_generated_domain(spark):
    """Every shingle and token the driver-gated oracles hash must be ASCII
    and < 32 bytes (the generated SQL has no >= 32 accumulator block)."""
    from mindocr_spark.operators.dedup import SHINGLE_N, _docs, _shingles

    docs = _docs(spark, SF)
    stats = _shingles(docs).select(
        F.max(F.octet_length("shingle")).alias("max_bytes"),
        F.max(F.octet_length("shingle") - F.length("shingle")).alias(
            "non_ascii"
        ),
    ).collect()[0]
    assert stats.max_bytes < 32, "shingle exceeds generated XXH64 domain"
    assert stats.non_ascii == 0, "non-ASCII shingle: unicode() != byte"
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).select(
        F.max(F.octet_length("tok")).alias("max_bytes"),
        F.max(F.octet_length("tok") - F.length("tok")).alias("non_ascii"),
    ).collect()[0]
    assert toks.max_bytes < 32 and toks.non_ascii == 0
    assert SHINGLE_N == 3  # domain bound argument assumes 3-grams


def test_generated_sql_fuzz_equals_reference():
    """Property fuzz: random printable-ASCII strings across the whole
    generated domain (len 0-31, word/4-byte/tail boundaries) x random
    64-bit seeds — the generated SQL must equal the Python reference on
    every case. One DuckDB query evaluates the full grid."""
    import random

    rng = random.Random(0xD0C)
    strs = [
        "".join(chr(rng.randrange(33, 127)) for _ in range(n))
        for n in list(range(32)) + [rng.randrange(32) for _ in range(96)]
    ]
    seeds = [rng.randrange(1 << 64) for _ in range(8)]
    fold = X.SqlFold("z")
    prep = X.prep_cols(fold, "s")
    h = X.fold_bytes(fold, prep, "seed")
    con = duckdb.connect()
    con.execute("CREATE TABLE fz AS SELECT unnest(?) AS s", [strs])
    seed_list = ", ".join(f"{c}::HUGEINT" for c in seeds)
    sql = fold.render(
        f"SELECT s, seed FROM fz, (SELECT unnest([{seed_list}]) AS seed)",
        keep=["s", "seed", h],
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == len(strs) * len(seeds)
    for s, seed, got in rows:
        assert int(got) == X.xxh64_bytes_py(s.encode(), int(seed)), (s, seed)
