"""Round-7 exact_hamming_pairs skeleton: the duplicate-cluster-safe form
of the exact-hamming near-dup join (dedup.py).

The covering contract: for ANY signature table the output equals the
quadratic all-pairs form at the threshold — including the two paths the
skeleton splits (identical-signature pairs via the plain equi-join,
hamming 1..max via distinct-signature combo tables + member expansion)
and their seam (no pair emitted twice, no pair lost)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from mindocr_spark.operators.dedup import (
    SIMHASH_BANDED_HAMMING_MAX,
    exact_hamming_pairs,
    manku64_combo_structs,
)


@pytest.fixture(scope="module")
def spark():
    from mindocr_spark.session import get_spark

    s = get_spark(app_name="test_exact_hamming", cores=2)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _manku64_tables(distinct_sig):
    structs = manku64_combo_structs("simhash")
    return distinct_sig.select(
        "simhash", F.explode(F.array(*structs)).alias("c")
    ).select("simhash", "c.combo_id", "c.combo_key")


def test_matches_quadratic_with_mass_duplicates(spark):
    # a corpus with heavy identical-signature clusters (the case the
    # skeleton exists for), near-pairs at every hamming 1..3, and
    # far-apart signatures that must NOT pair
    base = 0x0123_4567_89AB_CDEF
    sigs = (
        [(i, base) for i in range(6)]                      # cluster of 6
        + [(10, base ^ 0x1)]                               # hamming 1
        + [(11, base ^ 0x3)]                               # hamming 2
        + [(12, base ^ 0x7)]                               # hamming 3
        + [(13, base ^ 0xF)]                               # hamming 4: out
        + [(20, -42), (21, -42)]                           # negative cluster
        + [(30, 0x7FFF_FFFF_FFFF_FFFF)]                    # isolated
    )
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in exact_hamming_pairs(
            df, _manku64_tables, SIMHASH_BANDED_HAMMING_MAX
        ).collect()
    }
    want = set()
    for (ida, ha), (idb, hb) in combinations(sigs, 2):
        h = bin((ha ^ hb) & 0xFFFF_FFFF_FFFF_FFFF).count("1")
        if h <= SIMHASH_BANDED_HAMMING_MAX:
            want.add((min(ida, idb), max(ida, idb), h))
    assert got == want
    # sanity on the fixture itself: both paths and the seam are exercised
    assert {h for _, _, h in want} == {0, 1, 2, 3}
