"""Regression tests for the local oracle checker's dtype-drift gate.

Round-4 verdict wrong #1: the driver hash-failed ``ser_entity_labels``
because the DuckDB oracle returned a window-``sum`` column as HUGEINT while
Spark returned int64 — value-identical rows, different dtypes — and
``tools/check_oracles.py``'s ``str()`` canonicalization masked it locally.
These tests pin that an uncast ``sum()`` oracle is now caught before the
string compare (round-5 verdict item #4).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tools.check_oracles import dtype_kinds, normalize  # noqa: E402


def _duck(sql: str) -> pd.DataFrame:
    return duckdb.connect().execute(sql).fetchdf()


def test_uncast_window_sum_is_hugeint_drift():
    # the exact shape that burned round 4: sum(int) through a window
    odf = _duck(
        """
        SELECT k, sum(v) OVER (PARTITION BY k ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS seg
        FROM (VALUES (1, 1), (1, 2), (2, 3)) t(k, v)
        """
    )
    sdf = pd.DataFrame({"k": [1, 1, 2], "seg": [1, 3, 3]}).astype("int64")
    ka, kb = dtype_kinds(sdf), dtype_kinds(odf)
    assert ka["seg"] == "int"
    # HUGEINT fetches as float64 or object depending on duckdb version —
    # either way it must NOT canonicalize to 'int'
    assert kb["seg"] != "int", f"HUGEINT leaked as int kind: {odf.dtypes}"
    assert any(ka[c] != kb[c] for c in ka)
    # and the str() path alone would have (wrongly) passed it
    assert normalize(sdf).equals(normalize(odf))


def test_cast_sum_matches():
    odf = _duck(
        """
        SELECT k, (sum(v) OVER (PARTITION BY k ORDER BY v
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS seg
        FROM (VALUES (1, 1), (1, 2), (2, 3)) t(k, v)
        """
    )
    sdf = pd.DataFrame({"k": [1, 1, 2], "seg": [1, 3, 3]}).astype("int64")
    ka, kb = dtype_kinds(sdf), dtype_kinds(odf)
    assert all(ka[c] == kb[c] for c in ka)
    assert normalize(sdf).equals(normalize(odf))


def test_kind_canonicalization_is_width_insensitive():
    # int32 vs int64 is benign (values hash identically); only int-vs-float
    # and int-vs-object drifts fail
    a = pd.DataFrame({"x": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"x": pd.array([1, 2], dtype="int64")})
    assert dtype_kinds(a) == dtype_kinds(b) == {"x": "int"}
    c = pd.DataFrame({"x": [1.0, 2.0]})
    assert dtype_kinds(c) == {"x": "float"}


def test_registered_kie_oracle_is_cast():
    # the fixed SQL must cast every integer column in its final SELECT
    from mindocr_spark.operators.kie import SER_ENTITY_LABELS_SQL

    final = SER_ENTITY_LABELS_SQL.rsplit("FROM top", 1)[0]
    final = final.rsplit("SELECT", 1)[1]
    assert "segment_id::BIGINT" in final
    assert "fold_id::BIGINT" in final
