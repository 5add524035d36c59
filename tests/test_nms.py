"""LANMS parity vs the reference's own unit constants and JSON fixtures
(tests/ut/test_lanms_py.py / tests/ut/lanms_test_jsons)."""

import json
import os

import numpy as np
import pytest

from mindocr_spark.functions.nms import (
    box_iou,
    locality_aware_nms,
    standard_nms,
    weighted_merge,
)

BOX1 = np.array([0, 0, 0, 20, 10, 20, 10, 0, 0.8], dtype=float)
BOX2 = np.array([8, 10, 8, 50, 30, 50, 30, 10, 0.7], dtype=float)
BOX3 = np.array([9, 10, 9, 60, 30, 60, 30, 10, 1.1], dtype=float)

FIXTURE_DIR = "/root/reference/tests/ut/lanms_test_jsons"


def test_iou_reference_constant():
    assert round(box_iou(BOX1, BOX2), 3) == 0.019


def test_weighted_merge_reference_constant():
    expect = np.array([3.733, 4.667, 3.733, 34, 19.333, 34, 19.333, 4.666, 1.5])
    assert np.allclose(weighted_merge(BOX1, BOX2), expect, rtol=1e-2)


def test_standard_nms_reference_constant():
    out = standard_nms([BOX2, BOX3], 0.5)
    assert np.allclose(out, BOX3.reshape(1, 9), rtol=1e-5)


def test_lanms_reference_constant():
    expect = np.array(
        [
            [8.611, 10, 8.611, 56.11, 30, 56.11, 30, 10, 1.8],
            [0, 0, 0, 20, 10, 20, 10, 0, 0.8],
        ]
    )
    assert np.allclose(locality_aware_nms([BOX1, BOX2, BOX3]), expect, rtol=1e-2)


@pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures unavailable"
)
def test_lanms_reference_fixtures():
    for fname in sorted(os.listdir(FIXTURE_DIR)):
        with open(os.path.join(FIXTURE_DIR, fname)) as f:
            data = json.loads(f.readline())
        got = sorted(
            locality_aware_nms(np.array(data["origin_boxes"])).tolist(),
            key=lambda x: x[0],
        )
        want = sorted(np.array(data["processed_boxes"]).tolist(), key=lambda x: x[0])
        assert len(got) == len(want), fname
        assert np.allclose(np.array(got), np.array(want), rtol=1e-3, atol=1e-2), fname


def test_empty():
    assert locality_aware_nms([]).shape == (0, 9)
