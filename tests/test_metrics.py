"""Metric goldens: the reference's exact unit-test constants
(tests/ut/test_metrics.py:31-80 — det 0.5/0.5/0.5; rec acc=0.5,
norm_edit_distance~0.92857)."""

import json

import pytest

from mindocr_spark.metrics import (
    cls_metric,
    det_metric,
    match_image_labels,
    quad_is_valid,
    rec_metric,
)

PRED_POLYS = [
    [[0, 0], [0, 10], [10, 10], [10, 0]],
    [[10, 10], [10, 20], [20, 20], [20, 10]],
    [[20, 20], [20, 30], [30, 30], [30, 20]],
]
GT_POLYS = [
    [[0, 0], [0, 9], [9, 9], [9, 0]],
    [[10, 10], [-10, -20], [-20, -20], [-20, -10]],  # valid but unmatched
    [[20, 20], [20, 30], [30, 30], [30, 20]],
]
BOWTIE = [[0, 0], [10, 10], [10, 0], [0, 10]]  # self-crossing -> invalid
GT_IGNORE = [False, False, True]


def test_quad_validity():
    import numpy as np

    assert quad_is_valid(np.array(PRED_POLYS[0], dtype=float))
    # the reference fixture's odd-shaped gt is simple, hence shapely-valid
    assert quad_is_valid(np.array(GT_POLYS[1], dtype=float))
    assert not quad_is_valid(np.array(BOWTIE, dtype=float))


def test_match_image_labels_reference_constants():
    import numpy as np

    tp, fp, fn = match_image_labels(
        [np.array(p, dtype=float) for p in PRED_POLYS],
        [np.array(p, dtype=float) for p in GT_POLYS],
        GT_IGNORE,
    )
    # pred#1 matches gt#1 (IoU 0.81); gt#2 valid but unmatched (fn);
    # pred#2 matches nothing (fp); pred#3 absorbed by the ignored gt#3
    assert (tp, fp, fn) == (1, 1, 1)


def test_det_metric_spark(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "img": ["img1"],
                "pred_polys": [json.dumps(PRED_POLYS)],
                "gt_polys": [json.dumps(GT_POLYS)],
                "gt_ignore": [json.dumps(GT_IGNORE)],
            }
        )
    )
    # the reference's exact golden: recall == precision == f-score == 0.5
    row = det_metric(df).collect()[0]
    assert row["recall"] == pytest.approx(0.5)
    assert row["precision"] == pytest.approx(0.5)
    assert row["f_score"] == pytest.approx(0.5)


def test_det_metric_two_images(spark):
    """Same result with the gts split differently (agg across images)."""
    import pandas as pd

    gt = [
        [[0, 0], [0, 9], [9, 9], [9, 0]],
        [[100, 100], [100, 110], [110, 110], [110, 100]],  # valid, unmatched
        [[20, 20], [20, 30], [30, 30], [30, 20]],
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "img": ["img1"],
                "pred_polys": [json.dumps(PRED_POLYS)],
                "gt_polys": [json.dumps(gt)],
                "gt_ignore": [json.dumps(GT_IGNORE)],
            }
        )
    )
    row = det_metric(df).collect()[0]
    assert row["recall"] == pytest.approx(0.5)
    assert row["precision"] == pytest.approx(0.5)
    assert row["f_score"] == pytest.approx(0.5)


def test_rec_metric_reference_constants(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"pred": ["baxlala", "ba"], "gt": ["ba la la!    ", "ba       "]}
        )
    )
    row = rec_metric(df).collect()[0]
    assert row["acc"] == pytest.approx(0.5)
    assert row["norm_edit_distance"] == pytest.approx(0.92857, abs=1e-4)


def test_cls_metric(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"pred": ["0", "180", "0", "0"], "gt": ["0", "180", "180", "0"]})
    )
    row = cls_metric(df).collect()[0]
    assert row["acc"] == pytest.approx(0.75)


def test_golden_roundtrip(spark, tmp_path):
    from mindocr_spark.sources.golden import (
        format_system_results,
        read_det_gt,
        read_rec_gt,
    )

    det_line = (
        'img_61.jpg\t[{"transcription": "###", "points": [[427, 293], [469, 293], '
        '[468, 315], [425, 314]]}, {"transcription": "hello", "points": '
        '[[0, 0], [10, 0], [10, 10], [0, 10]]}]'
    )
    p = tmp_path / "det_gt.txt"
    p.write_text(det_line + "\n")
    df = read_det_gt(spark, str(p))
    rows = df.collect()
    assert rows[0]["img"] == "img_61.jpg"
    anns = rows[0]["anns"]
    assert anns[0]["ignore"] is True and anns[1]["ignore"] is False
    assert anns[1]["transcription"] == "hello"

    p2 = tmp_path / "rec_gt.txt"
    p2.write_text("word_1.png\tGenaxis Theatre\nword_2.png\t[06]\n")
    df2 = read_rec_gt(spark, str(p2))
    assert df2.count() == 2
    assert df2.orderBy("img").collect()[0]["label"] == "Genaxis Theatre"

    out = format_system_results(df.select("img", "anns")).collect()
    assert out[0]["value"].startswith("img_61.jpg\t[")


def test_e2e_eval_roundtrip_on_rendered_page(spark):
    """End-to-end eval: OCR records vs the renderer's ground truth -> 100%."""
    import json as _json

    import pandas as pd

    from mindocr_spark.functions.glyphs import render_page
    from mindocr_spark.kernels.system import ocr_image
    from mindocr_spark.metrics import e2e_eval

    page, gt = render_page([("hello", 20, 20), ("world", 64, 20)], 128, 256)
    preds = [
        {"transcription": r["transcription"], "points": r["points"]}
        for r in ocr_image(page)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "img": ["p1"],
                "pred_json": [_json.dumps(preds)],
                "gt_json": [_json.dumps(gt)],
            }
        )
    )
    row = e2e_eval(df).collect()[0]
    assert row["total_num"] == 2
    assert row["correct_num"] == 2
    assert row["acc"] == 1.0


def test_e2e_eval_ignores_and_mismatch(spark):
    import json as _json

    import pandas as pd

    from mindocr_spark.metrics import e2e_eval

    sq = [[0, 0], [10, 0], [10, 10], [0, 10]]
    gt = [
        {"transcription": "###", "points": sq},  # ignored
        {"transcription": "abc", "points": sq},
    ]
    preds = [{"transcription": "abx", "points": sq}]  # text mismatch
    df = spark.createDataFrame(
        pd.DataFrame(
            {"img": ["i"], "pred_json": [_json.dumps(preds)], "gt_json": [_json.dumps(gt)]}
        )
    )
    row = e2e_eval(df).collect()[0]
    assert (row["correct_num"], row["total_num"]) == (0, 1)
