"""Directory-of-images -> OCR -> golden-format sink -> read back -> metrics.

The CLI workflow of the reference (predict_system -> system_results.txt ->
eval_det/eval_pipeline) reproduced end-to-end on Spark with rendered pages:
det f-score and e2e accuracy must be exactly 1.0.
"""

import json

import pytest
from pyspark.sql import functions as F

from mindocr_spark.functions.glyphs import render_page
from mindocr_spark.functions.png_codec import encode_png
from mindocr_spark.metrics import det_metric, e2e_eval
from mindocr_spark.sources.images import predict_image_dir


@pytest.fixture(scope="module")
def rendered_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    gts = {}
    pages = [
        [("invoice", 20, 20), ("total", 64, 20)],
        [("alpha", 30, 30)],
        [("north", 20, 20), ("south", 20, 240), ("east99", 64, 20)],
    ]
    for i, words in enumerate(pages):
        w = 32 * ((max(x for _, _, x in words) + 220) // 32 + 1)
        page, gt = render_page(words, 128, w)
        name = f"img_{i}.png"
        (d / name).write_bytes(encode_png(page))
        gts[name] = gt
    return str(d), gts


def test_det_and_e2e_metrics_perfect(spark, rendered_dir):
    img_dir, gts = rendered_dir
    recs = predict_image_dir(spark, img_dir).collect()
    by_img = {}
    for r in recs:
        name = r["media_ref"].rsplit("/", 1)[-1]
        by_img.setdefault(name, []).append(
            {"transcription": r["transcription"], "points": json.loads(r["points"])}
        )
    assert set(by_img) == set(gts)

    import pandas as pd

    det_rows = []
    e2e_rows = []
    for name, gt in gts.items():
        preds = by_img[name]
        det_rows.append(
            {
                "img": name,
                "pred_polys": json.dumps([p["points"] for p in preds]),
                "gt_polys": json.dumps([g["points"] for g in gt]),
                "gt_ignore": json.dumps([False] * len(gt)),
            }
        )
        e2e_rows.append(
            {
                "img": name,
                "pred_json": json.dumps(preds),
                "gt_json": json.dumps(gt),
            }
        )
    det = det_metric(spark.createDataFrame(pd.DataFrame(det_rows))).collect()[0]
    assert det["f_score"] == pytest.approx(1.0)
    e2e = e2e_eval(spark.createDataFrame(pd.DataFrame(e2e_rows))).collect()[0]
    assert e2e["acc"] == pytest.approx(1.0)
    assert e2e["total_num"] == 6


def test_system_results_sink_roundtrip(spark, rendered_dir, tmp_path):
    from mindocr_spark.sources.golden import read_det_gt, write_system_results

    img_dir, _ = rendered_dir
    recs = predict_image_dir(spark, img_dir)
    anns = (
        recs.withColumn("points_arr", F.from_json("points", "array<array<int>>"))
        .groupBy("media_ref")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("transcription").alias("transcription"),
                    F.col("points_arr").alias("points"),
                )
            ).alias("anns")
        )
        .select(F.col("media_ref").alias("img"), "anns")
    )
    out = str(tmp_path / "system_results")
    write_system_results(anns, out)
    back = read_det_gt(spark, out)
    assert back.count() == 3
    row = back.filter(F.col("img") == "img_1.png").collect()[0]
    assert row["anns"][0]["transcription"] == "alpha"
