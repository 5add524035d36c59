"""Reference-metric operators (round 6): TableStructureMetric and the
COCO-style layout mAP — exact-behavior pins against pure-Python
reimplementations of the reference classes
(mindocr/metrics/table_metrics.py:6-57, layout_metrics.py:7-30)."""

import numpy as np
import pandas as pd
import pytest

from mindocr_spark.operators import refmetrics as R

SF = "/root/testdata/sf0.001"


# --- reference reimplementations (oracles for the pytest pins) ---------------


def ref_structure_acc(pairs, del_thead_tbody=False):
    """TableStructureMetric.update/eval verbatim (token lists pre-joined;
    eps dropped — the operator reports integer bp, acc = correct/all)."""
    correct = 0
    for pred_str, target_str in pairs:
        if del_thead_tbody:
            for tok in ("<thead>", "</thead>", "<tbody>", "</tbody>"):
                pred_str = pred_str.replace(tok, "")
                target_str = target_str.replace(tok, "")
        if pred_str == target_str:
            correct += 1
    return correct


def ref_coco_ap(gts, preds, n_gt, t):
    """COCOeval-style AP at one IoU threshold over (img, cls)-keyed boxes
    with unique scores: greedy by score, 101-pt interpolated precision.
    gts: {(img, cls, gid): box}; preds: list of (score, pid, img, cls, box).
    """
    order = sorted(preds, key=lambda p: (-p[0], p[1]))
    matched = set()
    flags = []
    for score, pid, img, cls, box in order:
        best, best_iou = None, 0.0
        for (gimg, gcls, gid), gbox in gts.items():
            if gimg != img or gcls != cls or (gimg, gcls, gid) in matched:
                continue
            ix = min(box[2], gbox[2]) - max(box[0], gbox[0])
            iy = min(box[3], gbox[3]) - max(box[1], gbox[1])
            if ix <= 0 or iy <= 0:
                continue
            inter = ix * iy
            uni = (
                (box[2] - box[0]) * (box[3] - box[1])
                + (gbox[2] - gbox[0]) * (gbox[3] - gbox[1])
                - inter
            )
            iou = inter / uni
            if 100 * inter >= t * uni and iou > best_iou:
                best, best_iou = (gimg, gcls, gid), iou
        if best is not None:
            matched.add(best)
            flags.append(1)
        else:
            flags.append(0)
    cumtp = np.cumsum(flags)
    k = np.arange(1, len(flags) + 1)
    prec_bp = (10000 * cumtp) // k
    env = np.maximum.accumulate(prec_bp[::-1])[::-1]
    total = 0
    for r in range(101):
        idx = np.nonzero(100 * cumtp >= r * n_gt)[0]
        if len(idx):
            total += env[idx[0]]
    return total // 101


# --- TableStructureMetric ----------------------------------------------------


def test_structure_acc_matches_reference(spark):
    cases = [
        ("<thead><tr><td></td></tr></thead>", "<thead><tr><td></td></tr></thead>"),
        ("<tr><td></td></tr>", "<thead><tr><td></td></tr></thead>"),  # del-only
        ("<tr><td></td><td></td></tr>", "<tr><td></td></tr>"),  # real error
        ("<tbody><tr><td></td></tr></tbody>", "<tbody><tr><td></td></tr></tbody>"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(cases, columns=["pred_str", "gt_str"])
    )
    row = R.structure_acc(df).collect()[0]
    assert row.n_tables == 4
    assert row.correct == ref_structure_acc(cases) == 2
    assert row.correct_del == ref_structure_acc(cases, True) == 3
    assert row.acc_bp == 5000 and row.acc_del_bp == 7500


def test_table_structure_acc_populations(spark):
    # the surrogate's three populations tile the corpus: structural errors
    # (%7), wrapper-only errors (%5 minus the %7 overlap), clean rest
    row = R.table_structure_acc(spark, SF).collect()[0]
    n = row.n_tables
    n_struct = len([d for d in range(n) if d % 7 == 0])
    n_wrap = len([d for d in range(n) if d % 7 and d % 5 == 0])
    assert n == 500
    assert row.correct == n - n_struct - n_wrap
    # del_thead_tbody forgives exactly the wrapper-only population
    assert row.correct_del == n - n_struct
    assert row.acc_bp == (10000 * row.correct) // n


def test_grid_tokens_agree_with_oracle_formula():
    from mindocr_spark.functions.table_master import grid_structure_tokens

    for r in range(2, 6):
        for c in range(2, 5):
            want = (
                "<thead><tr>" + "<td></td>" * c + "</tr></thead><tbody>"
                + ("<tr>" + "<td></td>" * c + "</tr>") * (r - 1)
                + "</tbody>"
            )
            assert "".join(grid_structure_tokens(r, c)) == want


# --- layout mAP --------------------------------------------------------------


def _mk(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


GT_COLS = ["img_id", "class_id", "gt_id", "x1", "y1", "x2", "y2"]
PRED_COLS = ["img_id", "class_id", "pred_id", "score_milli", "x1", "y1", "x2", "y2"]


def test_coco_map_perfect_predictions(spark):
    gts = _mk(
        spark,
        [(0, 0, 0, 0, 0, 100, 100), (0, 1, 0, 200, 0, 300, 100),
         (1, 0, 0, 0, 0, 100, 100)],
        GT_COLS,
    )
    preds = _mk(
        spark,
        [(0, 0, 1, 900, 0, 0, 100, 100), (0, 1, 2, 500, 200, 0, 300, 100),
         (1, 0, 3, 100, 0, 0, 100, 100)],
        PRED_COLS,
    )
    out = {r.class_id: r for r in R.coco_map_bp(gts, preds).collect()}
    for cls in (0, 1, -1):
        assert out[cls].ap50_bp == 10000 and out[cls].ap_bp == 10000


def test_coco_map_hand_case_matches_reference(spark):
    # one class, one image: 2 gts, 3 preds — a perfect hit (score 800),
    # a jittered hit IoU~0.68 (score 600), a far FP (score 900, ranked
    # first — drags precision), checked at every COCO threshold
    gts_d = {(0, 0, 0): (0, 0, 100, 100), (0, 0, 1): (300, 0, 400, 100)}
    preds_l = [
        (800, 1, 0, 0, (0, 0, 100, 100)),
        (600, 2, 0, 0, (320, 0, 420, 100)),
        (900, 3, 0, 0, (9000, 0, 9100, 100)),
    ]
    gts = _mk(spark, [(i, c, g, *b) for (i, c, g), b in gts_d.items()], GT_COLS)
    preds = _mk(spark, [(i, c, p, s, *b) for s, p, i, c, b in preds_l], PRED_COLS)
    out = {r.class_id: r for r in R.coco_map_bp(gts, preds).collect()}
    want = [ref_coco_ap(gts_d, preds_l, 2, t) for t in R.COCO_THRESHOLDS]
    assert out[0].ap50_bp == want[0]
    assert out[0].ap_bp == sum(want) // 10
    assert out[-1].ap_bp == out[0].ap_bp  # single class


def test_coco_map_greedy_score_contest(spark):
    # two preds on one gt: the HIGHER-score pred takes it (COCO greedy),
    # even though the lower-score one has higher IoU
    gts_d = {(0, 0, 0): (0, 0, 100, 100)}
    preds_l = [
        (900, 1, 0, 0, (20, 0, 120, 100)),  # IoU 2/3, higher score -> TP
        (500, 2, 0, 0, (0, 0, 100, 100)),  # IoU 1.0, loses the gt -> FP
    ]
    gts = _mk(spark, [(i, c, g, *b) for (i, c, g), b in gts_d.items()], GT_COLS)
    preds = _mk(spark, [(i, c, p, s, *b) for s, p, i, c, b in preds_l], PRED_COLS)
    out = {r.class_id: r for r in R.coco_map_bp(gts, preds).collect()}
    want = [ref_coco_ap(gts_d, preds_l, 1, t) for t in R.COCO_THRESHOLDS]
    assert out[0].ap50_bp == want[0] == 10000  # TP at rank 1 covers r<=100
    assert out[0].ap_bp == sum(want) // 10


def test_layout_map_surrogate_single_overlap_invariant(spark):
    # the documented exact-greedy precondition: every surrogate pred
    # overlaps at most one same-class gt on its image
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = R.layout_map(spark, SF)
    rows = {r.class_id: r for r in out.collect()}
    n_docs = docs.count()
    # every class present + overall row, gt/pred counts add up
    assert set(rows) == {-1, 0, 1, 2}
    total_gt = sum(1 + d % 3 for d in range(n_docs))
    total_pred = total_gt + len([d for d in range(n_docs) if d % 6 == 0]) + len(
        [d for d in range(n_docs) if d % 4 == 0]
    )
    assert rows[-1].n_gt == total_gt and rows[-1].n_pred == total_pred
    # jitter keeps IoU >= 0.5 for every main pred: AP50 is dragged below
    # 10000 only by the far FPs and doubled detections, and higher
    # thresholds lose real matches
    for cls in (0, 1, 2):
        assert 0 < rows[cls].ap_bp < rows[cls].ap50_bp <= 10000


def test_layout_map_matches_reference_greedy(spark):
    # the full surrogate at sf0.001 against the pure-Python COCO greedy
    # (class 0 only, AP@{50,75} — the reference path, not the SQL one)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    gts_d, preds_l = {}, []
    for d in range(n_docs):
        y1 = (d % 5) * 100
        for g in range(1 + d % 3):
            cls = (d + g) % 3
            gts_d[(d, cls, g)] = (g * 200, y1, g * 200 + 150, y1 + 80)
            dx = (d * 7 + g * 13) % 41 - 20
            dy = (d * 11 + g * 5) % 21 - 10
            preds_l.append(
                (
                    (d * 31 + g * 17) % 1000, d * 10 + g * 3, d, cls,
                    (g * 200 + dx, y1 + dy, g * 200 + dx + 150, y1 + dy + 80),
                )
            )
        if d % 6 == 0:
            preds_l.append(
                ((d * 19 + 7) % 1000, d * 10 + 1, d, d % 3, (18, y1, 168, y1 + 80))
            )
        if d % 4 == 0:
            x1 = 5000 + (d % 3) * 200
            preds_l.append(
                ((d * 13) % 1000, d * 10 + 2, d, d % 3, (x1, y1, x1 + 150, y1 + 80))
            )
    out = {r.class_id: r for r in R.layout_map(spark, SF).collect()}
    cls0_gts = {k: v for k, v in gts_d.items() if k[1] == 0}
    cls0_preds = [p for p in preds_l if p[3] == 0]
    n_gt0 = len(cls0_gts)
    assert out[0].n_gt == n_gt0 and out[0].n_pred == len(cls0_preds)
    assert out[0].ap50_bp == ref_coco_ap(cls0_gts, cls0_preds, n_gt0, 50)
