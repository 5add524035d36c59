"""Table cell <- OCR box assignment (matcher.py:84-138 rule cascade)."""

import numpy as np

from mindocr_spark.functions.table_match import cells_to_text, match_boxes_to_cells

# 2x2 table of 100x50 cells
CELLS = np.array(
    [
        [0, 0, 100, 50],
        [100, 0, 200, 50],
        [0, 50, 100, 100],
        [100, 50, 200, 100],
    ],
    dtype=float,
)


def test_center_inside():
    boxes = np.array([[10, 10, 60, 30], [120, 60, 180, 90]], dtype=float)
    got = match_boxes_to_cells(boxes, CELLS)
    assert got == [(0, "center"), (3, "center")]


def test_iou_fallback_for_straddling_box():
    # center exactly on the cell border at x=100 -> inside both cells 0/1
    # per <= comparisons; tie broken by IoU (more area in cell 1)
    boxes = np.array([[80, 10, 120, 30]], dtype=float)
    (cell, rule) = match_boxes_to_cells(boxes, CELLS)[0]
    assert cell in (0, 1) and rule == "center"
    # a box crossing the border with center clearly in cell 1
    boxes2 = np.array([[95, 10, 160, 30]], dtype=float)
    assert match_boxes_to_cells(boxes2, CELLS)[0] == (1, "center")


def test_distance_fallback_outside_table():
    boxes = np.array([[300, 200, 340, 220]], dtype=float)
    (cell, rule) = match_boxes_to_cells(boxes, CELLS)[0]
    assert cell == 3 and rule == "distance"


def test_no_cells():
    assert match_boxes_to_cells(np.zeros((2, 4)), np.zeros((0, 4))) == [
        (-1, "none"),
        (-1, "none"),
    ]


def test_cells_to_text_reading_order():
    boxes = np.array(
        [[60, 10, 90, 30], [10, 10, 50, 30], [120, 60, 180, 90]], dtype=float
    )
    texts = ["world", "hello", "total"]
    assignments = match_boxes_to_cells(boxes, CELLS)
    out = cells_to_text(texts, assignments, len(CELLS), boxes)
    assert out == ["hello world", "", "", "total"]
