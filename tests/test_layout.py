"""sorted_layout_boxes column-classification semantics
(recovery_to_doc.py:90-153)."""

from mindocr_spark.functions.layout import sorted_layout_boxes

W = 900  # thirds at 300/600, tolerance 18


def _r(x0, y0, x1, y1):
    return {"bbox": [x0, y0, x1, y1]}


def test_single_box():
    out = sorted_layout_boxes([_r(10, 10, 200, 40)], W)
    assert out[0]["layout"] == "single"


def test_spanning_box_first():
    regions = [_r(10, 100, 250, 130), _r(20, 10, 700, 40)]
    out = sorted_layout_boxes(regions, W)
    assert out[0]["layout"] == "spanning"
    assert out[0]["bbox"][1] == 10


def test_double_column():
    regions = [_r(10, 10, 250, 40), _r(650, 12, 880, 42)]
    out = sorted_layout_boxes(regions, W)
    layouts = {tuple(r["bbox"]): r["layout"] for r in out}
    assert layouts[(10, 10, 250, 40)] == "double"
    assert layouts[(650, 12, 880, 42)] == "double"


def test_triple_column():
    regions = [
        _r(10, 10, 250, 40),
        _r(320, 10, 560, 40),
        _r(650, 10, 880, 40),
    ]
    out = sorted_layout_boxes(regions, W)
    assert all(r["layout"] == "triple" for r in out)
    # emission order: left column, then center, then right
    assert [r["bbox"][0] for r in out] == [10, 320, 650]


def test_single_column_many():
    regions = [_r(10, 100, 250, 130), _r(12, 10, 240, 40)]
    out = sorted_layout_boxes(regions, W)
    assert all(r["layout"] == "single" for r in out)
    assert [r["bbox"][1] for r in out] == [10, 100]  # top-to-bottom


def test_recover_page_text_order():
    from mindocr_spark.functions.layout import recover_page_text

    regions = [
        {"bbox": [10, 100, 250, 130], "text": "left column lower"},
        {"bbox": [20, 10, 700, 40], "text": "spanning title"},
        {"bbox": [650, 95, 880, 125], "text": "right column"},
        {"bbox": [12, 60, 240, 90], "text": "left column upper"},
        {"bbox": [660, 200, 870, 230], "text": ""},
    ]
    out = recover_page_text(regions, W)
    assert out.splitlines() == [
        "spanning title",
        "left column upper",
        "left column lower",
        "right column",
    ]
