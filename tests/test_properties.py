"""Property-based tests (hypothesis) over the kernel library — a layer the
reference lacks (SURVEY.md §5: no randomized testing there)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mindocr_spark.config import BLANK_IDX, CHARSET, NUM_CLASSES
from mindocr_spark.functions.ctc import ctc_greedy_decode
from mindocr_spark.functions.geometry import (
    convex_hull,
    min_area_rect,
    offset_convex_poly,
    poly_area_perimeter,
    poly_iou,
)
from mindocr_spark.functions.html_text import extract_main_text
from mindocr_spark.functions.imaging import connected_components
from mindocr_spark.functions.png_codec import decode_png, encode_png

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=200),
    ),
    min_size=3,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(points_strategy)
def test_min_area_rect_contains_all_points(pts):
    arr = np.array(pts, dtype=np.float64)
    rect, short, long_ = min_area_rect(arr)
    hull = convex_hull(arr)
    if len(hull) < 3:
        return
    area_r, _ = poly_area_perimeter(rect)
    area_h, _ = poly_area_perimeter(hull)
    assert area_r >= area_h - 1e-6  # enclosing
    assert short <= long_ + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=2, max_value=30),
    st.integers(min_value=2, max_value=30),
    st.floats(min_value=0.1, max_value=5.0),
)
def test_offset_outward_grows_area(w, h, d):
    rect = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=float)
    grown = offset_convex_poly(rect, d)
    a0, _ = poly_area_perimeter(rect)
    a1, _ = poly_area_perimeter(grown)
    assert a1 > a0
    # exact (up to float ulp) for rectangles
    assert abs(a1 - (w + 2 * d) * (h + 2 * d)) < 1e-9 * max(a1, 1.0)


@settings(max_examples=40, deadline=None)
@given(points_strategy, points_strategy)
def test_iou_symmetric_bounded(p1, p2):
    h1 = convex_hull(np.array(p1, dtype=float))
    h2 = convex_hull(np.array(p2, dtype=float))
    if len(h1) < 3 or len(h2) < 3:
        return
    i12 = poly_iou(h1, h2)
    i21 = poly_iou(h2, h1)
    assert abs(i12 - i21) < 1e-9
    assert 0.0 <= i12 <= 1.0 + 1e-9


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=NUM_CLASSES - 1), max_size=30)
)
def test_ctc_decode_never_longer_than_input(ids):
    logits = np.zeros((len(ids), NUM_CLASSES), dtype=np.float32)
    for t, i in enumerate(ids):
        logits[t, i] = 1.0
    text, conf = ctc_greedy_decode(logits)
    assert len(text) <= len(ids)
    assert all(c in CHARSET for c in text)
    assert 0.0 <= conf <= 1.0
    # decoding a decode-clean sequence is stable: re-encoding char runs with
    # blanks between yields the same text
    if text:
        ids2 = []
        for ch in text:
            ids2 += [CHARSET.index(ch), BLANK_IDX]
        logits2 = np.zeros((len(ids2), NUM_CLASSES), dtype=np.float32)
        for t, i in enumerate(ids2):
            logits2[t, i] = 1.0
        assert ctc_greedy_decode(logits2)[0] == text


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_random(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_components_partition_mask(seed):
    rng = np.random.RandomState(seed)
    mask = rng.rand(20, 20) > 0.7
    comps = connected_components(mask)
    total = sum(len(c) for c in comps)
    assert total == int(mask.sum())
    seen = set()
    for c in comps:
        for y, x in c:
            assert mask[y, x]
            assert (y, x) not in seen
            seen.add((y, x))


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300))
def test_extract_main_text_total(raw):
    out = extract_main_text(raw)
    assert isinstance(out, str)
    assert "  " not in out
    assert out == out.strip()
