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


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_mat5_roundtrip_random(seed):
    """savemat/loadmat (pure-numpy MAT-5 subset) roundtrip: cell arrays of
    strings, char rows, and double tensors survive bit-exactly."""
    from mindocr_spark.functions.mat5 import loadmat, savemat

    rng = np.random.RandomState(seed)
    n = rng.randint(1, 4)
    names = np.empty((1, n), dtype=object)
    bbs = np.empty((1, n), dtype=object)
    txts = np.empty((1, n), dtype=object)
    for i in range(n):
        names[0, i] = [f"dir{rng.randint(9)}/img_{rng.randint(999)}.jpg"]
        m = rng.randint(1, 5)
        bbs[0, i] = rng.rand(2, 4, m) * 100
        txts[0, i] = [
            " ".join(
                "".join(rng.choice(list("abcxyz"), rng.randint(1, 6)))
                for _ in range(rng.randint(1, 4))
            )
            for _ in range(rng.randint(1, 3))
        ]
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".mat") as f:
        savemat(f.name, {"imnames": names, "wordBB": bbs, "txt": txts},
                compress=bool(seed % 2))
        m5 = loadmat(f.name)
    for i in range(n):
        assert m5["imnames"][0, i] == names[0, i]
        assert np.array_equal(m5["wordBB"][0, i], bbs[0, i])
        # char matrices right-pad rows to equal width
        w = max(len(s) for s in txts[0, i])
        assert m5["txt"][0, i] == [s.ljust(w) for s in txts[0, i]]


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_approx_poly_dp_output_subset_within_eps(seed):
    """DP simplification only keeps input vertices, always keeps >= 2, and
    every dropped point lies within eps of the simplified chain (checked on
    an open chain where the DP guarantee is exact)."""
    from mindocr_spark.functions.geometry import approx_poly_dp

    rng = np.random.RandomState(seed)
    pts = np.cumsum(rng.randn(rng.randint(5, 40), 2), axis=0)
    eps = float(rng.rand() * 2)
    out = approx_poly_dp(pts, eps, closed=False)
    in_set = {tuple(p) for p in pts.tolist()}
    assert all(tuple(p) in in_set for p in out.tolist())
    assert len(out) >= 2
    # max deviation bound for the open-chain variant
    kept_idx = [int(np.nonzero((pts == p).all(axis=1))[0][0]) for p in out]
    for a_i, b_i in zip(kept_idx, kept_idx[1:]):
        a, b = pts[a_i], pts[b_i]
        ab = b - a
        ln = np.linalg.norm(ab)
        seg = pts[a_i + 1 : b_i]
        if len(seg) == 0:
            continue
        if ln < 1e-12:
            d = np.linalg.norm(seg - a, axis=1)
        else:
            d = np.abs((seg[:, 0] - a[0]) * ab[1] - (seg[:, 1] - a[1]) * ab[0]) / ln
        assert (d <= eps + 1e-9).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_img_rotate_360_identity(seed):
    from mindocr_spark.functions.imaging import img_rotate

    rng = np.random.RandomState(seed)
    img = rng.rand(17, 23).astype(np.float32) * 255
    out = img_rotate(img, 360.0)
    assert np.allclose(out, img, atol=1e-2)
