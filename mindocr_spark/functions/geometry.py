"""Pure-numpy polygon geometry (hull, min-area rect, offset, IoU).

Replaces the reference's cv2/shapely/pyclipper geometry:

- ``min_area_rect`` ~ ``cv2.minAreaRect`` + ``cv2.boxPoints``
  (``mindocr/postprocess/det_db_postprocess.py:142-174``).
- ``order_points_clockwise`` ~ ``tools/infer/text/predict_det.py:151-161``.
- ``offset_convex_poly`` ~ pyclipper unclip ``expand_poly``
  (``mindocr/data/transforms/det_transforms.py:553-556``), exact for convex
  polygons (our rects always are).
- ``poly_iou`` ~ shapely intersection/union used by DetMetric
  (``mindocr/metrics/det_metrics.py:14-19``) via Sutherland–Hodgman clipping.
- ``rescale_polys`` ~ ``det_base_postprocess.py:110-125``.
"""

from __future__ import annotations

import numpy as np


def row_extremes_xy(pts_yx: np.ndarray) -> np.ndarray:
    """Reduce a dense (y,x) pixel set to per-row x-extremes, returned as
    (x,y) points. The convex hull of a row-run set only uses each row's min
    and max x, so min_area_rect over components drops from O(pixels) to
    O(rows) without changing the result."""
    ys = pts_yx[:, 0]
    xs = pts_yx[:, 1]
    order = np.lexsort((xs, ys))
    ys_s = ys[order]
    xs_s = xs[order]
    _, first = np.unique(ys_s, return_index=True)
    last = np.concatenate([first[1:] - 1, [len(ys_s) - 1]])
    sel = np.unique(np.concatenate([first, last]))
    return np.stack([xs_s[sel], ys_s[sel]], axis=1).astype(np.float64)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points (N,2) -> hull (M,2) counter-clockwise
    in image coords (y down), no duplicate endpoint.

    The chain runs on python float tuples: numpy-scalar arithmetic inside
    the pop-loop costs ~10x the same math on floats, and np.unique(axis=0)
    costs more than the dedup it does — sorted(set(...)) gives the same
    lexicographic (x, y) order."""
    pts = sorted({(float(x), float(y)) for x, y in np.asarray(points, dtype=np.float64)})
    if len(pts) <= 2:
        return np.array(pts, dtype=np.float64)

    def half(seq: list[tuple[float, float]]) -> list[tuple[float, float]]:
        out: list[tuple[float, float]] = []
        for px, py in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Minimum-area enclosing rectangle via rotating calipers.

    Returns (corners (4,2) float64, short_side, long_side). Corners are in
    clockwise order starting top-left (see ``order_points_clockwise``).

    Fast path: when all four bounding-box corners are themselves in the
    point set (the shape of per-row extremes of an axis-aligned filled
    region), the bbox is provably the minimum rectangle — the minimal
    enclosing rectangle of a rectangle's corners is that rectangle — so the
    hull/calipers can be skipped.
    """
    pts0 = np.asarray(points, dtype=np.float64)
    if len(pts0) >= 4:
        xs = pts0[:, 0]
        ys = pts0[:, 1]
        x0 = xs.min()
        x1 = xs.max()
        y0 = ys.min()
        y1 = ys.max()
        if x1 > x0 and y1 > y0:
            on_x0 = xs == x0
            on_x1 = xs == x1
            corners_present = (
                np.any(on_x0 & (ys == y0))
                and np.any(on_x1 & (ys == y0))
                and np.any(on_x1 & (ys == y1))
                and np.any(on_x0 & (ys == y1))
            )
            if corners_present and np.all(on_x0 | on_x1 | (ys == y0) | (ys == y1)):
                rect = np.array(
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
                )
                w = float(x1 - x0)
                h = float(y1 - y0)
                return rect, float(min(w, h)), float(max(w, h))
    hull = convex_hull(points)
    if len(hull) == 1:
        c = np.tile(hull[0], (4, 1))
        return c, 0.0, 0.0
    if len(hull) == 2:
        a, b = hull
        corners = np.array([a, b, b, a], dtype=np.float64)
        side = float(np.linalg.norm(b - a))
        return order_points_clockwise(corners), 0.0, side
    edges = np.roll(hull, -1, axis=0) - hull
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    # all candidate angles in one shot: px/py = hull projected onto every
    # rotated frame (A, N) — replaces a python loop of tiny matmuls
    ca, sa = np.cos(angles), np.sin(angles)
    px = np.outer(ca, hull[:, 0]) + np.outer(sa, hull[:, 1])
    py = -np.outer(sa, hull[:, 0]) + np.outer(ca, hull[:, 1])
    mnx, mxx = px.min(axis=1), px.max(axis=1)
    mny, mxy = py.min(axis=1), py.max(axis=1)
    areas = (mxx - mnx) * (mxy - mny)
    # exact replica of the original running-best update (strictly-better by
    # 1e-9), now over precomputed scalars instead of per-angle matmuls
    area_list = areas.tolist()
    k = 0
    best_area = area_list[0]
    for i in range(1, len(area_list)):
        if area_list[i] < best_area - 1e-9:
            k, best_area = i, area_list[i]
    ang = float(angles[k])
    mn = np.array([mnx[k], mny[k]])
    mx = np.array([mxx[k], mxy[k]])
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, s], [-s, c]])
    rect = np.array(
        [[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]]]
    )
    corners = rect @ rot  # inverse rotation (rot is orthonormal)
    # Canonicalize while PRESERVING the cyclic order: the sum/diff corner
    # heuristic (order_points_clockwise) can pick duplicate roles on
    # near-45-degree rects and emit a crossed quad. Enforce clockwise
    # orientation (y-down) and start at the lexicographically smallest
    # (y, x) corner — equals the tl,tr,br,bl convention for axis-aligned.
    # scalar canonicalization: 4-point quads make numpy roll/dot/lexsort
    # overhead ~10x the arithmetic (same pattern as poly_area_perimeter)
    rows = corners.tolist()
    signed = 0.0
    for i in range(4):
        x0, y0 = rows[i]
        x1, y1 = rows[(i + 1) % 4]
        signed += x0 * y1 - y0 * x1
    if signed < 0:
        rows.reverse()
    start = min(range(4), key=lambda i: (rows[i][1], rows[i][0]))
    corners = np.array(rows[start:] + rows[:start], dtype=np.float64)
    w = float(mx[0] - mn[0])
    h = float(mx[1] - mn[1])
    return corners, float(min(w, h)), float(max(w, h))


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """Canonical quad vertex order: top-left, top-right, bottom-right,
    bottom-left — by coordinate sums/diffs (``predict_det.py:151-161``)."""
    pts = np.asarray(pts, dtype=np.float64)
    s = pts.sum(axis=1)
    d = pts[:, 0] - pts[:, 1]  # x - y
    tl = pts[np.argmin(s)]
    br = pts[np.argmax(s)]
    tr = pts[np.argmax(d)]
    bl = pts[np.argmin(d)]
    return np.array([tl, tr, br, bl], dtype=np.float64)


def poly_area_perimeter(poly: np.ndarray) -> tuple[float, float]:
    """Shoelace area (abs) and perimeter of a closed polygon (N,2).

    Python-scalar loop: polys here are 4-8 points, where numpy's
    roll/dot overhead costs ~15x the arithmetic (measured 50 us -> 3 us)."""
    pts = np.asarray(poly, dtype=np.float64).tolist()
    n = len(pts)
    a = 0.0
    per = 0.0
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        a += x0 * y1 - y0 * x1
        per += ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
    return abs(a) * 0.5, per


def offset_convex_poly(poly: np.ndarray, distance: float) -> np.ndarray:
    """Offset a convex polygon outward by ``distance`` (pyclipper-unclip
    equivalent for convex input): shift each edge along its outward normal,
    re-intersect adjacent edges."""
    rows = np.asarray(poly, dtype=np.float64).tolist()
    # polygon orientation (shoelace sign); image coords y-down
    n = len(rows)
    signed = 0.0
    for i in range(n):
        x0, y0 = rows[i]
        x1, y1 = rows[(i + 1) % n]
        signed += x0 * y1 - y0 * x1
    sign = 1.0 if signed > 0 else -1.0
    # scalar edge-shift + pairwise line intersection: unclip polys are 4-8
    # points, where per-call numpy (roll/stack/where over (n,2)) costs ~10x
    # the arithmetic (same rationale as poly_area_perimeter). The formulas
    # are the exact elementwise ops of the previous vectorized form.
    sd = sign * distance
    base, ev = [], []
    for i in range(n):
        x0, y0 = rows[i]
        x1, y1 = rows[(i + 1) % n]
        dx = x1 - x0
        dy = y1 - y0
        ln = (dx * dx + dy * dy) ** 0.5
        if ln < 1e-12:
            continue
        ex = dx / ln
        ey = dy / ln
        ev.append((ex, ey))
        base.append((x0 + sd * ey, y0 - sd * ex))
    m = len(base)
    out = np.empty((m, 2), dtype=np.float64)
    for i in range(m):
        bx, by = base[i]
        ex, ey = ev[i]
        px, py = base[i - 1]
        dx1, dy1 = ev[i - 1]
        denom = dx1 * ey - dy1 * ex
        if abs(denom) >= 1e-12:
            t = ((bx - px) * ey - (by - py) * ex) / denom
            out[i, 0] = px + t * dx1
            out[i, 1] = py + t * dy1
        else:
            out[i, 0] = bx
            out[i, 1] = by
    return out


def unclip(poly: np.ndarray, expand_ratio: float) -> np.ndarray:
    """DB unclip: offset by area*ratio/perimeter
    (``det_transforms.py:553-556``; used ``det_db_postprocess.py:113-118``)."""
    area, per = poly_area_perimeter(poly)
    if per <= 1e-9:
        return np.asarray(poly, dtype=np.float64)
    return offset_convex_poly(poly, area * expand_ratio / per)


def rescale_polys(
    polys: np.ndarray, scale_h: float, scale_w: float, src_h: int, src_w: int
) -> np.ndarray:
    """Map polys from resized to source space: clip(round(p/scale), 0, size-1)
    (``mindocr/postprocess/det_base_postprocess.py:110-125``)."""
    out = np.asarray(polys, dtype=np.float64).copy()
    out[..., 0] = np.clip(np.round(out[..., 0] / scale_w), 0, src_w - 1)
    out[..., 1] = np.clip(np.round(out[..., 1] / scale_h), 0, src_h - 1)
    return out.astype(np.int64)


def _clip_poly_halfplane(poly: list, a: np.ndarray, b: np.ndarray) -> list:
    """Sutherland–Hodgman: keep points left of directed edge a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        d_cur = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0])
        d_nxt = (b[0] - a[0]) * (nxt[1] - a[1]) - (b[1] - a[1]) * (nxt[0] - a[0])
        if d_cur >= 0:
            out.append(cur)
        if (d_cur > 0) != (d_nxt > 0) and d_cur != d_nxt:
            t = d_cur / (d_cur - d_nxt)
            out.append(cur + t * (nxt - cur))
    return out


def poly_intersection_area(p1: np.ndarray, p2: np.ndarray) -> float:
    """Area of intersection of two convex polygons (both any winding)."""

    def ccw(p):
        p = np.asarray(p, dtype=np.float64)
        x, y = p[:, 0], p[:, 1]
        s = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        return p if s > 0 else p[::-1]

    clip = ccw(p2)
    poly = [pt for pt in ccw(p1)]
    for i in range(len(clip)):
        if not poly:
            return 0.0
        poly = _clip_poly_halfplane(poly, clip[i], clip[(i + 1) % len(clip)])
    if len(poly) < 3:
        return 0.0
    arr = np.asarray(poly)
    area, _ = poly_area_perimeter(arr)
    return area


def poly_iou(p1: np.ndarray, p2: np.ndarray) -> float:
    """IoU of two convex quads (``det_metrics.py:14-19`` semantics)."""
    inter = poly_intersection_area(p1, p2)
    a1, _ = poly_area_perimeter(np.asarray(p1, dtype=np.float64))
    a2, _ = poly_area_perimeter(np.asarray(p2, dtype=np.float64))
    union = a1 + a2 - inter
    return inter / union if union > 1e-12 else 0.0


def arc_length(points: np.ndarray, closed: bool = True) -> float:
    """Polyline/polygon perimeter (``cv2.arcLength`` analogue,
    used at ``mindocr/postprocess/det_db_postprocess.py:104``)."""
    p = np.asarray(points, dtype=np.float64)
    if len(p) < 2:
        return 0.0
    seg = np.linalg.norm(np.diff(p, axis=0), axis=1).sum()
    if closed:
        seg += float(np.linalg.norm(p[-1] - p[0]))
    return float(seg)


def _dp_open(points: np.ndarray, eps: float) -> list[int]:
    """Douglas-Peucker on an open chain; returns kept indices (ends incl.)."""
    keep = [0, len(points) - 1]
    stack = [(0, len(points) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a, b = points[i], points[j]
        ab = b - a
        ln = np.linalg.norm(ab)
        seg = points[i + 1 : j]
        if ln < 1e-12:
            d = np.linalg.norm(seg - a, axis=1)
        else:
            d = np.abs((seg[:, 0] - a[0]) * ab[1] - (seg[:, 1] - a[1]) * ab[0]) / ln
        k = int(np.argmax(d))
        if d[k] > eps:
            m = i + 1 + k
            keep.append(m)
            stack.append((i, m))
            stack.append((m, j))
    return sorted(set(keep))


def approx_poly_dp(points: np.ndarray, epsilon: float, closed: bool = True) -> np.ndarray:
    """Ramer-Douglas-Peucker polygon simplification
    (``cv2.approxPolyDP`` analogue for the det ``box_type='poly'`` path,
    ``det_db_postprocess.py:105``). For a closed contour the chain is split
    at its two mutually-farthest anchor points (deterministic: the first of
    each tied pair), each half simplified, halves rejoined."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    if n <= 2:
        return p.copy()
    if not closed:
        return p[_dp_open(p, epsilon)]
    # anchor 1: farthest from point 0; anchor 2: farthest from anchor 1
    d0 = np.linalg.norm(p - p[0], axis=1)
    a1 = int(np.argmax(d0))
    d1 = np.linalg.norm(p - p[a1], axis=1)
    a2 = int(np.argmax(d1))
    lo, hi = min(a1, a2), max(a1, a2)
    chain1 = p[lo : hi + 1]
    chain2 = np.concatenate([p[hi:], p[: lo + 1]], axis=0)
    k1 = [lo + i for i in _dp_open(chain1, epsilon)]
    k2 = [(hi + i) % n for i in _dp_open(chain2, epsilon)]
    idx = sorted(set(k1) | set(k2))
    return p[idx]


def is_convex(poly: np.ndarray) -> bool:
    """True iff the polygon is convex (all cross products one sign; zeros —
    collinear runs — allowed)."""
    p = np.asarray(poly, dtype=np.float64)
    n = len(p)
    if n < 4:
        return True
    e = np.roll(p, -1, axis=0) - p
    cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    return bool((cross >= -1e-9).all() or (cross <= 1e-9).all())


def clip_poly_to_rect(poly: np.ndarray, w: float, h: float) -> np.ndarray:
    """Sutherland–Hodgman clip of a polygon to the [0,w]x[0,h] rectangle,
    returning the clipped VERTICES (possibly degenerate: boundary-touching
    input yields a zero-area chain, matching shapely's
    intersects-but-area-0 case). Empty array when fully outside."""
    p = np.asarray(poly, dtype=np.float64)
    x, y = p[:, 0], p[:, 1]
    s = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    pts = [pt for pt in (p if s > 0 else p[::-1])]
    rect = np.array(
        [[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]], dtype=np.float64
    )
    for i in range(4):
        if not pts:
            break
        pts = _clip_poly_halfplane(pts, rect[i], rect[(i + 1) % 4])
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)
