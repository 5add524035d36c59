"""Reading-order utilities.

``sorted_boxes`` reproduces the reference's top-to-bottom / left-to-right
ordering with a same-line adjustment pass (tolerance 10px on the top-left
y): sort by (y0, x0), then bubble adjacent pairs that sit on the same line
but are out of x order (``tools/infer/text/utils/utils.py:95-103``).
"""

from __future__ import annotations

import numpy as np

from ..config import SORTED_BOXES_YTOL


def sort_words_reading_order(polys: list[np.ndarray]) -> list[int]:
    """Comparator-based reading order (``utils.py:201-226``,
    ``sort_words_by_poly``): two boxes are on the same line when their
    vertical overlap distances differ by less than either box height — then
    order by left x, else by top y. Not expressible as a lexicographic sort,
    hence a cmp_to_key sort (per doc/region inside a grouped UDF)."""
    from functools import cmp_to_key

    def compare(i: int, j: int) -> int:
        x, y = polys[i], polys[j]
        x_top, x_bot = float(x[0][1]), float(x[3][1])
        y_top, y_bot = float(y[0][1]), float(y[3][1])
        dist1 = y_bot - x_top
        dist2 = x_bot - y_top
        same_line = abs(dist1 - dist2) < (x_bot - x_top) or abs(dist1 - dist2) < (
            y_bot - y_top
        )
        a, b = (
            (float(x[0][0]), float(y[0][0])) if same_line else (x_top, y_top)
        )
        return -1 if a < b else (0 if a == b else 1)

    return sorted(range(len(polys)), key=cmp_to_key(compare))


def sorted_boxes(polys: list[np.ndarray]) -> list[int]:
    """Return the reading-order permutation of box indices."""
    n = len(polys)
    order = sorted(range(n), key=lambda i: (float(polys[i][0][1]), float(polys[i][0][0])))
    for i in range(n - 1):
        for j in range(i, -1, -1):
            a, b = polys[order[j]], polys[order[j + 1]]
            if (
                abs(float(b[0][1]) - float(a[0][1])) < SORTED_BOXES_YTOL
                and float(b[0][0]) < float(a[0][0])
            ):
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order
