"""Reading-order utilities.

``sorted_boxes`` reproduces the reference's top-to-bottom / left-to-right
ordering with a same-line adjustment pass (tolerance 10px on the top-left
y): sort by (y0, x0), then bubble adjacent pairs that sit on the same line
but are out of x order (``tools/infer/text/utils/utils.py:95-103``).
"""

from __future__ import annotations

import numpy as np

from ..config import SORTED_BOXES_YTOL


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
