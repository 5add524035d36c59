"""Gear batching utilities (the reference's fixed-shape inference gears,
``deploy/py_infer/src/data_process/utils/gear_utils.py:10-70``).

A "gear" is one of a fixed set of tensor shapes a compiled model accepts;
inputs are matched to the nearest gear and padded. In the Spark rebuild the
gear is also the co-location key: repartitioning crop rows by their matched
gear puts same-shape tensors in the same partitions, so downstream batch
stacking is contiguous (SURVEY §2.10's repartition-by-bucket mapping).
"""

from __future__ import annotations

import numpy as np


def get_matched_gear_hw(
    image_hw: tuple[int, int], hw_list: list[tuple[int, int]]
) -> tuple[int, int]:
    """Nearest gear by L1 distance over (h, w); first match wins on ties
    (``gear_utils.py:10-25`` exactly)."""
    if len(hw_list) == 1:
        return hw_list[0]
    origin_h, origin_w = image_hw[0], image_hw[1]
    matched = None
    min_diff = float("inf")
    for height, width in hw_list:
        dist = abs(height - origin_h) + abs(width - origin_w)
        if dist < min_diff:
            min_diff = dist
            matched = (height, width)
    return matched


def pad_to_gear(tensor: np.ndarray, gear_hw: tuple[int, int]) -> np.ndarray:
    """Zero-pad the trailing (h, w) of a (h,w) or (c,h,w) tensor up to the
    gear shape (``padding_to_batch``'s zero-fill semantics applied at the
    sample level); larger inputs are NOT cropped — callers pick a gear >=
    the input via :func:`get_matched_gear_hw` over an adequate gear list."""
    h, w = tensor.shape[-2], tensor.shape[-1]
    gh, gw = gear_hw
    if (gh, gw) == (h, w):
        return tensor
    if gh < h or gw < w:
        raise ValueError(f"gear {gear_hw} smaller than tensor {(h, w)}")
    pad = [(0, 0)] * (tensor.ndim - 2) + [(0, gh - h), (0, gw - w)]
    return np.pad(tensor, pad, mode="constant", constant_values=0)
