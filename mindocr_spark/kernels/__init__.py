"""Deterministic scorer functions replacing the reference's NN forwards.

Same I/O contracts as the reference models (SURVEY.md §2.13):

- det: normalized image -> probability map (H,W) float32 in [0,1]
  (reference DBNet prob-map contract, ``det_db_postprocess.py:53-77``).
- rec: crop -> logits (T, num_classes) for CTC decode
  (reference contract ``rec_postprocess.py:139-157``).
- cls: crop -> probs (2,) over angles {0, 180}
  (reference contract ``cls_postprocess.py:15-27``).

No MindSpore / no checkpoints: the scorers are pure numpy and shared
bit-for-bit between the oracle and the Spark UDFs, which is what makes the
span-sequence-equality gate exact.
"""
