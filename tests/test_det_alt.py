"""Alternative detector slots: PSE expansion and EAST restore+LANMS on
synthetic maps built from known boxes."""

import numpy as np
import pytest

from mindocr_spark.functions.pse import _components4, pse_expand
from mindocr_spark.kernels.det_alt import east_postprocess, pse_postprocess


class TestPse:
    def test_components4_diagonal_separate(self):
        m = np.zeros((4, 4), dtype=np.uint8)
        m[0, 0] = 1
        m[1, 1] = 1
        lab = _components4(m)
        assert lab[0, 0] != lab[1, 1] != 0

    def test_expand_grows_to_text_mask(self):
        # two words: text mask rects, nested smaller kernels
        text = np.zeros((40, 100), dtype=np.uint8)
        k1 = np.zeros_like(text)
        text[5:15, 5:45] = 1
        text[25:35, 5:45] = 1
        k1[8:12, 15:35] = 1
        k1[28:32, 15:35] = 1
        label = pse_expand(np.stack([text, k1]), min_area=4)
        assert set(np.unique(label)) == {0, 1, 2}
        # every text pixel labeled, labels confined to their own rect
        assert (label[5:15, 5:45] > 0).all()
        assert len(np.unique(label[5:15, 5:45])) == 1
        assert len(np.unique(label[25:35, 5:45])) == 1
        assert label[5, 5] != label[25, 5]
        assert (label[text == 0] == 0).all()

    def test_min_area_drops_specks(self):
        text = np.zeros((20, 20), dtype=np.uint8)
        k1 = np.zeros_like(text)
        text[2:18, 2:18] = 1
        k1[5, 5] = 1  # 1-px seed below min_area
        label = pse_expand(np.stack([text, k1]), min_area=4)
        assert label.max() == 0

    def test_pse_postprocess_boxes(self):
        # logits: high inside, low outside; kernel channel shrunk
        text_logit = np.full((40, 100), -8.0, dtype=np.float64)
        k_logit = np.full((40, 100), -8.0, dtype=np.float64)
        text_logit[5:15, 5:65] = 8.0
        k_logit[8:12, 20:50] = 8.0
        polys, scores = pse_postprocess(np.stack([text_logit, k_logit]))
        assert len(polys) == 1
        assert scores[0] > 0.9
        p = polys[0]
        assert p[:, 0].min() == pytest.approx(5, abs=1)
        assert p[:, 0].max() == pytest.approx(64, abs=1)
        assert p[:, 1].min() == pytest.approx(5, abs=1)


class TestEast:
    def _geo_for_box(self, h_map, w_map, box, theta=0.0, scale=4):
        """Build score+geo maps for one axis-aligned gt box (image coords)."""
        score = np.zeros((h_map, w_map), dtype=np.float64)
        geo = np.zeros((5, h_map, w_map), dtype=np.float64)
        x0, y0, x1, y1 = box
        for y in range(h_map):
            for x in range(w_map):
                px, py = x * scale, y * scale
                if x0 + 4 <= px <= x1 - 4 and y0 + 4 <= py <= y1 - 4:
                    score[y, x] = 0.95
                    geo[0, y, x] = py - y0
                    geo[1, y, x] = y1 - py
                    geo[2, y, x] = px - x0
                    geo[3, y, x] = x1 - px
                    geo[4, y, x] = theta
        return score, geo

    def test_restore_single_box(self):
        score, geo = self._geo_for_box(32, 32, (16, 20, 96, 56))
        polys, scores = east_postprocess(score, geo)
        assert len(polys) == 1
        p = polys[0]
        assert p[:, 0].min() == pytest.approx(16, abs=1.0)
        assert p[:, 0].max() == pytest.approx(96, abs=1.0)
        assert p[:, 1].min() == pytest.approx(20, abs=1.0)
        assert p[:, 1].max() == pytest.approx(56, abs=1.0)
        assert scores[0] > 0.9  # merged score sums then NMS keeps top

    def test_two_separate_boxes(self):
        s1, g1 = self._geo_for_box(32, 64, (16, 20, 96, 56))
        s2, g2 = self._geo_for_box(32, 64, (150, 20, 230, 56))
        score = np.maximum(s1, s2)
        geo = np.where(g1 != 0, g1, g2)
        polys, _ = east_postprocess(score, geo)
        assert len(polys) == 2

    def test_empty(self):
        assert east_postprocess(np.zeros((8, 8)), np.zeros((5, 8, 8))) == ([], [])
