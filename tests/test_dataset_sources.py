"""Layout / table / KIE dataset format readers (§2.1 remaining rows)."""

import json

from mindocr_spark.sources.datasets import read_publaynet, read_pubtabnet, read_xfund


def test_read_publaynet(spark, tmp_path):
    coco = {
        "images": [
            {"id": 1, "file_name": "p1.png", "width": 800, "height": 600},
            {"id": 2, "file_name": "p2.png", "width": 640, "height": 480},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 2, "bbox": [5, 6, 100, 20],
             "area": 2000.0, "iscrowd": 0},
            {"id": 11, "image_id": 2, "category_id": 4, "bbox": [1, 2, 50, 40],
             "area": 2000.0, "iscrowd": 0},
        ],
        "categories": [{"id": 2, "name": "text"}, {"id": 4, "name": "table"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    rows = {r["file_name"]: r for r in read_publaynet(spark, str(p)).collect()}
    assert rows["p1.png"]["category"] == "text"
    assert rows["p1.png"]["bbox"] == [5.0, 6.0, 100.0, 20.0]
    assert rows["p2.png"]["category"] == "table"
    assert rows["p2.png"]["width"] == 640


def test_read_pubtabnet(spark, tmp_path):
    lines = [
        {
            "filename": "t1.png",
            "split": "train",
            "html": {
                "structure": {"tokens": ["<tr>", "<td>", "</td>", "</tr>"]},
                "cells": [{"tokens": ["4", "2"], "bbox": [1, 2, 3, 4]}],
            },
        }
    ]
    p = tmp_path / "tab.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    row = read_pubtabnet(spark, str(p)).collect()[0]
    assert row["filename"] == "t1.png"
    assert row["structure_tokens"][1] == "<td>"
    assert row["cells"][0]["tokens"] == ["4", "2"]


def test_read_xfund(spark, tmp_path):
    data = {
        "documents": [
            {
                "id": "d1",
                "img": {"fname": "d1.png", "width": 100, "height": 100},
                "document": [
                    {"id": 0, "label": "question", "text": "name",
                     "box": [1, 2, 30, 12], "linking": [[0, 1]]},
                    {"id": 1, "label": "answer", "text": "smith",
                     "box": [35, 2, 70, 12], "linking": [[0, 1]]},
                ],
            }
        ]
    }
    p = tmp_path / "xfund.json"
    p.write_text(json.dumps(data))
    rows = read_xfund(spark, str(p)).orderBy("entity_id").collect()
    assert [r["label"] for r in rows] == ["question", "answer"]
    assert rows[1]["text"] == "smith"
    assert rows[0]["linking"] == [[0, 1]]


def test_synthtext_mat_source(spark, tmp_path):
    """Pure-numpy MAT-5 reader feeding the SynthText source (scipy absent);
    semantics mirror det_dataset.py:162-180 incl. the no-batch-dim reshape."""
    import numpy as np

    from mindocr_spark.functions.mat5 import savemat
    from mindocr_spark.sources.datasets import read_synthtext

    imnames = np.empty((1, 2), dtype=object)
    imnames[0, 0] = ["8/ballet_106_0.jpg"]
    imnames[0, 1] = ["8/ballet_106_1.jpg"]
    bb0 = np.stack(
        [
            np.array([[0, 10, 10, 0], [0, 0, 5, 5]], dtype=np.float64),
            np.array([[20, 40, 40, 20], [0, 0, 8, 8]], dtype=np.float64),
        ],
        axis=2,
    )  # (2, 4, 2): two word quads
    bb1 = np.array([[1, 9, 9, 1], [2, 2, 7, 7]], dtype=np.float64)  # (2, 4): one quad, no batch dim
    wordBB = np.empty((1, 2), dtype=object)
    wordBB[0, 0] = bb0
    wordBB[0, 1] = bb1
    txt = np.empty((1, 2), dtype=object)
    txt[0, 0] = ["Lines:      ", "I lost      "]
    txt[0, 1] = ["solo"]
    p = str(tmp_path / "gt.mat")
    savemat(p, {"imnames": imnames, "wordBB": wordBB, "txt": txt})

    rows = {r["img_path"]: r for r in read_synthtext(spark, p, "/data").collect()}
    assert set(rows) == {"/data/8/ballet_106_0.jpg", "/data/8/ballet_106_1.jpg"}
    r0 = rows["/data/8/ballet_106_0.jpg"]
    assert r0["texts"] == ["Lines:", "I", "lost"]
    assert len(r0["polys"]) == 2 and len(r0["polys"][0]) == 4
    # (2,4,M).transpose() -> (M,4,2): first quad's first point is (x0,y0)
    assert r0["polys"][0][0] == [0.0, 0.0] and r0["polys"][0][2] == [10.0, 5.0]
    r1 = rows["/data/8/ballet_106_1.jpg"]
    assert len(r1["polys"]) == 1 and r1["texts"] == ["solo"]
    assert r1["ignore_tags"] == [False]
