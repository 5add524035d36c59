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
