"""Readers for the reference's layout / table / KIE dataset formats.

- ``read_publaynet``: COCO-style layout annotations
  (``mindocr/data/layout_dataset.py``): one JSON with images[],
  annotations[], categories[] -> one row per annotation joined to its image
  (image_id, file_name, width, height, category, bbox xywh).
- ``read_pubtabnet``: PubTabNet jsonl (``mindocr/data/table_pubtab_dataset.py``):
  one JSON object per line with filename, split, html structure tokens and
  cell records.
- ``read_xfund``: XFUND/FUNSD-style SER/RE annotations
  (``mindocr/data/kie_dataset.py``): documents[] with per-entity id, label,
  text, box, and linkings.

All are plain distributed ``spark.read`` + ``from_json``/explode — no
driver-side parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COCO_SCHEMA = (
    "images array<struct<id:long,file_name:string,width:int,height:int>>, "
    "annotations array<struct<id:long,image_id:long,category_id:long,"
    "bbox:array<double>,area:double,iscrowd:int>>, "
    "categories array<struct<id:long,name:string>>"
)


def read_publaynet(spark: SparkSession, path: str) -> DataFrame:
    """COCO layout JSON -> (image_id, file_name, width, height,
    category_id, category, bbox [x,y,w,h])."""
    raw = spark.read.text(path, wholetext=True).select(
        F.from_json("value", _COCO_SCHEMA).alias("j")
    )
    imgs = raw.select(F.explode("j.images").alias("im")).select(
        F.col("im.id").alias("image_id"),
        F.col("im.file_name").alias("file_name"),
        F.col("im.width").alias("width"),
        F.col("im.height").alias("height"),
    )
    anns = raw.select(F.explode("j.annotations").alias("a")).select(
        F.col("a.image_id").alias("image_id"),
        F.col("a.category_id").alias("category_id"),
        F.col("a.bbox").alias("bbox"),
    )
    cats = raw.select(F.explode("j.categories").alias("c")).select(
        F.col("c.id").alias("category_id"), F.col("c.name").alias("category")
    )
    return (
        anns.join(F.broadcast(imgs), "image_id")
        .join(F.broadcast(cats), "category_id")
        .select(
            "image_id", "file_name", "width", "height",
            "category_id", "category", "bbox",
        )
    )


_PUBTAB_SCHEMA = (
    "filename string, split string, "
    "html struct<structure:struct<tokens:array<string>>, "
    "cells:array<struct<tokens:array<string>, bbox:array<int>>>>"
)


def read_pubtabnet(spark: SparkSession, path: str) -> DataFrame:
    """PubTabNet jsonl -> one row per table with structure tokens and an
    exploded-ready cells array (tokens + bbox)."""
    raw = spark.read.json(path, schema=_PUBTAB_SCHEMA)
    return raw.select(
        "filename",
        "split",
        F.col("html.structure.tokens").alias("structure_tokens"),
        F.col("html.cells").alias("cells"),
    )


_XFUND_SCHEMA = (
    "documents array<struct<id:string, img:struct<fname:string,width:int,"
    "height:int>, document:array<struct<id:long,label:string,text:string,"
    "box:array<int>, linking:array<array<long>>>>>>"
)


def read_xfund(spark: SparkSession, path: str) -> DataFrame:
    """XFUND SER/RE JSON -> one row per entity:
    (doc_id, fname, entity_id, label, text, box, linking)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.from_json("value", _XFUND_SCHEMA).alias("j")
    )
    docs = raw.select(F.explode("j.documents").alias("d"))
    return docs.select(
        F.col("d.id").alias("doc_id"),
        F.col("d.img.fname").alias("fname"),
        F.explode("d.document").alias("e"),
    ).select(
        "doc_id",
        "fname",
        F.col("e.id").alias("entity_id"),
        F.col("e.label").alias("label"),
        F.col("e.text").alias("text"),
        F.col("e.box").alias("box"),
        F.col("e.linking").alias("linking"),
    )


def read_synthtext(spark: SparkSession, mat_path: str, data_dir: str = "") -> DataFrame:
    """SynthText ``gt.mat`` -> one row per image:
    (img_path, polys array<array<array<double>>> (M,4,2), texts, ignore_tags)
    — exactly ``SynthTextDataset.load_data_list``
    (``mindocr/data/det_dataset.py:162-180``): texts are the
    whitespace-split tokens of the char-array rows, polys are the 2x4xM
    wordBB transposed to (M,4,2) (labels without a batch dim reshape to
    (1,4,2)), ignore_tags all False.

    The .mat is parsed once driver-side with the pure-numpy MAT-5 reader
    (``functions/mat5.py`` — scipy is absent here); it is a single manifest
    file in the reference too. At scale, convert once to parquet (the
    reference ships the same advice as ``tools/dataset_converters``)."""
    import os

    import numpy as np

    from ..functions.mat5 import loadmat

    mat = loadmat(mat_path)
    rows = []
    for image, boxes, texts in zip(mat["imnames"][0], mat["wordBB"][0], mat["txt"][0]):
        img_name = image[0] if isinstance(image, list) else str(image)
        toks = [t for text in texts for t in text.split()]
        polys = np.asarray(boxes, dtype=np.float64).transpose().reshape(-1, 4, 2)
        rows.append(
            (
                os.path.join(data_dir, img_name),
                [[[float(x), float(y)] for x, y in quad] for quad in polys],
                toks,
                [False] * len(toks),
            )
        )
    return spark.createDataFrame(
        rows,
        "img_path string, polys array<array<array<double>>>, "
        "texts array<string>, ignore_tags array<boolean>",
    )
