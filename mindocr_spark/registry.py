"""Name-keyed stage registry + config-driven pipeline assembly.

The reference instantiates transform pipelines from YAML by class name
(``create_transforms`` / ``run_transforms``,
``mindocr/data/transforms/transforms_factory.py:24-60``) and registers
models/postprocessors/metrics by name (``mindocr/models/_registry.py``,
``postprocess/builder.py``). The Spark-native equivalent: a registry of
DataFrame -> DataFrame stage factories, composed from a config list — an
explicit dict lookup rather than the reference's ``eval(name)``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

StageFactory = Callable[..., Callable[[DataFrame], DataFrame]]

_STAGES: dict[str, StageFactory] = {}


def register_stage(name: str) -> Callable[[StageFactory], StageFactory]:
    def deco(fn: StageFactory) -> StageFactory:
        if name in _STAGES:
            raise ValueError(f"stage {name!r} already registered")
        _STAGES[name] = fn
        return fn

    return deco


def build_pipeline(config: list[dict[str, Any]]) -> Callable[[DataFrame], DataFrame]:
    """config: [{"name": <registered stage>, ...params}] -> composed stage."""
    stages = []
    for item in config:
        params = dict(item)
        name = params.pop("name")
        if name not in _STAGES:
            raise KeyError(f"unknown stage {name!r}; known: {sorted(_STAGES)}")
        stages.append(_STAGES[name](**params))

    def run(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return run


def available_stages() -> list[str]:
    return sorted(_STAGES)


# --- built-in stages ----------------------------------------------------


@register_stage("strip_html")
def _strip_html(column: str = "raw_text", out: str = "text"):
    from pyspark.sql import functions as F

    from .operators.text_path import extract_main_text_udf

    def stage(df: DataFrame) -> DataFrame:
        return df.withColumn(out, extract_main_text_udf(F.col(column)))

    return stage


@register_stage("ocr_fused")
def _ocr_fused():
    from .operators.media_path import FUSED_SCHEMA, ocr_fused_iter

    def stage(df: DataFrame) -> DataFrame:
        return df.mapInPandas(ocr_fused_iter, FUSED_SCHEMA)

    return stage


@register_stage("det_crops")
def _det_crops():
    from .operators.media_path import DET_CROPS_SCHEMA, det_crops_iter

    def stage(df: DataFrame) -> DataFrame:
        return df.mapInPandas(det_crops_iter, DET_CROPS_SCHEMA)

    return stage


@register_stage("recognize")
def _recognize():
    from .operators.media_path import REC_SCHEMA, recognize_iter

    def stage(df: DataFrame) -> DataFrame:
        return df.mapInPandas(recognize_iter, REC_SCHEMA)

    return stage


@register_stage("drop_score")
def _drop_score(threshold: float | None = None):
    from pyspark.sql import functions as F

    from .config import DROP_SCORE

    thr = DROP_SCORE if threshold is None else threshold

    def stage(df: DataFrame) -> DataFrame:
        return df.filter((F.col("conf") >= F.lit(thr)) & (F.col("text") != ""))

    return stage


@register_stage("filter")
def _filter(condition: str):
    def stage(df: DataFrame) -> DataFrame:
        return df.filter(condition)

    return stage


@register_stage("repartition_cpu")
def _repartition_cpu(key: str = "media_ref", factor: int = 2):
    def stage(df: DataFrame) -> DataFrame:
        n = df.sparkSession.sparkContext.defaultParallelism * factor
        return df.repartition(n, key)

    return stage


@register_stage("table_cells")
def _table_cells():
    from .operators.table_path import TABLE_CELLS_SCHEMA, table_cells_iter

    def stage(df: DataFrame) -> DataFrame:
        return df.mapInPandas(table_cells_iter, TABLE_CELLS_SCHEMA)

    return stage
