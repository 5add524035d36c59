"""Text-span path: batched HTML boilerplate strip as a pandas UDF.

Vectorized over an Arrow batch of raw HTML strings (no per-row Python at
the Spark level — the batch loop lives inside the UDF, per
``BASELINE.json:input_hint``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..functions.html_text import extract_main_text


# explicit DataType (not a DDL string): DDL parsing would require an active
# SparkSession at import time
@pandas_udf(StringType())
def extract_main_text_udf(raw: pd.Series) -> pd.Series:
    return raw.map(lambda s: extract_main_text(s) if s is not None else "")
