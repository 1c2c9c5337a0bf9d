"""Scalar pandas UDFs for reading sketch states out of DataFrame columns."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, DoubleType


@F.pandas_udf(LongType())
def hll_cardinality(states: pd.Series) -> pd.Series:
    from python_hll_spark.sketches.hll import HLLSketch

    return states.map(lambda b: HLLSketch.from_bytes(bytes(b)).cardinality())


@F.pandas_udf(DoubleType())
def hll_cardinality_float(states: pd.Series) -> pd.Series:
    from python_hll_spark.sketches.hll import HLLSketch

    return states.map(lambda b: HLLSketch.from_bytes(bytes(b)).cardinality_float())
