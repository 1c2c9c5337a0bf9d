"""Token-membership queries via distributed Bloom filters."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from python_hll_spark.functions.hashing import splitmix64
from python_hll_spark.operators.aggregate import sketch_global, sketch_groupby
from python_hll_spark.sketches.bloom import BloomConfig
from python_hll_spark.sketches.specs import BloomSpec


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    return splitmix64(keys.astype(np.int64, copy=False))


def bloom_build(df: DataFrame, key_col: str, by: list[str] | None = None,
                cfg: BloomConfig | None = None) -> DataFrame:
    """Build per-group Bloom states over an integral key column.

    Returns (by..., state binary, n_values bigint)."""
    spec = BloomSpec(cfg or BloomConfig())
    pruned = df.select(*(by or []), F.col(key_col).cast("long").alias("__key"))

    def extract(pdf: pd.DataFrame) -> np.ndarray:
        return _hash_keys(pdf["__key"].to_numpy(dtype=np.int64))

    if by:
        return sketch_groupby(pruned, by, extract, spec)
    return sketch_global(pruned, extract, spec)


def bloom_might_contain_udf():
    @F.pandas_udf(BooleanType())
    def probe(state: pd.Series, key: pd.Series) -> pd.Series:
        from python_hll_spark.sketches.bloom import BloomSketch
        out = np.empty(len(key), dtype=bool)
        frame = pd.DataFrame({"s": state.map(bytes), "k": key})
        for blob, sub in frame.groupby("s", sort=False):
            sk = BloomSketch.from_bytes(blob)
            out[sub.index.to_numpy()] = sk.might_contain(
                _hash_keys(sub["k"].to_numpy(dtype=np.int64)))
        return pd.Series(out)
    return probe


def bloom_probe(states: DataFrame, probes: DataFrame, key_col: str,
                by: list[str] | None = None) -> DataFrame:
    """Probe keys against (broadcast) per-group Bloom states.

    Returns probes columns + ``might_contain`` boolean."""
    probe = bloom_might_contain_udf()
    if by:
        joined = probes.join(F.broadcast(states.select(*by, "state")), on=by)
    else:
        joined = probes.crossJoin(F.broadcast(states.select("state")))
    return (joined
            .withColumn("might_contain", probe(F.col("state"), F.col(key_col).cast("long")))
            .drop("state"))
