"""Per-group heavy hitters: CMS point estimates over locally-generated
candidates.

100TB shape: stage 1 computes, per task x group, (a) a CMS partial and
(b) the task's exact local top-C keys — both tiny — so the raw table is
scanned once and never shuffled.  Candidates (<= tasks * groups * C rows)
and CMS states (one per group) are merged on reducers, and the final
estimate is a broadcast-join of two small frames.  Skewed sources cost
nothing extra: a group's candidates arrive pre-aggregated per task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from python_hll_spark.functions.hashing import splitmix64
from python_hll_spark.operators.aggregate import merge_sketches, sketch_partials
from python_hll_spark.sketches.cms import CMSConfig
from python_hll_spark.sketches.specs import CMSSpec


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    return splitmix64(keys.astype(np.int64, copy=False))




def cms_topk(df: DataFrame, group_cols: list[str], key_col: str, k: int = 10,
             cfg: CMSConfig | None = None, candidates_per_task: int = 64) -> DataFrame:
    """Top-k ``key_col`` values per group with CMS frequency estimates.

    Works for any orderable key type: the CMS ingests the JVM-side
    ``xxhash64`` of the key; candidates carry the original key value.
    Returns (group..., key <input type>, est_count bigint, rank int).
    """
    cfg = cfg or CMSConfig(depth=5, width=65536)
    spec = CMSSpec(cfg)
    cand_c = max(candidates_per_task, 4 * k)

    pruned = df.select(*group_cols, F.col(key_col).alias("__key"),
                       F.xxhash64(F.col(key_col)).alias("__kh"))
    key_type = dict(pruned.dtypes)["__key"]

    # -- CMS partials (Arrow-native for <=1 group col) + candidates ----------
    from python_hll_spark.operators.aggregate import SplitmixSpec, scalar_partials_arrow

    if len(group_cols) <= 1:
        partials = scalar_partials_arrow(pruned.drop("__key"), group_cols,
                                         "__kh", SplitmixSpec(spec))
    else:
        def extract(pdf: pd.DataFrame) -> np.ndarray:
            return _hash_keys(pdf["__kh"].to_numpy(dtype=np.int64))

        partials = sketch_partials(pruned.drop("__key"), group_cols, extract, spec)
    states = merge_sketches(partials, group_cols, spec)

    group_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                    for f in pruned.schema.fields if f.name in group_cols]
    cand_schema = ", ".join(group_fields + [f"key {key_type}", "local_count bigint"])

    def local_candidates(batches):
        counts: dict = {}
        for pdf in batches:
            for gkey, idx in pdf.groupby(group_cols, sort=False).indices.items():
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                sub = pdf["__key"].iloc[idx]
                vc = sub.value_counts()
                acc = counts.setdefault(gkey, {})
                for u, c in vc.items():
                    acc[u] = acc.get(u, 0) + int(c)
        rows = []
        for gkey, acc in counts.items():
            top = sorted(acc.items(), key=lambda kv: (-kv[1], str(kv[0])))[:cand_c]
            rows.extend((*gkey, u, c) for u, c in top)
        yield pd.DataFrame(rows, columns=group_cols + ["key", "local_count"])

    candidates = (pruned.mapInPandas(local_candidates, schema=cand_schema)
                  .groupBy(*group_cols, "key")
                  .agg(F.sum("local_count").alias("cand_count"))
                  .withColumn("__kh", F.xxhash64(F.col("key"))))

    # -- estimate candidates against the merged per-group CMS ----------------
    @F.pandas_udf(LongType())
    def cms_estimate(state: pd.Series, key_hash: pd.Series) -> pd.Series:
        from python_hll_spark.sketches.cms import CMSSketch
        out = np.empty(len(key_hash), dtype=np.int64)
        # group probe keys by state blob (few distinct groups per batch)
        frame = pd.DataFrame({"s": state.map(bytes), "k": key_hash})
        for blob, sub in frame.groupby("s", sort=False):
            sk = CMSSketch.from_bytes(blob)
            est = sk.estimate(_hash_keys(sub["k"].to_numpy(dtype=np.int64)))
            out[sub.index.to_numpy()] = est
        return pd.Series(out)

    joined = candidates.join(F.broadcast(states.select(*group_cols, "state")),
                             on=group_cols, how="inner")
    estimated = joined.withColumn("est_count",
                                  cms_estimate(F.col("state"), F.col("__kh")))

    from pyspark.sql import Window
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy(F.desc("est_count"), F.asc("key")))
    return (estimated
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(*group_cols, "key", "est_count", "rank"))


def exact_topk(df: DataFrame, group_cols: list[str], key_col: str, k: int = 10) -> DataFrame:
    """Exact oracle (shuffles; test scale only)."""
    from pyspark.sql import Window
    counted = (df.groupBy(*group_cols, F.col(key_col).alias("key"))
               .agg(F.count("*").alias("cnt")))
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy(F.desc("cnt"), F.asc("key")))
    return (counted.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
