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

    # -- CMS partials + candidates, both Arrow-native ------------------------
    from python_hll_spark.operators.aggregate import SplitmixSpec, scalar_partials_arrow

    if len(group_cols) > 1:
        raise ValueError("cms_topk supports at most one group column; "
                         "pre-combine composite keys into one column")
    partials = scalar_partials_arrow(pruned.drop("__key"), group_cols,
                                     "__kh", SplitmixSpec(spec))
    states = merge_sketches(partials, group_cols, spec)

    group_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                    for f in pruned.schema.fields if f.name in group_cols]
    cand_schema = ", ".join(group_fields + [f"key {key_type}", "local_count bigint"])

    def local_candidates(batches):
        """Per-task exact local top-C via dictionary-encoded composite codes:
        one bincount per Arrow batch, no per-row Python / pandas strings."""
        import pyarrow as pa
        counts: dict = {}  # (gval, key) -> count
        for batch in batches:
            kcol = batch.column("__key")
            if isinstance(kcol, pa.ChunkedArray):
                kcol = kcol.combine_chunks()
            kenc = kcol.dictionary_encode()
            kcodes = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            kdict = kenc.dictionary.to_pylist()
            if group_cols:
                gcol = batch.column(group_cols[0])
                if isinstance(gcol, pa.ChunkedArray):
                    gcol = gcol.combine_chunks()
                genc = gcol.dictionary_encode()
                gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                gdict = genc.dictionary.to_pylist()
            else:
                gcodes, gdict = np.zeros(len(kcodes), dtype=np.int64), [None]
            comp = gcodes * len(kdict) + kcodes
            cnt = np.bincount(comp, minlength=len(gdict) * len(kdict))
            nz = np.nonzero(cnt)[0]
            for code, c in zip(nz.tolist(), cnt[nz].tolist()):
                pair = (gdict[code // len(kdict)], kdict[code % len(kdict)])
                counts[pair] = counts.get(pair, 0) + c
        per_group: dict = {}
        for (gkey, key), c in counts.items():
            per_group.setdefault(gkey, []).append((key, c))
        g_out, k_out, c_out = [], [], []
        for gkey, items in per_group.items():
            items.sort(key=lambda kv: (-kv[1], str(kv[0])))
            for key, c in items[:cand_c]:
                g_out.append(gkey)
                k_out.append(key)
                c_out.append(c)
        if not k_out:
            return
        arrays = ([pa.array(g_out)] if group_cols else []) + \
            [pa.array(k_out), pa.array(c_out, pa.int64())]
        yield pa.RecordBatch.from_arrays(
            arrays, names=group_cols + ["key", "local_count"])

    candidates = (pruned.drop("__kh")
                  .mapInArrow(local_candidates, schema=cand_schema)
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
