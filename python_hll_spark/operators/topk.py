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

from python_hll_spark.functions.hashing import splitmix64
from python_hll_spark.operators.aggregate import merge_sketches
from python_hll_spark.sketches.cms import CMSConfig
from python_hll_spark.sketches.specs import CMSSpec


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    return splitmix64(keys.astype(np.int64, copy=False))




def cms_topk(df: DataFrame, group_cols: list[str], key_col: str, k: int = 10,
             cfg: CMSConfig | None = None, candidates_per_task: int = 64,
             shared_cms: bool = False) -> DataFrame:
    """Top-k ``key_col`` values per group with CMS frequency estimates.

    Works for any orderable key type: the CMS ingests the JVM-side
    ``xxhash64`` of the key; candidates carry the original key value.
    Returns (group..., key <input type>, est_count bigint, rank int).

    ``shared_cms=True`` is the HIGH-GROUP-ARITY mode: instead of one CMS
    per group (state = depth*width*8 bytes PER GROUP — at 10^3+ groups the
    partial shuffle is groups x MBs per task), a single CMS counts the
    composite ``xxhash64(group..., key)`` pair, making state size
    independent of group count.  Trade-off: the overcount bound becomes
    eps * N_TOTAL rather than eps * N_group.  Use it when groups are many
    and per-group volume is a small share of the stream.
    """
    cfg = cfg or CMSConfig(depth=5, width=65536)
    spec = CMSSpec(cfg)
    cand_c = max(candidates_per_task, 4 * k)
    # SpaceSaving bounded summary: the per-(task, group) candidate structure
    # never holds more than `cap` keys no matter how many distinct keys
    # stream through the task — the 100 TB memory guarantee.  True
    # SpaceSaving admission semantics: a key not currently tracked enters at
    # floor + count, where floor is the largest running count ever evicted
    # for that group.  That makes the tracked count an UPPER bound on the
    # key's true local frequency (error <= floor), so a heavy hitter that
    # surges late can never be starved out by early-accumulating keys —
    # plain restart-at-zero truncation does not provide that guarantee.
    # Final reported counts come from the CMS, so the admission inflation
    # never reaches the output.
    cap = 4 * cand_c

    if shared_cms:
        cms_hash = F.xxhash64(*[F.col(c) for c in group_cols], F.col(key_col))
    else:
        cms_hash = F.xxhash64(F.col(key_col))
    pruned = df.select(*group_cols, F.col(key_col).alias("__key"),
                       cms_hash.alias("__kh"))
    key_type = dict(pruned.dtypes)["__key"]

    # -- CMS partials + candidates, both Arrow-native ------------------------
    from python_hll_spark.operators.aggregate import (
        SplitmixSpec, dict_encode_groups, scalar_partials_arrow)

    if shared_cms:
        partials = scalar_partials_arrow(
            pruned.drop("__key").withColumn("__g", F.lit(0)), ["__g"],
            "__kh", SplitmixSpec(spec))
        states = merge_sketches(partials, ["__g"], spec).drop("__g")
        state_group_cols: list[str] = []
    else:
        partials = scalar_partials_arrow(pruned.drop("__key"), group_cols,
                                         "__kh", SplitmixSpec(spec))
        states = merge_sketches(partials, group_cols, spec)
        state_group_cols = list(group_cols)

    group_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                    for f in pruned.schema.fields if f.name in group_cols]
    cand_schema = ", ".join(group_fields + [f"key {key_type}", "local_count bigint"])

    def local_candidates(batches):
        """Per-task approximate local top-C via dictionary-encoded composite
        codes: one sort-unique per Arrow batch, no per-row Python; each
        group's summary is truncated to `cap` keys after every batch."""
        import pyarrow as pa
        per_group: dict = {}  # gkey tuple -> {key: running count}
        floors: dict = {}     # gkey tuple -> largest evicted count
        gtypes = ktype = None
        for batch in batches:
            if gtypes is None:
                gtypes = [batch.schema.field(c).type for c in group_cols]
                ktype = batch.schema.field("__key").type
            gcodes, gkeys = dict_encode_groups(batch, group_cols)
            kcol = batch.column("__key")
            if isinstance(kcol, pa.ChunkedArray):
                kcol = kcol.combine_chunks()
            kenc = kcol.dictionary_encode()
            kidx = kenc.indices
            kdict = kenc.dictionary.to_pylist()
            if kidx.null_count:
                kcodes = (kidx.fill_null(len(kdict))
                          .to_numpy(zero_copy_only=False).astype(np.int64))
                kdict = kdict + [None]
            else:
                kcodes = kidx.to_numpy(zero_copy_only=False).astype(np.int64)
            comp = gcodes * np.int64(len(kdict)) + kcodes
            uniq, cnts = np.unique(comp, return_counts=True)
            card = len(kdict)
            for code, c in zip(uniq.tolist(), cnts.tolist()):
                gkey = gkeys[code // card]
                key = kdict[code % card]
                d = per_group.setdefault(gkey, {})
                prev = d.get(key)
                # SpaceSaving admission: unseen keys inherit the group's
                # eviction floor so late-surging heavy hitters catch up
                d[key] = (floors.get(gkey, 0) + c) if prev is None else prev + c
            for gkey, d in per_group.items():
                if len(d) > cap:
                    items = sorted(d.items(), key=lambda kv: (-kv[1], str(kv[0])))
                    per_group[gkey] = dict(items[:cap])
                    floors[gkey] = max(floors.get(gkey, 0), items[cap][1])
        g_out, k_out, c_out = [], [], []
        for gkey, d in per_group.items():
            items = sorted(d.items(), key=lambda kv: (-kv[1], str(kv[0])))
            for key, c in items[:cand_c]:
                g_out.append(gkey)
                k_out.append(key)
                c_out.append(c)
        if not k_out:
            return
        arrays = [pa.array([g[i] for g in g_out], type=gtypes[i])
                  for i in range(len(group_cols))]
        arrays += [pa.array(k_out, type=ktype), pa.array(c_out, pa.int64())]
        yield pa.RecordBatch.from_arrays(
            arrays, names=group_cols + ["key", "local_count"])

    if shared_cms:
        cand_hash = F.xxhash64(*[F.col(c) for c in group_cols], F.col("key"))
    else:
        cand_hash = F.xxhash64(F.col("key"))
    candidates = (pruned.drop("__kh")
                  .mapInArrow(local_candidates, schema=cand_schema)
                  .groupBy(*group_cols, "key")
                  .agg(F.sum("local_count").alias("cand_count"))
                  .withColumn("__kh", cand_hash))

    # -- estimate candidates against the merged per-group CMS ----------------
    # A CMS state is depth*width*8 bytes (MBs at default width): joining it
    # as a DataFrame column would duplicate those MBs onto EVERY candidate
    # row through Arrow (at 97 groups x 256 candidates that is tens of GB
    # for a toy input).  Instead the per-group state table — one small blob
    # per group — is collected and sc.broadcast as a dict, and candidates
    # probe it inside mapInPandas (same pattern as membership.bloom_probe).
    import pandas as pd

    spark = df.sparkSession
    states_local = {
        tuple(r[c] for c in state_group_cols): bytes(r["state"])
        for r in states.select(*state_group_cols, "state").collect()}
    bstates = spark.sparkContext.broadcast(states_local)
    gcols = state_group_cols

    def probe(pdf_iter):
        from python_hll_spark.sketches.cms import CMSSketch
        cache: dict = {}
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            est = np.zeros(len(pdf), dtype=np.int64)
            if gcols:
                # normalize pandas NaN back to None so NULL groups hit
                # their state row (Spark groupBy keeps NULL groups)
                gtuples = [tuple(None if pd.isna(v) else v for v in t)
                           for t in pdf[gcols].itertuples(index=False)]
            else:
                gtuples = [()] * len(pdf)
            by_group: dict = {}
            for i, gt in enumerate(gtuples):
                by_group.setdefault(gt, []).append(i)
            hashes = pdf["__kh"].to_numpy(dtype=np.int64)
            for gt, idx in by_group.items():
                blob = bstates.value.get(gt)
                if blob is None:
                    continue
                sk = cache.get(gt)
                if sk is None:
                    sk = cache[gt] = CMSSketch.from_bytes(blob)
                est[idx] = sk.estimate(_hash_keys(hashes[idx]))
            yield pdf.assign(est_count=est)

    est_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in candidates.schema.fields] + ["est_count bigint"])
    estimated = candidates.mapInPandas(probe, schema=est_schema)

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
