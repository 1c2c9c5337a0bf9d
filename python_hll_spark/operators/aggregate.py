"""Distributed mergeable-sketch aggregation: the engine's core operator.

Why not a grouped-agg pandas UDF: PySpark's GROUPED_AGG UDFs shuffle *raw
rows* to the reducers (no partial aggregation), which is exactly what must
never happen at 10^12 rows.  This operator hand-builds the partial/final
split a native TypedImperativeAggregate would get from Catalyst:

  stage 1  mapInPandas     one in-memory sketch per (group) per task; one
                           vectorized numpy update per Arrow batch; emits one
                           tiny row (group, salt, state, lineage) per
                           partition x group.  The 100TB scan shuffles NOTHING.
  stage 2  groupBy(group, salt).applyInPandas(merge)   fan-in #partitions -> S
  stage 3  groupBy(group).applyInPandas(merge)         fan-in S -> 1 per group

Salting bounds the per-reducer fan-in for skewed groups (a 55%-of-corpus
source lands on S reducers, not one), per the explicit-skew-handling
requirement.  Merge rows are a few KB each (<= regwidth*m/8 + 3 bytes for
HLL), so stages 2-3 are trivially small no matter the input scale.
"""

from __future__ import annotations

from typing import Callable, Protocol

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SketchSpec(Protocol):
    """Mergeable-aggregator contract every sketch implements."""

    name: str

    def new(self): ...

    def update(self, state, values: np.ndarray) -> None:
        """Vectorized batch update (values: np.int64 for hashed inputs,
        or sketch-appropriate dtype)."""

    def merge(self, state, other) -> None:
        """Associative in-place union of ``other`` into ``state``."""

    def serialize(self, state) -> bytes: ...

    def deserialize(self, data: bytes): ...


Extractor = Callable[["pandas.DataFrame"], np.ndarray]  # noqa: F821


def dict_encode_groups(batch, group_cols: list[str]):
    """Dictionary-encode the group columns of one Arrow RecordBatch into
    dense int64 codes — the shared grouping kernel for every Arrow-native
    partial builder.

    Returns ``(codes, keys)``: ``codes`` is an int64 ndarray (one entry per
    batch row) with values in ``[0, len(keys))``; ``keys`` is a list of
    group-key tuples (one per distinct group present in the batch).

    Semantics match Spark ``groupBy``:
    - NULL group values form their own group (``None`` in the key tuple) —
      the indices array from ``dictionary_encode`` carries nulls, which
      would otherwise round-trip through float64 NaN and crash
      ``np.bincount``;
    - composite (multi-column) keys are combined pairwise mixed-radix and
      re-densified with ``np.unique`` after each combine, so intermediate
      products stay < batch_rows**2 and never overflow int64.
    """
    import pyarrow as pa

    if not group_cols:
        return np.zeros(batch.num_rows, dtype=np.int64), [()]
    per_col = []
    for name in group_cols:
        col = batch.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        idx = enc.indices
        vals = enc.dictionary.to_pylist()
        if idx.null_count:
            null_code = len(vals)
            codes = (idx.fill_null(null_code)
                     .to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
            vals = vals + [None]
        else:
            codes = idx.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        per_col.append((codes, vals))
    codes, vals = per_col[0]
    keys = [(v,) for v in vals]
    for codes_i, vals_i in per_col[1:]:
        comp = codes * np.int64(len(vals_i)) + codes_i
        uniq, codes = np.unique(comp, return_inverse=True)
        card = len(vals_i)
        keys = [keys[int(u) // card] + (vals_i[int(u) % card],)
                for u in uniq.tolist()]
    return codes, keys


def _partial_schema(df: DataFrame, group_cols: list[str]) -> str:
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields if f.name in group_cols]
    fields += ["salt int", "state binary", "n_rows bigint", "n_values bigint",
               "partition_id int"]
    return ", ".join(fields)


def sketch_partials(df: DataFrame, group_cols: list[str], extractor: Extractor,
                    spec: SketchSpec, n_salts: int = 16) -> DataFrame:
    """Stage 1: per-task partial sketches, one row per (task, group)."""
    import pandas as pd
    from pyspark import TaskContext

    out_schema = _partial_schema(df, group_cols)

    def build(batches):
        pid = TaskContext.get().partitionId()
        states: dict = {}
        counts: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                grouped = pdf.groupby(group_cols, sort=False).indices.items()
            else:
                grouped = [((), np.arange(len(pdf)))]
            for key, idx in grouped:
                if not isinstance(key, tuple):
                    key = (key,)
                sub = pdf.iloc[idx]
                values = extractor(sub)
                st = states.get(key)
                if st is None:
                    st = states[key] = spec.new()
                    counts[key] = [0, 0]
                spec.update(st, values)
                counts[key][0] += len(sub)
                counts[key][1] += len(values)
        rows = []
        for key, st in states.items():
            rows.append((*key, pid % n_salts, spec.serialize(st),
                         counts[key][0], counts[key][1], pid))
        cols = group_cols + ["salt", "state", "n_rows", "n_values", "partition_id"]
        yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(build, schema=out_schema)


def token_partials_arrow(df: DataFrame, group_cols: list[str], token_col: str,
                         spec: SketchSpec, n_salts: int = 16,
                         hash_seed: int = 0) -> DataFrame:
    """Stage 1 specialized for token-array columns, Arrow-native.

    ``mapInArrow`` skips the Arrow->pandas list-column conversion (which
    materializes one numpy object PER ROW) and flattens the ListArray
    zero-copy — 4-5x faster per core, within ~1.5x of the raw parquet scan.
    Group keys (any arity, NULLs included) go through ``dict_encode_groups``;
    output schema matches ``sketch_partials`` so the same merge stages apply.
    """
    import pyarrow as pa
    from pyspark import TaskContext

    from python_hll_spark.functions.hashing import splitmix64
    from python_hll_spark.sketches.hll import (HLLSketch, HLLType,
                                               _rho_and_index, _scatter_max)

    out_schema = _partial_schema(df.select(*group_cols, token_col), group_cols)
    pruned = df.select(*group_cols, token_col)

    CHUNK = 131072  # ~1MB int64 temps: L2/L3-resident hash+scatter pipeline
    #                 (measured optimum; 32 workers then scale on cores
    #                 instead of queueing on DRAM bandwidth)

    def build(batches):
        pid = TaskContext.get().partitionId()
        states: dict = {}
        counts: dict = {}
        gtypes = None
        for batch in batches:
            if gtypes is None:
                gtypes = [batch.schema.field(c).type for c in group_cols]
            tok = batch.column(token_col)
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            flat = tok.flatten().to_numpy(zero_copy_only=False)
            lengths = np.diff(tok.offsets.to_numpy(zero_copy_only=False))
            codes, keys = dict_encode_groups(batch, group_cols)
            n_groups = len(keys)
            row_counts = np.bincount(codes, minlength=n_groups)
            for g, key in enumerate(keys):
                if key not in states:
                    states[key] = spec.new()
                    counts[key] = [0, 0]
                counts[key][0] += int(row_counts[g])
            if n_groups <= 1:
                # single group in this batch (incl. ungrouped): no sort pass
                if n_groups == 0:
                    continue
                key, st = keys[0], states[keys[0]]
                for start in range(0, len(flat), CHUNK):
                    hashed = splitmix64(flat[start:start + CHUNK].astype(np.int64),
                                        seed=hash_seed)
                    spec.update(st, hashed)
                counts[key][1] += len(flat)
                continue
            value_groups = np.repeat(codes, lengths)
            sts = [states[k] for k in keys]
            if all(isinstance(s, HLLSketch) and s.type == HLLType.FULL
                   for s in sts):
                # all-FULL fast path (every batch after the states promote,
                # i.e. the 100TB steady state): ONE fused rho/scatter-max
                # over the whole chunk into a stacked (group, register)
                # block via a combined index — the per-chunk stable argsort
                # separation (~35% of kernel time at 5 groups) disappears.
                # Scatter-max is order-independent, FULL states never
                # re-check promotion, and counts are exact, so the partial
                # rows are byte-identical to the sorted path's.
                m = sts[0].cfg.m
                stacked = np.empty((n_groups, m), dtype=np.uint8)
                for g, s in enumerate(sts):
                    stacked[g] = s.regs
                stacked_flat = stacked.ravel()
                for start in range(0, len(flat), CHUNK):
                    sl = slice(start, start + CHUNK)
                    hashed = splitmix64(flat[sl].astype(np.int64),
                                        seed=hash_seed)
                    j, rho = _rho_and_index(sts[0].cfg, hashed)
                    j += value_groups[sl] * m
                    _scatter_max(stacked_flat, j, rho)
                vcnt = np.bincount(codes, weights=lengths,
                                   minlength=n_groups).astype(np.int64)
                for g, (key, s) in enumerate(zip(keys, sts)):
                    s.regs[:] = stacked[g]
                    counts[key][1] += int(vcnt[g])
                continue
            for start in range(0, len(flat), CHUNK):
                sl = slice(start, start + CHUNK)
                hashed = splitmix64(flat[sl].astype(np.int64), seed=hash_seed)
                vg = value_groups[sl]
                # counting-sort separation: one stable argsort pass,
                # then each group's values are a contiguous view
                order = np.argsort(vg, kind="stable")
                hashed = hashed[order]
                bounds = np.zeros(n_groups + 1, dtype=np.int64)
                np.cumsum(np.bincount(vg, minlength=n_groups), out=bounds[1:])
                for g, key in enumerate(keys):
                    vals = hashed[bounds[g]:bounds[g + 1]]
                    if len(vals) == 0:
                        continue
                    spec.update(states[key], vals)
                    counts[key][1] += len(vals)
        if not states:
            return
        keys = list(states)
        arrays, names = [], []
        for i, gcol in enumerate(group_cols):
            arrays.append(pa.array([k[i] for k in keys], type=gtypes[i]))
            names.append(gcol)
        arrays += [
            pa.array([pid % n_salts] * len(keys), pa.int32()),
            pa.array([spec.serialize(states[k]) for k in keys], pa.binary()),
            pa.array([counts[k][0] for k in keys], pa.int64()),
            pa.array([counts[k][1] for k in keys], pa.int64()),
            pa.array([pid] * len(keys), pa.int32()),
        ]
        names += ["salt", "state", "n_rows", "n_values", "partition_id"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return pruned.mapInArrow(build, schema=out_schema)


class SplitmixSpec:
    """Wrap any hashed-input spec so stage-1 updates splitmix-finalize raw
    int64 (e.g. xxhash64) values first — keeps Arrow builders and probe
    UDFs on the same hashed stream."""

    def __init__(self, inner: SketchSpec):
        self._inner = inner
        self.name = inner.name

    def new(self):
        return self._inner.new()

    def update(self, state, values: np.ndarray) -> None:
        from python_hll_spark.functions.hashing import splitmix64
        self._inner.update(state, splitmix64(values))

    def merge(self, state, other) -> None:
        self._inner.merge(state, other)

    def serialize(self, state) -> bytes:
        return self._inner.serialize(state)

    def deserialize(self, data: bytes):
        return self._inner.deserialize(data)


def scalar_partials_arrow(df: DataFrame, group_cols: list[str], value_col: str,
                          spec: SketchSpec, n_salts: int = 16,
                          dtype=np.int64) -> DataFrame:
    """Stage 1 for scalar value columns (pre-hashed int64 keys, or float64
    measures for quantile sketches), Arrow-native: skips the Arrow->pandas
    conversion entirely and groups via dictionary-encoded codes + counting
    sort.  Group keys of any arity (NULLs included) via dict_encode_groups.

    NULL *values* are excluded from the sketch (countDistinct semantics)
    but their groups still emit a state row — a group whose values are all
    NULL reports an empty sketch, not a missing row.  The null mask is
    applied via ``fill_null(0)`` + boolean select so int64 hashes never
    round-trip through float64 (which would corrupt high bits)."""
    import pyarrow as pa
    from pyspark import TaskContext

    out_schema = _partial_schema(df.select(*group_cols, value_col), group_cols)
    pruned = df.select(*group_cols, value_col)

    def build(batches):
        pid = TaskContext.get().partitionId()
        states: dict = {}
        counts: dict = {}
        gtypes = None
        for batch in batches:
            if gtypes is None:
                gtypes = [batch.schema.field(c).type for c in group_cols]
            col = batch.column(value_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.null_count:
                vmask = col.is_valid().to_numpy(zero_copy_only=False)
                values = (col.fill_null(0).to_numpy(zero_copy_only=False)
                          .astype(dtype, copy=False))
            else:
                vmask = None
                values = col.to_numpy(zero_copy_only=False).astype(dtype, copy=False)
            codes, keys = dict_encode_groups(batch, group_cols)
            n_groups = len(keys)
            if n_groups == 0:
                continue
            row_counts = np.bincount(codes, minlength=n_groups)
            for g, key in enumerate(keys):
                if key not in states:
                    states[key] = spec.new()
                    counts[key] = [0, 0]
                counts[key][0] += int(row_counts[g])
            if vmask is not None:
                values = values[vmask]
                codes = codes[vmask]
            if n_groups == 1:
                key = keys[0]
                if len(values):
                    spec.update(states[key], values)
                    counts[key][1] += len(values)
                continue
            order = np.argsort(codes, kind="stable")
            values = values[order]
            bounds = np.zeros(n_groups + 1, dtype=np.int64)
            np.cumsum(np.bincount(codes, minlength=n_groups), out=bounds[1:])
            for g, key in enumerate(keys):
                vals = values[bounds[g]:bounds[g + 1]]
                if len(vals) == 0:
                    continue
                spec.update(states[key], vals)
                counts[key][1] += len(vals)
        if not states:
            return
        keys = list(states)
        arrays, names = [], []
        for i, gcol_name in enumerate(group_cols):
            arrays.append(pa.array([k[i] for k in keys], type=gtypes[i]))
            names.append(gcol_name)
        arrays += [
            pa.array([pid % n_salts] * len(keys), pa.int32()),
            pa.array([spec.serialize(states[k]) for k in keys], pa.binary()),
            pa.array([counts[k][0] for k in keys], pa.int64()),
            pa.array([counts[k][1] for k in keys], pa.int64()),
            pa.array([pid] * len(keys), pa.int32()),
        ]
        names += ["salt", "state", "n_rows", "n_values", "partition_id"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return pruned.mapInArrow(build, schema=out_schema)


def merge_sketches(partials: DataFrame, group_cols: list[str],
                   spec: SketchSpec, two_level: bool | str = "auto") -> DataFrame:
    """Stages 2+3: salted tree merge down to one state row per group.

    ``two_level="auto"`` (default) keeps the salt level only when the
    partial frame has enough upstream partitions for per-group fan-in to
    matter (> 64): a thousand-task 100 TB scan still tree-merges, while a
    small scan skips one shuffle + Python stage whose per-group input
    would have been a handful of rows anyway.  The decision reads the
    plan's partitioning, not the data — no extra job."""
    import pandas as pd

    group_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                    for f in partials.schema.fields if f.name in group_cols]
    merged_schema = ", ".join(group_fields + [
        "state binary", "n_rows bigint", "n_values bigint", "n_partials bigint"])

    def merge_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = spec.deserialize(bytes(pdf["state"].iloc[0]))
        for raw in pdf["state"].iloc[1:]:
            spec.merge(acc, spec.deserialize(bytes(raw)))
        n_partials = (pdf["n_partials"].sum() if "n_partials" in pdf.columns
                      else len(pdf))
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row.update({
            "state": [spec.serialize(acc)],
            "n_rows": [pdf["n_rows"].sum()],
            "n_values": [pdf["n_values"].sum()],
            "n_partials": [n_partials],
        })
        return pd.DataFrame(row)

    if two_level == "auto":
        try:
            two_level = partials.rdd.getNumPartitions() > 64
        except Exception:
            two_level = True
    lvl = partials
    if two_level and "salt" in partials.columns:
        lvl = (partials
               .groupBy(*(group_cols + ["salt"]))
               .applyInPandas(merge_fn, schema=merged_schema))
    return lvl.groupBy(*group_cols).applyInPandas(merge_fn, schema=merged_schema)


def sketch_groupby(df: DataFrame, group_cols: list[str], extractor: Extractor,
                   spec: SketchSpec, n_salts: int = 16) -> DataFrame:
    """End-to-end: DataFrame -> one serialized sketch state per group."""
    partials = sketch_partials(df, group_cols, extractor, spec, n_salts=n_salts)
    return merge_sketches(partials, group_cols, spec)


def sketch_global(df: DataFrame, extractor: Extractor, spec: SketchSpec,
                  n_salts: int = 16) -> DataFrame:
    """Ungrouped variant: one state row total."""
    partials = sketch_partials(
        df.withColumn("__g", F.lit(0)), ["__g"], extractor, spec, n_salts=n_salts)
    return merge_sketches(partials, ["__g"], spec).drop("__g")
