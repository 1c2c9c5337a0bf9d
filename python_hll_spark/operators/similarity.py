"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side dot products (zip_with + aggregate,
  whole-stage codegen) against a broadcast probe set — the exactness
  baseline and the oracle for the bucketed variant.
- SRP-LSH (signed random projections) bucketed top-k: deterministic
  hyperplanes hash vectors to 2^p buckets; probes only scan their bucket
  (optionally hamming-1 neighbors), turning O(N) per probe into O(N/2^p).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, vec_a: str, vec_b: str,
                out: str = "cosine") -> DataFrame:
    a = F.transform(F.col(vec_a), lambda x: x.cast("double"))
    b = F.transform(F.col(vec_b), lambda x: x.cast("double"))
    return df.withColumn(out, F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6))


def brute_force_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each probe vector, exact cosine top-k over the corpus.

    probes: (probe_id, embedding). The probe side is broadcast — it is the
    small dimension by construction."""
    c = corpus.select(F.col(id_col), F.col(vec_col))
    p = probes.select(F.col("probe_id"), F.col(vec_col).alias("__pv"))
    crossed = c.crossJoin(F.broadcast(p))
    scored = with_cosine(crossed, vec_col, "__pv", out="cosine")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", id_col, "cosine", "rank"))


def _srp_planes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def srp_bucket_udf(dim: int, n_bits: int, seed: int = 42):
    planes = _srp_planes(dim, n_bits, seed)

    @F.pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return bucket


def srp_topk(corpus: DataFrame, probes: DataFrame, k: int = 10, n_bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, multiprobe: bool = True) -> DataFrame:
    """Approximate cosine top-k: SRP-bucketed equi-join then exact rescoring
    within buckets.  With multiprobe, each probe also scans hamming-1 buckets
    (recall boost at (n_bits+1)x candidate cost)."""
    dim = len(corpus.select(vec_col).first()[0])
    bucket = srp_bucket_udf(dim, n_bits, seed)

    c = corpus.select(id_col, vec_col).withColumn("bucket", bucket(F.col(vec_col)))
    p = probes.select("probe_id", F.col(vec_col).alias("__pv")) \
        .withColumn("bucket", bucket(F.col("__pv")))
    if multiprobe:
        flips = F.array(*[F.lit(0)] + [F.lit(1 << i) for i in range(n_bits)])
        p = (p.withColumn("flip", F.explode(flips))
             .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("flip")))
             .drop("flip"))
    joined = c.join(F.broadcast(p), on="bucket").drop("bucket")
    scored = with_cosine(joined, vec_col, "__pv", out="cosine") \
        .dropDuplicates(["probe_id", id_col])
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", id_col, "cosine", "rank"))


def embedding_dedup_pairs(df: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_bits: int = 8, seed: int = 42) -> DataFrame:
    """Near-duplicate vector pairs by cosine >= threshold, SRP-bucketed."""
    dim = len(df.select(vec_col).first()[0])
    bucket = srp_bucket_udf(dim, n_bits, seed)
    tagged = df.select(id_col, vec_col).withColumn("bucket", bucket(F.col(vec_col)))
    a = tagged.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = tagged.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = (a.join(b, "bucket").where(F.col("id_a") < F.col("id_b")).drop("bucket"))
    return (with_cosine(pairs, "va", "vb", out="cosine")
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
