"""Document deduplication operators: exact, MinHash+LSH, SimHash, and exact
n-gram/word-set Jaccard (the oracle the approximate paths are tested against).

Scale shape: exact dedup is a hash-groupBy on a 64-bit JVM-side fingerprint
(shuffles 8-byte keys, never text).  MinHash/SimHash signatures are computed
in one mapInPandas pass over JVM-prehashed shingles; LSH banding turns the
quadratic pair search into an equi-join on (band, band_key) buckets, which
Catalyst shuffles like any other join key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_hll_spark.functions.hashing import splitmix64
from python_hll_spark.functions.text import doc_fingerprint


# ------------------------------------------------------------------ exact
def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact (normalized) content hash."""
    return (df
            .withColumn("__fp", doc_fingerprint(F.col(text_col)))
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dupes"))
            .drop("__fp"))


# --------------------------------------------------------------- shingles
def with_shingle_hashes(df: DataFrame, text_col: str = "text", n: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """(id, shingles array<bigint>): xxhash64 of word n-grams, JVM-side."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    if n == 1:
        sh = F.transform(words, lambda w: F.xxhash64(w))
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
        sh = F.transform(idx, lambda i: F.xxhash64(
            F.concat_ws(" ", F.slice(words, i + 1, n))))
    return df.select(F.col(id_col), F.array_distinct(sh).alias("shingles"))


# ---------------------------------------------------------------- MinHash
def minhash_signatures(df: DataFrame, text_col: str = "text", n: int = 3,
                       num_hashes: int = 128, id_col: str = "doc_id") -> DataFrame:
    """(id, sig array<bigint>): K permutation-minima over shingle hashes.

    Arrow-native: shingle lists flatten zero-copy; per-doc minima come from
    ``np.minimum.reduceat`` segment reductions — one vector hash pass per
    permutation across the whole batch, no per-row Python."""
    import pyarrow as pa

    shingled = with_shingle_hashes(df, text_col, n, id_col)

    def compute(batches):
        for batch in batches:
            sh = batch.column("shingles")
            if isinstance(sh, pa.ChunkedArray):
                sh = sh.combine_chunks()
            flat = sh.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            all_offsets = sh.offsets.to_numpy(zero_copy_only=False)
            lengths = np.diff(all_offsets)
            nonempty = lengths > 0
            base = all_offsets[0]
            offsets = (all_offsets[:-1][nonempty] - base).astype(np.int64)
            n_docs = len(lengths)
            sig_mat = np.full((n_docs, num_hashes), np.iinfo(np.int64).max,
                              dtype=np.int64)
            for k in range(num_hashes):
                if len(flat):
                    hk = splitmix64(flat, seed=k).view(np.uint64)
                    mins = np.minimum.reduceat(hk, offsets)
                    sig_mat[nonempty, k] = mins.astype(np.int64)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(list(sig_mat), pa.list_(pa.int64()))],
                names=[id_col, "sig"])

    id_type = dict(df.dtypes)[id_col]
    return shingled.mapInArrow(compute, schema=f"`{id_col}` {id_type}, sig array<bigint>")


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 32,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and self-join buckets -> (id_a, id_b, est_jaccard).

    est_jaccard = fraction of matching signature positions."""
    num_hashes = None  # derived per row; bands must divide it

    def band_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig_mat = np.stack([np.asarray(s, dtype=np.int64) for s in pdf["sig"]])
            n, K = sig_mat.shape
            r = K // bands
            keys = np.empty((n, bands), dtype=np.int64)
            for b in range(bands):
                chunk = sig_mat[:, b * r:(b + 1) * r]
                hashed = splitmix64(chunk.ravel(), seed=b).reshape(n, r)
                keys[:, b] = hashed.view(np.uint64).sum(axis=1).view(np.int64)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_key": keys.ravel(),
            })

    id_type = dict(sig_df.dtypes)[id_col]
    banded = sig_df.mapInPandas(
        band_rows, schema=f"`{id_col}` {id_type}, band int, band_key bigint")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (a.join(b, on=["band", "band_key"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())

    sig_a = sig_df.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig_df.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    match_frac = (F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                                  lambda v: v)) / F.size("sig_a"))
    return joined.select("id_a", "id_b",
                         F.round(match_frac, 6).alias("est_jaccard"))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                        num_hashes: int = 128, bands: int = 32,
                        threshold: float = 0.8, id_col: str = "doc_id") -> DataFrame:
    # signatures are read 3x downstream (banding + both join sides) and are
    # tiny (n_docs x num_hashes int64): persist instead of recomputing the
    # shingle+minhash pipeline per consumer
    sigs = minhash_signatures(df, text_col, n, num_hashes, id_col).persist()
    return (lsh_candidate_pairs(sigs, bands, id_col)
            .where(F.col("est_jaccard") >= threshold))


# ---------------------------------------------------------------- SimHash
def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, simhash bigint): 64-bit sign-sum fingerprint over word hashes."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    hashed = df.select(F.col(id_col),
                       F.transform(words, lambda w: F.xxhash64(w)).alias("wh"))

    def compute(batches):
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, arr in enumerate(pdf["wh"]):
                h = np.asarray(arr, dtype=np.int64).view(np.uint64)
                if len(h) == 0:
                    out[i] = 0
                    continue
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for bit in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(bit)
                out[i] = np.int64(sig.astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    id_type = dict(df.dtypes)[id_col]
    return hashed.mapInPandas(compute, schema=f"`{id_col}` {id_type}, simhash bigint")


def simhash_near_pairs(df: DataFrame, text_col: str = "text", max_hamming: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed on 16-bit chunks
    (two of four chunks must match exactly when distance <= 3)."""
    sigs = simhash_signatures(df, text_col, id_col).cache()
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftright(F.col("simhash"), 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias("ckey"))
            for i in range(4)])).alias("c")
    ).select(id_col, "simhash", "c.chunk", "c.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (a.join(b, on=["chunk", "ckey"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ------------------------------------------ duplicate-cluster resolution
def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components of an undirected (id_a, id_b) edge list via
    iterative min-label propagation — pure DataFrame joins, so Catalyst/AQE
    handle the shuffles and it scales with the cluster (no driver graphs).

    Returns (id, component) where component is the min member id.
    Converges in O(diameter) iterations; duplicate clusters are tiny, so
    a handful of iterations suffice (checkpointed via localCheckpoint to
    keep lineage bounded)."""
    both = (edges.select(F.col("id_a").alias("node"), F.col("id_b").alias("nbr"))
            .unionByName(edges.select(F.col("id_b").alias("node"),
                                      F.col("id_a").alias("nbr")))
            .localCheckpoint(eager=True))
    labels = (both.select("node").distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        nbr_labels = labels.select(F.col("node").alias("nbr"),
                                   F.col("component").alias("nbr_component"))
        neighbor_min = (both.join(nbr_labels, "nbr")
                        .groupBy("node")
                        .agg(F.min("nbr_component").alias("nbr_min")))
        updated = (labels.join(neighbor_min, "node", "left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce(F.col("nbr_min"), F.col("component")))
                           .alias("component"))
                   .localCheckpoint(eager=True))
        changed = (updated.withColumnRenamed("component", "new_component")
                   .join(labels, "node")
                   .where(F.col("new_component") != F.col("component")).count())
        labels = updated
        if changed == 0:
            break
    return labels.select(F.col("node").alias("id"), "component")


def near_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               threshold: float = 0.8, num_hashes: int = 128, bands: int = 32,
               n: int = 3) -> DataFrame:
    """Near-duplicate REMOVAL: MinHash-LSH pair discovery -> connected
    components -> keep the min-id representative per duplicate cluster.

    Returns the deduplicated rows of ``df`` (all original columns)."""
    pairs = minhash_dedup_pairs(df, text_col, n, num_hashes, bands, threshold,
                                id_col).select("id_a", "id_b")
    comps = connected_components(pairs)
    keep = comps.groupBy("component").agg(F.min("id").alias("keep_id"))
    drop_ids = (comps.join(keep, "component")
                .where(F.col("id") != F.col("keep_id"))
                .select(F.col("id").alias(id_col)))
    return df.join(drop_ids, on=id_col, how="left_anti")


# ------------------------------------------------- exact Jaccard (oracle)
def jaccard_word_pairs(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.5, id_col: str = "doc_id") -> DataFrame:
    """Exact word-set Jaccard pairs >= threshold (SQL-expressible oracle;
    shuffly — at 100TB you run minhash_dedup_pairs instead and verify a
    sample with this)."""
    words = (df.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
                    " "))).alias("w")))
    sizes = words.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = words.select(F.col(id_col).alias("id_a"), "w")
    b = words.select(F.col(id_col).alias("id_b"), "w")
    inter = (a.join(b, "w").where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
