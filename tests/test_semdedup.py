"""SemDeDup (cluster-partitioned semantic dedup): duplicate-injection
removal, brute-force parity when everything shares a cluster, oversize-star
degradation, determinism, and the SRP-path refactor staying byte-stable."""

import numpy as np
from pyspark.sql import functions as F

from python_hll_spark.operators.similarity import (
    embedding_dedup_pairs, semdedup, semdedup_pairs, with_cosine)


def _emb(spark):
    return (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
            .select("vec_id", "embedding"))


def _with_dups(emb, shift=1_000_000):
    dup = emb.select((F.col("vec_id") + shift).alias("vec_id"), "embedding")
    return emb.unionByName(dup)


def test_semdedup_drops_injected_duplicates_keeps_originals(spark):
    emb = _emb(spark)
    n = emb.count()
    kept = semdedup(_with_dups(emb), n_clusters=16, threshold=0.99, seed=42)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    orig_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    # identical vectors share a nearest centroid -> pair found -> min-id
    # (the original) is the survivor; no natural pair reaches cosine 0.99
    assert kept_ids == orig_ids
    assert kept.count() == n


def test_semdedup_pairs_match_brute_force_single_cluster(spark):
    # n_clusters=1 puts every vector in one cell: the within-cluster pass
    # must equal the exact all-pairs cosine filter
    emb = _emb(spark).limit(120)
    pairs = semdedup_pairs(_with_dups(emb), n_clusters=1, threshold=0.9,
                           max_cluster=100_000)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("va"))
    b = _with_dups(emb).select(F.col("vec_id").alias("id_b"),
                               F.col("embedding").alias("vb"))
    brute = (with_cosine(a.crossJoin(b), "va", "vb", out="cosine")
             .where((F.col("id_a") < F.col("id_b"))
                    & (F.col("cosine") >= 0.9)))
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert got == want and len(want) >= 120  # at least the injected pairs


def test_semdedup_oversize_cluster_star_keeps_dup_connectivity(spark):
    # force the star fallback (one cluster, tiny cap) on an exact-duplicate
    # flood: copies of the representative stay connected through it
    base = _emb(spark).limit(50)
    rep_vec = base.orderBy("vec_id").limit(1)
    copies = rep_vec.crossJoin(
        spark.range(1, 40).select((F.col("id") + 10_000_000).alias("cid"))) \
        .select(F.col("cid").alias("vec_id"), "embedding")
    df = base.unionByName(copies)
    kept = semdedup(df, n_clusters=1, threshold=0.99, max_cluster=8)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every injected copy of the min-id representative is dropped
    assert not any(i >= 10_000_000 for i in kept_ids)
    base_ids = {r["vec_id"] for r in base.select("vec_id").collect()}
    assert base_ids <= kept_ids | {min(base_ids)}
    assert min(base_ids) in kept_ids


def test_semdedup_deterministic(spark):
    emb = _emb(spark).limit(200)
    df = _with_dups(emb)
    k1 = sorted(r["vec_id"]
                for r in semdedup(df, n_clusters=8, threshold=0.99,
                                  seed=7).collect())
    k2 = sorted(r["vec_id"]
                for r in semdedup(df, n_clusters=8, threshold=0.99,
                                  seed=7).collect())
    assert k1 == k2


def test_srp_dedup_pairs_unchanged_after_refactor(spark):
    # the shared _capped_cosine_pairs helper must reproduce the pre-refactor
    # SRP results (pinned by the existing dup-recall oracle; this pins the
    # small/large split too)
    emb = _emb(spark)
    pairs = embedding_dedup_pairs(_with_dups(emb), threshold=0.99, dim=64)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(r["vec_id"], r["vec_id"] + 1_000_000)
            for r in emb.select("vec_id").collect()}
    assert want <= found
    assert all(b == a + 1_000_000 for a, b in found)
