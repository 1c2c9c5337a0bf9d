"""IVF coarse-quantizer ANN: determinism, self-retrieval invariant, recall
vs the exact brute-force baseline, and quantizer edge cases."""

import numpy as np
from pyspark.sql import functions as F

from python_hll_spark.operators.similarity import (
    _spherical_kmeans, brute_force_topk, ivf_topk, ivf_train)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_kmeans_deterministic_and_unit_norm():
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((512, 16))
    c1 = _spherical_kmeans(sample, 8, seed=7)
    c2 = _spherical_kmeans(sample, 8, seed=7)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    c3 = _spherical_kmeans(sample, 8, seed=8)
    assert not np.array_equal(c1, c3)


def test_kmeans_more_lists_than_points():
    sample = np.random.default_rng(1).standard_normal((5, 8))
    cent = _spherical_kmeans(sample, 64, seed=3)
    assert len(cent) == 5  # clamped, no crash


def test_ivf_self_retrieval_and_recall(spark):
    emb = _emb(spark)
    probes = (emb.orderBy("vec_id").limit(8)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    ivf = ivf_topk(emb, probes, k=5, n_lists=32, nprobe=8).collect()
    # invariant: a corpus vector probing itself lands at rank 1, cosine 1
    rank1 = {r["probe_id"]: r for r in ivf if r["rank"] == 1}
    for pid, r in rank1.items():
        assert r["vec_id"] == pid and abs(r["cosine"] - 1.0) < 1e-6
    exact = brute_force_topk(emb, probes, k=5).collect()
    e = {(r["probe_id"], r["vec_id"]) for r in exact}
    a = {(r["probe_id"], r["vec_id"]) for r in ivf}
    recall = len(e & a) / len(e)
    # random (clusterless) embeddings are IVF's worst case; seeded setup
    # measured 0.70+ here — assert a margin below that
    assert recall >= 0.5, recall


def test_ivf_deterministic_across_runs(spark):
    emb = _emb(spark)
    probes = (emb.orderBy("vec_id").limit(3)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    r1 = sorted((r["probe_id"], r["vec_id"], r["rank"])
                for r in ivf_topk(emb, probes, k=5, n_lists=16, nprobe=4).collect())
    r2 = sorted((r["probe_id"], r["vec_id"], r["rank"])
                for r in ivf_topk(emb, probes, k=5, n_lists=16, nprobe=4).collect())
    assert r1 == r2


def test_ivf_pretrained_centroids_reusable(spark):
    emb = _emb(spark)
    cent = ivf_train(emb, n_lists=16)
    assert cent.shape == (16, 64)
    probes = (emb.orderBy("vec_id").limit(2)
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    got = ivf_topk(emb, probes, k=3, n_lists=16, nprobe=4,
                   centroids=cent).collect()
    assert len(got) == 6
