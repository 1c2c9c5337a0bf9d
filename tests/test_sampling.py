"""Deterministic sampling/splitting operators."""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.sampling import bottomk_sample, hash_split


@pytest.fixture()
def ids(spark):
    return spark.range(0, 5000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"))


def test_bottomk_exact_count_and_deterministic(spark, ids):
    s1 = bottomk_sample(ids, 25, by=["source"], seed=7)
    s2 = bottomk_sample(ids.repartition(13), 25, by=["source"], seed=7)
    a = sorted(r["doc_id"] for r in s1.collect())
    b = sorted(r["doc_id"] for r in s2.collect())
    assert a == b  # partitioning-independent
    per = {r["source"]: r["n"] for r in
           s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 25, "1": 25, "2": 25, "3": 25}


def test_bottomk_small_group_takes_all(spark):
    df = spark.createDataFrame([(f"d{i}", "g") for i in range(3)],
                               "doc_id string, source string")
    assert bottomk_sample(df, 10, by=["source"]).count() == 3


def test_bottomk_roughly_uniform(spark, ids):
    """Sampled numeric ids should cover the range, not cluster."""
    s = bottomk_sample(ids, 500, by=[], seed=1)
    nums = [int(r["doc_id"][1:]) for r in s.collect()]
    assert len(nums) == 500
    mean = sum(nums) / len(nums)
    assert 2000 < mean < 3000  # population mean 2499.5


def test_bottomk_plan_narrow_window_broadcast_semijoin(spark):
    """The ranking window must scan only (group, id) — wide payload columns
    never shuffle — and winners come back as a broadcast semi-join."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = bottomk_sample(docs, 5, by=["source"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    schemas = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    assert any("text" not in s for s in schemas), schemas


def test_bottomk_prune_is_lossless(spark, ids):
    """The per-partition local prune must pick the EXACT same winners as
    the unpruned window (it only drops rows that cannot win)."""
    pruned = sorted(r["doc_id"] for r in
                    bottomk_sample(ids, 25, by=["source"], seed=7,
                                   prune=True).collect())
    full = sorted(r["doc_id"] for r in
                  bottomk_sample(ids, 25, by=["source"], seed=7,
                                 prune=False).collect())
    assert pruned == full


def test_weighted_prune_is_lossless(spark):
    from python_hll_spark.operators.sampling import weighted_sample

    rows = [(f"d{i}", str(i % 3), float(1 + i % 7)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, w double") \
        .repartition(11)
    a = sorted(r["doc_id"] for r in
               weighted_sample(df, 20, "w", by=["grp"], seed=4,
                               prune=True).collect())
    b = sorted(r["doc_id"] for r in
               weighted_sample(df, 20, "w", by=["grp"], seed=4,
                               prune=False).collect())
    assert a == b


def test_local_prune_bounds_window_input(spark):
    """After the narrow prune, the ranking window sees at most
    k x partitions rows per group — never the group's full population."""
    from python_hll_spark.operators.sampling import _local_topk_prune

    k, nparts = 5, 8
    df = spark.range(0, 2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("g").alias("source"),
        F.xxhash64("id").alias("__key")).repartition(nparts)
    pruned = _local_topk_prune(df, ["source"], k, "__key", "doc_id",
                               ascending=True)
    n = pruned.count()
    assert n <= k * nparts, n   # 40 max, vs 2000 unpruned
    # and the global bottom-k survives the prune
    want = sorted((r["__key"], r["doc_id"]) for r in df.collect())[:k]
    got = sorted((r["__key"], r["doc_id"]) for r in pruned.collect())[:k]
    assert got == want


def test_local_prune_descending_string_key(spark):
    """Descending prune on a non-numeric key (string) must keep the global
    lexicographic top-k — the negation shortcut only exists for numeric
    dtypes, everything else goes through the factorize fallback."""
    from python_hll_spark.operators.sampling import _local_topk_prune

    k, nparts = 3, 6
    df = spark.range(0, 500).select(
        F.concat(F.lit("d"), F.format_string("%04d", F.col("id")))
        .alias("doc_id"),
        F.lit("g").alias("source"),
        F.md5(F.col("id").cast("string")).alias("__key")).repartition(nparts)
    pruned = _local_topk_prune(df, ["source"], k, "__key", "doc_id",
                               ascending=False)
    assert pruned.count() <= k * nparts
    want = sorted([(r["__key"], r["doc_id"]) for r in df.collect()],
                  reverse=True)[:k]
    got = sorted(((r["__key"], r["doc_id"]) for r in pruned.collect()),
                 reverse=True)[:k]
    assert got == want


def test_hash_split_stable_under_append(spark, ids):
    base = hash_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    assign1 = {r["doc_id"]: r["split"] for r in base.collect()}
    more = spark.range(5000, 6000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("9").alias("source"))
    again = hash_split(ids.unionByName(more),
                       {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    assign2 = {r["doc_id"]: r["split"] for r in again.collect()}
    for k, v in assign1.items():
        assert assign2[k] == v  # appends never move existing rows
    # fractions roughly honored
    counts = {r["split"]: r["n"] for r in
              again.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 6000 - 0.8) < 0.03
    assert set(counts) == {"train", "val", "test"}


def test_hash_split_no_shuffle(spark, ids):
    plan = hash_split(ids, {"a": 0.5, "b": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_validates_fractions(spark, ids):
    with pytest.raises(ValueError, match="sum"):
        hash_split(ids, {"train": 0.5, "test": 0.2})


def test_hash_sample_deterministic_zero_shuffle(spark, ids):
    from python_hll_spark.operators.sampling import hash_sample

    s1 = {r["doc_id"] for r in hash_sample(ids, 0.2, seed=5).collect()}
    s2 = {r["doc_id"] for r in
          hash_sample(ids.repartition(9), 0.2, seed=5).collect()}
    assert s1 == s2
    assert abs(len(s1) / 5000 - 0.2) < 0.03
    plan = hash_sample(ids, 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(ids, 1.5)


def test_mixture_sample_hits_targets(spark):
    from python_hll_spark.operators.sampling import mixture_sample

    rows = [(f"a{i}", "a") for i in range(400)] + \
           [(f"b{i}", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    sampled, plan = mixture_sample(df, {"a": 0.5, "b": 0.5}, seed=6)
    # T = min(400/.5, 100/.5) = 200 -> b keeps ALL 100, a samples at 0.25
    assert plan["b"]["rate"] == 1.0 and abs(plan["a"]["rate"] - 0.25) < 1e-9
    counts = {r["source"]: r["n"] for r in
              sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 100
    assert abs(counts["a"] - 100) < 30  # binomial 4-sigma ~ 35
    # deterministic under repartitioning
    again, _ = mixture_sample(df.repartition(7), {"a": 0.5, "b": 0.5}, seed=6)
    assert sorted(r["doc_id"] for r in sampled.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    with pytest.raises(ValueError, match="absent"):
        mixture_sample(df, {"a": 0.5, "zzz": 0.5})


def test_length_buckets_equal_population(spark):
    from python_hll_spark.operators.quantiles import length_buckets

    df = spark.range(0, 8000).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 10000).cast("double").alias("len"))
    out = length_buckets(df, "len", n_buckets=4)
    counts = {r["bucket"]: r["n"] for r in
              out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    for b, n in counts.items():
        assert abs(n - 2000) < 150, (b, n)  # 3x rank error @k=200 + slack
    with pytest.raises(ValueError, match="n_buckets"):
        length_buckets(df, "len", n_buckets=1)


def test_weighted_sample_biases_toward_heavy(spark):
    from python_hll_spark.operators.sampling import weighted_sample

    rows = [(f"h{i}", "g", 10.0) for i in range(100)] + \
           [(f"l{i}", "g", 1.0) for i in range(100)] + \
           [(f"z{i}", "g", 0.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, w double")
    s = weighted_sample(df, 50, "w", by=["grp"], seed=2)
    got = [r["doc_id"] for r in s.collect()]
    assert len(got) == 50
    assert not any(d.startswith("z") for d in got)  # zero weight never drawn
    heavy = sum(1 for d in got if d.startswith("h"))
    assert heavy > 30  # 10x weights dominate the draw
    # deterministic across partitionings
    again = sorted(r["doc_id"] for r in
                   weighted_sample(df.repartition(7), 50, "w",
                                   by=["grp"], seed=2).collect())
    assert sorted(got) == again


def test_bottomk_null_group_keys(spark):
    """NULL group keys must form their own group through the Arrow prune
    (dictionary_encode null handling) and match the unpruned window."""
    from python_hll_spark.operators.sampling import bottomk_sample

    rows = [(i, None if i % 3 == 0 else f"s{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string") \
        .repartition(8)
    a = sorted(r["doc_id"] for r in
               bottomk_sample(df, 5, by=["source"], prune=True).collect())
    b = sorted(r["doc_id"] for r in
               bottomk_sample(df, 5, by=["source"], prune=False).collect())
    assert a == b
    got = bottomk_sample(df, 5, by=["source"], prune=True).collect()
    assert sum(1 for r in got if r["source"] is None) == 5
