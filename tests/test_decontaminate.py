"""Eval-set decontamination: exact and near tiers."""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.decontaminate import (
    contamination_exact, contamination_near, decontaminate,
    decontaminate_exact)


@pytest.fixture()
def corpus(spark):
    base = [(i, f"unique document number {i} with some distinct words "
                f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
            for i in range(100)]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_decontamination(spark, corpus):
    # eval = exact copies of docs 10..19 under new ids
    eval_df = corpus.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)) \
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    dirty = contamination_exact(corpus, eval_df)
    assert sorted(r["doc_id"] for r in dirty.collect()) == list(range(10, 20))
    clean = decontaminate_exact(corpus, eval_df)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert kept == [i for i in range(100) if not 10 <= i < 20]


def test_near_decontamination_catches_mutations(spark, corpus):
    # eval docs are near-copies: one word changed out of ~10
    ev = corpus.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extrafinaltoken")).alias("text"))
    pairs = contamination_near(corpus, ev, threshold=0.5,
                               num_hashes=64, bands=32)
    got = {(r["train_id"], r["eval_id"]) for r in pairs.collect()}
    assert got == {(i, i + 1000) for i in range(5)}

    clean = decontaminate(corpus, ev, threshold=0.5,
                          num_hashes=64, bands=32)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert kept == list(range(5, 100))


def test_disjoint_eval_removes_nothing(spark, corpus):
    ev = spark.createDataFrame(
        [(9999, "completely different evaluation material zeta eta theta")],
        "doc_id long, text string")
    assert decontaminate(corpus, ev, threshold=0.5).count() == 100
