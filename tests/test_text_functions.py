"""Text-analysis functions: winnowing fingerprints, stats, language-ID,
HLL intersection composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_hll_spark.functions.hashing import splitmix64
from python_hll_spark.functions.text import winnowing_fingerprints, with_text_stats
from python_hll_spark.sketches.hll import HLLConfig, HLLSketch, intersection_estimate

SF_DIR = "/root/testdata/sf0.01"


def test_winnowing_fingerprints_detect_containment(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    rows = [
        (1, base),
        (2, base),                                # exact dup
        (3, base + " with a small suffix added"),  # near dup / containment
        (4, "completely different content about sparkling distributed "
            "computation engines and their many merry sketches " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {r["doc_id"]: set(r["fingerprints"])
           for r in winnowing_fingerprints(df).collect()}
    assert fps[1] == fps[2]
    # near-dup shares most fingerprints
    overlap = len(fps[1] & fps[3]) / len(fps[1] | fps[3])
    assert overlap > 0.7, overlap
    # unrelated text shares almost none
    assert len(fps[1] & fps[4]) / len(fps[1] | fps[4]) < 0.1


def test_winnowing_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    a = {r["doc_id"]: list(r["fingerprints"])
         for r in winnowing_fingerprints(docs).collect()}
    b = {r["doc_id"]: list(r["fingerprints"])
         for r in winnowing_fingerprints(docs.repartition(5)).collect()}
    assert a == b


def test_hll_intersection_estimate():
    cfg = HLLConfig.create(13, 5)
    a, b = HLLSketch(cfg), HLLSketch(cfg)
    xs = splitmix64(np.arange(0, 60_000, dtype=np.int64))
    ys = splitmix64(np.arange(40_000, 100_000, dtype=np.int64))
    a.add_hashed(xs)
    b.add_hashed(ys)
    est = intersection_estimate(a, b)
    assert est == pytest.approx(20_000, rel=0.1)


def test_with_text_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog sat."), (2, ""), (3, "   ")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert rows[1]["n_words"] == 6
    assert rows[1]["n_ws_tokens"] == 6
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["n_words"] == 0
    assert rows[2]["n_ws_tokens"] == 0
    assert rows[3]["n_ws_tokens"] == 0
