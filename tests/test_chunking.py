"""Context-window chunking: chunk-count/width laws, overlap
reconstruction, text-path re-join, empty-doc handling, zero-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.chunking import (
    chunk_text_words, chunk_tokens, reconstruct_ok)


def _seqs(spark, lens, start_tok=0):
    rows = []
    t = start_tok
    for i, n in enumerate(lens):
        rows.append((f"d{i}", list(range(t, t + n))))
        t += n
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def _expect_chunks(n, window, stride):
    if n <= window:
        return 1
    return (n - window + stride - 1) // stride + 1


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 3), (16, 1), (5, 5)])
def test_chunk_count_and_width_laws(spark, window, stride):
    lens = [1, 4, window - 1, window, window + 1, 3 * window, 57]
    out = (chunk_tokens(_seqs(spark, lens), window, stride)
           .groupBy("doc_id")
           .agg(F.count("*").alias("nc"), F.max("chunk_len").alias("mx"),
                F.min("chunk_len").alias("mn"),
                F.sum(F.when(F.col("chunk_len") != window, 1)
                      .otherwise(0)).alias("n_short"))
           .collect())
    by_id = {r["doc_id"]: r for r in out}
    for i, n in enumerate(lens):
        r = by_id[f"d{i}"]
        assert r["nc"] == _expect_chunks(n, window, stride), (n, window, stride)
        assert r["mx"] <= window
        # at most the LAST chunk may be short
        assert r["n_short"] <= 1


def test_reconstruction_exact(spark):
    lens = [1, 7, 8, 9, 30, 100]
    df = _seqs(spark, lens)
    chunked = chunk_tokens(df, 8, 3)
    audit = reconstruct_ok(chunked, df, 8, 3).collect()
    assert len(audit) == len(lens)
    assert all(r["ok"] for r in audit)
    # tok_total law: n + (n_chunks-1)*(window-stride)
    for r in audit:
        n = dict(zip([f"d{i}" for i in range(len(lens))], lens))[r["doc_id"]]
        assert r["tok_total"] == n + (r["n_chunks"] - 1) * (8 - 3)


def test_disjoint_default_stride_partitions_tokens(spark):
    df = _seqs(spark, [23])
    out = chunk_tokens(df, 8).orderBy("chunk_idx").collect()
    flat = [t for r in out for t in r["chunk"]]
    assert flat == list(range(23))  # disjoint chunks tile the doc exactly


def test_empty_docs_dropped_or_kept(spark):
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [])], "doc_id string, tokens array<int>")
    assert chunk_tokens(df, 4).where(F.col("doc_id") == "b").count() == 0
    kept = chunk_tokens(df, 4, drop_empty=False) \
        .where(F.col("doc_id") == "b").collect()
    assert len(kept) == 1 and kept[0]["chunk"] == [] \
        and kept[0]["chunk_len"] == 0


def test_chunk_text_words_rejoin(spark):
    df = spark.createDataFrame(
        [("a", "one two three four five six seven"),
         ("b", "  ..?! --- ~~  "),
         ("c", "x " * 9)],
        "doc_id string, text string")
    out = chunk_text_words(df, 3, 2)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    assert rows[("a", 0)]["chunk_text"] == "one two three"
    assert rows[("a", 1)]["chunk_text"] == "three four five"
    # 7 words, window 3, stride 2 -> chunks at 0,2,4 -> last covers 4..6
    assert rows[("a", 2)]["chunk_text"] == "five six seven"
    assert ("b", 0) not in rows  # no [A-Za-z0-9]+ runs -> emits nothing
    # 9 words -> starts 0,2,4,6 ; last chunk 3 wide (6..8)
    assert sum(1 for k in rows if k[0] == "c") == 4


def test_invalid_params(spark):
    df = _seqs(spark, [4])
    for w, s in ((0, 1), (4, 0), (4, 5), (-1, -1)):
        with pytest.raises(ValueError):
            chunk_tokens(df, w, s)


def test_chunking_zero_shuffle_plan(spark):
    plan = chunk_tokens(_seqs(spark, [10, 20]), 8, 4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
