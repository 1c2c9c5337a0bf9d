"""Exact substring-span dedup (``dedup_spans_tokens``): the ExactSubstr
tier — every k-token window occurring >= min_count times corpus-wide is
removed from every doc, overlapping windows merged into maximal spans.

Reference semantics: Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"), remove-all-occurrences variant (the released
tool's default; order-free, hence deterministic under any partitioning).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.dedup import dedup_spans_tokens


def _run(spark, rows, k=4, **kw):
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = dedup_spans_tokens(df, k=k, **kw).orderBy("doc_id").collect()
    return {r.doc_id: r for r in out}


def test_cross_doc_shared_run_removed_from_both(spark):
    got = _run(spark, [
        (1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        (2, [99, 98, 5, 6, 7, 8, 9, 10, 50, 51]),
        (3, [20, 21, 22, 23, 24, 25]),
    ])
    # 5..10 shared: 3 windows each, merged to one span, ALL copies removed
    assert got[1].tokens == [1, 2, 3, 4]
    assert (got[1].n_dup_windows, got[1].n_dup_spans,
            got[1].n_tokens_removed) == (3, 1, 6)
    assert got[2].tokens == [99, 98, 50, 51]
    assert got[2].n_tokens_removed == 6
    assert got[3].tokens == [20, 21, 22, 23, 24, 25]
    assert got[3].n_dup_windows == 0 and got[3].n_tokens_removed == 0


def test_within_doc_repeat_counts_and_adjacent_spans_merge(spark):
    got = _run(spark, [(5, [30, 31, 32, 33, 30, 31, 32, 33, 77])])
    # the 4-gram repeats at starts 1 and 5; [1,4]+[5,8] adjacent -> [1,8]
    assert got[5].tokens == [77]
    assert (got[5].n_dup_windows, got[5].n_dup_spans,
            got[5].n_tokens_removed) == (2, 1, 8)


def test_doc_shorter_than_k_untouched(spark):
    got = _run(spark, [(1, [1, 2, 3]), (2, [1, 2, 3])])
    # identical docs, but no k=4 window exists — substring dedup is the
    # tier BELOW whole-doc dedup, it must not invent windows
    assert got[1].tokens == [1, 2, 3] and got[2].tokens == [1, 2, 3]
    assert got[1].n_dup_windows == 0


def test_exact_doc_copies_fully_emptied_and_conservation(spark):
    rng = np.random.default_rng(7)
    docs = [(i, rng.integers(0, 10000, 30, dtype=np.int64).tolist())
            for i in range(6)]
    rows = docs + [(100 + i, t) for i, t in docs[:3]]  # copy docs 0-2
    got = _run(spark, rows, k=5)
    for i in (0, 1, 2, 100, 101, 102):  # remove-all: BOTH copies emptied
        assert got[i].tokens == []
        assert got[i].n_tokens_removed == 30
        assert got[i].n_dup_spans == 1
    for i in (3, 4, 5):
        assert got[i].n_tokens_removed == 0 and len(got[i].tokens) == 30
    # conservation on every row
    assert all(len(r.tokens) + r.n_tokens_removed == 30
               for r in got.values())


def test_min_count_threshold(spark):
    rows = [(1, [1, 2, 3, 4, 9]), (2, [1, 2, 3, 4, 8]), (3, [1, 2, 3, 4, 7])]
    got2 = _run(spark, rows, k=4, min_count=2)
    assert all(got2[i].n_tokens_removed == 4 for i in (1, 2, 3))
    got4 = _run(spark, rows, k=4, min_count=4)  # only 3 occurrences
    assert all(got4[i].n_tokens_removed == 0 for i in (1, 2, 3))


def test_keep_spans_boundaries(spark):
    rows = [(1, [7, 7, 7, 7, 1, 2, 9, 9, 9, 9]),
            (2, [7, 7, 7, 7, 3, 4, 9, 9, 9, 9])]
    got = _run(spark, rows, k=4, keep_spans=True)
    for i in (1, 2):
        spans = [(p.s, p.e) for p in got[i].dup_spans]
        assert spans == [(1, 4), (7, 10)]
        assert got[i].tokens[0] in (1, 3) and len(got[i].tokens) == 2


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(13)
    base = rng.integers(0, 500, 60, dtype=np.int64).tolist()
    rows = [(i, rng.integers(0, 500, 60, dtype=np.int64).tolist())
            for i in range(20)] + [(50, base), (51, base[10:40] + [9999])]
    df1 = spark.createDataFrame(rows, "doc_id long, tokens array<int>") \
        .repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, tokens array<int>") \
        .repartition(8)
    r1 = sorted(map(tuple, dedup_spans_tokens(df1, k=6).select(
        "doc_id", "n_dup_windows", "n_tokens_removed").collect()))
    r8 = sorted(map(tuple, dedup_spans_tokens(df8, k=6).select(
        "doc_id", "n_dup_windows", "n_tokens_removed").collect()))
    assert r1 == r8
    # doc 51 is a 30-token substring of doc 50 (plus a unique tail): all
    # its first 30 tokens are duplicated content
    got = {t[0]: t for t in r1}
    assert got[51][2] == 30


def test_seqs_shape_and_pure_jvm_plan(spark, tmp_path):
    """Works on the input_hint table shape and keeps the whole plan
    JVM-side (no Python UDF / mapInPandas nodes).  The seqs table is
    materialized to parquet first so the audited plan is the OPERATOR's
    (the synthesizer itself is a mapInPandas source)."""
    from python_hll_spark.sources.seqs import seqs_table

    path = str(tmp_path / "seqs")
    seqs_table(spark, 120, partitions=4).write.parquet(path)
    df = spark.read.parquet(path)
    dup = df.orderBy("doc_id").limit(20).select(
        F.concat(F.lit("copy-"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source")
    out = dedup_spans_tokens(df.unionByName(dup), k=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan
    rows = out.collect()
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert len(r.tokens) + r.n_tokens_removed == r.n_tok
        if r.doc_id.startswith("copy-"):
            orig = by_id[r.doc_id[len("copy-"):]]
            # copies and originals lose exactly the same spans
            assert r.n_tokens_removed == orig.n_tokens_removed
            if r.n_tok >= 50:
                assert r.n_tokens_removed == r.n_tok  # fully duplicated


def test_k_validation(spark):
    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError, match="k must be"):
        dedup_spans_tokens(df, k=0)
