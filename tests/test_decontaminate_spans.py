"""Span-granularity decontamination (``decontaminate_spans_tokens``):
cut every k-token window of a train doc whose content occurs in the
eval set — the surgical tier between whole-doc n-gram decontamination
(drop the doc) and doing nothing.  Same merged-maximal-span contract as
``dedup_spans_tokens`` (shared ``_remove_spans`` tail)."""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.decontaminate import (
    contamination_spans_tokens, decontaminate_spans_tokens)


def _frames(spark, train_rows, eval_rows):
    t = spark.createDataFrame(train_rows, "doc_id long, tokens array<int>")
    e = spark.createDataFrame(eval_rows, "doc_id long, tokens array<int>")
    return t, e


def _run(spark, train_rows, eval_rows, k=4, **kw):
    t, e = _frames(spark, train_rows, eval_rows)
    out = decontaminate_spans_tokens(t, e, k=k, **kw) \
        .orderBy("doc_id").collect()
    return {r.doc_id: r for r in out}


def test_eval_span_cut_train_unique_prose_kept(spark):
    got = _run(spark, [
        (1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),   # embeds eval run 5..8
        (2, [20, 21, 22, 23, 24, 25]),           # clean
    ], [(900, [5, 6, 7, 8])])
    assert got[1].tokens == [1, 2, 3, 4, 9, 10]
    assert (got[1].n_contam_windows, got[1].n_contam_spans,
            got[1].n_tokens_removed) == (1, 1, 4)
    assert got[2].tokens == [20, 21, 22, 23, 24, 25]
    assert got[2].n_contam_windows == 0 and got[2].n_tokens_removed == 0


def test_overlapping_hits_merge_to_maximal_span(spark):
    # eval doc is a 6-token run -> 3 overlapping k=4 windows in a train
    # doc that carries the whole run; they must merge to ONE span of 6
    got = _run(spark, [(1, [0, 5, 6, 7, 8, 9, 10, 99])],
               [(900, [5, 6, 7, 8, 9, 10])])
    assert got[1].tokens == [0, 99]
    assert (got[1].n_contam_windows, got[1].n_contam_spans,
            got[1].n_tokens_removed) == (3, 1, 6)


def test_train_docs_do_not_contaminate_each_other(spark):
    # two identical TRAIN docs share every window, but nothing from the
    # eval set — span decontamination must not cut (that is dedup's job)
    got = _run(spark, [(1, [1, 2, 3, 4, 5]), (2, [1, 2, 3, 4, 5])],
               [(900, [70, 71, 72, 73])])
    assert got[1].tokens == [1, 2, 3, 4, 5]
    assert got[2].tokens == [1, 2, 3, 4, 5]


def test_short_docs_and_short_eval_untouched(spark):
    got = _run(spark, [(1, [1, 2, 3])], [(900, [1, 2, 3])])
    # no k=4 window exists on either side
    assert got[1].tokens == [1, 2, 3] and got[1].n_contam_windows == 0


def test_wholesale_copy_dropped_with_threshold(spark):
    t, e = _frames(spark, [
        (1, [5, 6, 7, 8, 9]),                    # exact eval copy
        (2, [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13]),  # partial quote
    ], [(900, [5, 6, 7, 8, 9])])
    out = decontaminate_spans_tokens(t, e, k=4,
                                     drop_if_removed_frac_ge=0.5) \
        .orderBy("doc_id").collect()
    got = {r.doc_id: r for r in out}
    assert 1 not in got            # 100% removed -> dropped wholesale
    assert got[2].tokens == [1, 2, 3, 10, 11, 12, 13]
    assert got[2].n_tokens_removed == 5


def test_keep_spans_boundaries_one_based_inclusive(spark):
    got = _run(spark, [(1, [9, 9, 5, 6, 7, 8, 9])],
               [(900, [5, 6, 7, 8])], keep_spans=True)
    assert [(p.s, p.e) for p in got[1].contam_spans] == [(3, 6)]
    got2 = _run(spark, [(2, [30, 31, 32, 33])], [(900, [70, 71, 72, 73])],
                keep_spans=True)
    assert got2[2].contam_spans == []


def test_contamination_report_only_hit_docs(spark):
    t, e = _frames(spark, [
        (1, [1, 2, 3, 4, 5]),
        (2, [50, 51, 52, 53]),
    ], [(900, [2, 3, 4, 5])])
    rep = contamination_spans_tokens(t, e, k=4).collect()
    assert len(rep) == 1 and rep[0].doc_id == 1
    assert rep[0].n_contam_windows == 1
    assert [(p.s, p.e) for p in rep[0].contam_spans] == [(2, 5)]


def test_partition_layout_independence(spark):
    train = [(i, list(range(i, i + 12))) for i in range(40)]
    evals = [(900, list(range(6, 14)))]
    t1, e = _frames(spark, train, evals)
    t8 = t1.repartition(8)
    cols = ["doc_id", "n_contam_windows", "n_tokens_removed", "tokens"]
    r1 = sorted(map(tuple, decontaminate_spans_tokens(t1, e, k=5)
                    .select(*cols).collect()))
    r8 = sorted(map(tuple, decontaminate_spans_tokens(t8, e, k=5)
                    .select(*cols).collect()))
    assert r1 == r8


def test_k_validation(spark):
    t, e = _frames(spark, [(1, [1, 2, 3])], [(900, [1, 2, 3])])
    with pytest.raises(ValueError):
        decontaminate_spans_tokens(t, e, k=0)
