"""token_budget_select + bigram_logprob + perplexity_partition.

The budget selector's contract (maximal hash-order prefix whose running
cost fits the budget) is pinned three ways: against a pure-Python replay
of the same order, against the naive single-window plan (two_phase=False),
and under repartitioning.  The bigram LM is pinned against a pure-Python
count model on a handcrafted corpus, plus the sequence-sensitivity
property that motivates it over the unigram scorer.
"""

import math

import pytest
from pyspark.sql import functions as F

from python_hll_spark.functions.text import (bigram_logprob,
                                             perplexity_partition)
from python_hll_spark.operators.sampling import token_budget_select


# ---------------------------------------------------------------- budget

@pytest.fixture()
def costed(spark):
    # costs 1..40 cycling, two sources, some zero-cost rows
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("source"),
        F.when(F.col("id") % 17 == 0, F.lit(0))
         .otherwise(F.col("id") % 40 + 1).alias("cost"))


def _python_greedy(rows, budget_by_group):
    """Replay the contract: sort by (hash, id) per group, keep while the
    running cost fits."""
    from collections import defaultdict
    by_g = defaultdict(list)
    for r in rows:
        by_g[r["source"]].append(r)
    kept = set()
    for g, rs in by_g.items():
        if g not in budget_by_group:
            continue
        rs.sort(key=lambda r: (r["h"], r["doc_id"]))
        run = 0
        for r in rs:
            run += r["cost"]
            if run <= budget_by_group[g]:
                kept.add(r["doc_id"])
            else:
                break
        # rows past the first overflow are out even if they'd fit: the
        # contract is a PREFIX (cost >= 0 makes the cumsum monotone, so
        # breaking at first overflow equals filtering cum <= budget)
    return kept


def test_budget_matches_python_replay(spark, costed):
    budgets = {"0": 3000, "1": 4500}
    rows = costed.select(
        "doc_id", "source", "cost",
        F.xxhash64(F.col("doc_id"), F.lit(3)).alias("h")).collect()
    expect = _python_greedy(rows, budgets)
    got = {r["doc_id"] for r in
           token_budget_select(costed, budgets, cost_col="cost",
                               by="source", seed=3).collect()}
    assert got == expect and got  # non-trivial


def test_budget_two_phase_equals_naive_window(spark, costed):
    # NULL group keys form a group like any other (int budget)
    withnull = costed.withColumn(
        "source", F.when(F.col("doc_id") % 5 == 0, None)
                   .otherwise(F.col("source")))
    for df, by, budget in [(costed, "source", {"0": 2500, "1": 7000}),
                           (costed, None, 9999), (costed, None, 0),
                           (costed, "source", 10**9),
                           (withnull, "source", 3000)]:
        fast = token_budget_select(df, budget, cost_col="cost",
                                   by=by, seed=5, two_phase=True)
        naive = token_budget_select(df, budget, cost_col="cost",
                                    by=by, seed=5, two_phase=False)
        a = sorted(r["doc_id"] for r in fast.collect())
        b = sorted(r["doc_id"] for r in naive.collect())
        assert a == b, (by, budget)


def test_budget_partitioning_independent_and_maximal(spark, costed):
    sel = token_budget_select(costed, 4000, cost_col="cost",
                              by="source", seed=1)
    sel13 = token_budget_select(costed.repartition(13), 4000,
                                cost_col="cost", by="source", seed=1)
    a = sorted(r["doc_id"] for r in sel.collect())
    assert a == sorted(r["doc_id"] for r in sel13.collect())
    stats = {r["source"]: r for r in
             sel.groupBy("source").agg(F.sum("cost").alias("kept")).collect()}
    max_cost = {r["source"]: r["m"] for r in
                costed.groupBy("source").agg(F.max("cost").alias("m")).collect()}
    for g, r in stats.items():
        assert r["kept"] <= 4000
        # maximality: the overflow row costs at most max_cost
        assert r["kept"] > 4000 - max_cost[g]


def test_budget_over_total_keeps_all_and_dict_drops_absent(spark, costed):
    assert token_budget_select(costed, 10**9, cost_col="cost",
                               by="source").count() == costed.count()
    only0 = token_budget_select(costed, {"0": 10**9}, cost_col="cost",
                                by="source")
    assert only0.select("source").distinct().collect() == [("0",)] \
        or [r["source"] for r in only0.select("source").distinct().collect()] == ["0"]


def test_budget_schema_and_columns_preserved(spark, costed):
    out = token_budget_select(costed, 100, cost_col="cost", by="source")
    assert out.columns == costed.columns


def test_budget_dict_requires_by(spark, costed):
    with pytest.raises(ValueError):
        token_budget_select(costed, {"0": 10}, cost_col="cost", by=None)


def test_budget_plan_broadcast_marks_no_payload_sort(spark):
    """The 100 TB shape: bucket marks join back as a BROADCAST (never a
    shuffle of the corpus), the full-keep leg has NO Sort at all, and the
    per-bucket sums scan is column-pruned (text never read)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = token_budget_select(docs, 100000, cost_col="n_chars",
                               by="source", seed=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    legs = plan.split("Union")[1].split("+- Project [doc_id")
    # first union leg (full-keep buckets): sort only inside the tiny
    # G x 2^bits marks aggregation, never over payload rows carrying text
    full_keep_leg = legs[1] if len(legs) > 1 else legs[0]
    for line in full_keep_leg.splitlines():
        if "Sort [" in line:
            assert "text" not in line
    schemas = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    assert any("text" not in s for s in schemas), schemas


# ---------------------------------------------------------------- bigram LM

def _py_bigram_model(texts, lam):
    """Pure-Python mirror of the interpolated bigram scorer."""
    def norm(t):
        return " ".join(t.lower().strip().split()).split(" ")
    uni, big, total = {}, {}, 0
    for t in texts:
        ws = norm(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
            total += 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for i, t in enumerate(texts):
        ws = norm(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lps, sfreq = [], 0
        for a, b in pairs:
            p = lam * big[(a, b)] / uni[a] + (1 - lam) * uni[b] / total
            lps.append(math.log10(p))
            sfreq += big[(a, b)]
        out[i] = (len(pairs), sfreq, sum(lps) / len(lps))
    return out


CORPUS = ["the cat sat on the mat",
          "the cat sat on the hat",
          "a dog ran",
          "singleword",
          "   ",
          "mat the on sat cat the",   # same words, gibberish order
          "the cat sat on the mat"]   # exact duplicate of doc 0


def test_bigram_matches_python_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(df, lam=0.7).collect()}
    expect = _py_bigram_model(CORPUS, lam=0.7)
    assert set(got) == set(expect)          # 1-word/empty docs excluded
    for i, (nb, sf, lp) in expect.items():
        assert got[i]["n_bigrams"] == nb
        assert got[i]["sum_bigram_freq"] == sf
        assert abs(got[i]["mean_log10_prob"] - lp) < 1e-5


def test_bigram_sequence_sensitivity_and_dup_equality(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = {r["doc_id"]: r["mean_log10_prob"]
           for r in bigram_logprob(df).collect()}
    # duplicate docs score identically
    assert got[0] == got[6]
    # gibberish word ORDER scores strictly lower than natural order —
    # the property the unigram scorer cannot see
    assert got[5] < got[0]


def test_bigram_hot_tail_split_lossless_and_partition_independent(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(400)
    a = bigram_logprob(docs, hot_keys=7)
    b = bigram_logprob(docs.repartition(13), hot_keys=100000)
    ra = {r["doc_id"]: (r["n_bigrams"], r["sum_bigram_freq"])
          for r in a.collect()}
    rb = {r["doc_id"]: (r["n_bigrams"], r["sum_bigram_freq"])
          for r in b.collect()}
    assert ra == rb and ra


def test_bigram_score_bounds(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(300)
    total = docs.select(F.sum(F.size(F.split(F.regexp_replace(
        F.lower(F.trim("text")), r"\s+", " "), " ")))).collect()[0][0]
    lo = math.log10(0.3 / total) - 1e-9
    bad = bigram_logprob(docs, lam=0.7).where(
        (F.col("mean_log10_prob") > 0) | (F.col("mean_log10_prob") < lo))
    assert bad.count() == 0


def test_bigram_tokens_matches_python_model(spark):
    from python_hll_spark.functions.text import bigram_logprob_tokens
    token_docs = [[1, 2, 3, 1, 2], [1, 2, 4], [7], [], [0, 0, 5]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_docs)],
        "doc_id long, tokens array<int>")
    # token-list mirror (the text-path mirror would miscount the empty
    # doc: "" normalizes to one empty-string WORD, [] has zero tokens)
    lam, uni, big, total = 0.7, {}, {}, 0
    for t in token_docs:
        for x in t:
            uni[x] = uni.get(x, 0) + 1
            total += 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    expect = {}
    for i, t in enumerate(token_docs):
        pairs = list(zip(t, t[1:]))
        if not pairs:
            continue
        lps = [math.log10(lam * big[p] / uni[p[0]]
                          + (1 - lam) * uni[p[1]] / total) for p in pairs]
        expect[i] = (len(pairs), sum(big[p] for p in pairs),
                     sum(lps) / len(lps))
    got = {r["doc_id"]: r for r in
           bigram_logprob_tokens(df, lam=0.7).collect()}
    assert set(got) == set(expect)
    for i, (nb, sf, lp) in expect.items():
        assert got[i]["n_bigrams"] == nb
        assert got[i]["sum_bigram_freq"] == sf
        assert abs(got[i]["mean_log10_prob"] - lp) < 1e-5


def test_bigram_tokens_parity_with_text_path(spark):
    """A bijectively-encoded corpus scores IDENTICALLY through the
    tokens path: exact integer companions, float scores to 1e-6."""
    from python_hll_spark.functions.text import (bigram_logprob,
                                                 bigram_logprob_tokens)
    from python_hll_spark.operators.tokenize import (build_vocab,
                                                     encode_corpus)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(300).select("doc_id", "text", "source"))
    vocab = build_vocab(docs, vocab_size=10**7, min_count=1)
    enc = encode_corpus(docs, vocab)
    t = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    k = {r["doc_id"]: r for r in bigram_logprob_tokens(enc).collect()}
    assert set(t) == set(k) and t
    for d in t:
        assert t[d]["n_bigrams"] == k[d]["n_bigrams"]
        assert t[d]["sum_bigram_freq"] == k[d]["sum_bigram_freq"]
        assert abs(t[d]["mean_log10_prob"] - k[d]["mean_log10_prob"]) < 1e-5


# ------------------------------------------------------- perplexity buckets

def test_perplexity_partition_terciles_and_monotone(spark):
    scored = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 0.001 - 3.0).alias("mean_log10_prob"))
    out = perplexity_partition(scored).persist()
    try:
        n = {r["ppl_bucket"]: r["n"] for r in
             out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
        assert set(n) == {"head", "middle", "tail"}
        for b in n:
            assert abs(n[b] - 1000) < 120, n   # KLL rank error on 3000 rows
        agg = {r["ppl_bucket"]: r for r in
               out.groupBy("ppl_bucket")
               .agg(F.min("mean_log10_prob").alias("lo"),
                    F.max("mean_log10_prob").alias("hi")).collect()}
        assert agg["head"]["lo"] > agg["middle"]["hi"]
        assert agg["middle"]["lo"] > agg["tail"]["hi"]
    finally:
        out.unpersist()
