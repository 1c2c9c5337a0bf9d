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


def test_winnowing_vectorized_matches_reference(spark):
    """The cross-doc vectorized winnowing must be bit-identical to the
    round-1 per-doc implementation (kept here as the spec)."""
    import numpy as np
    from pyspark.sql import functions as F

    K, W = 8, 16

    def fp_one(text: str) -> list:
        data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        n = len(data) - K + 1
        if n <= 0:
            return []
        d = data.astype(np.uint64)
        powers = np.array([pow(1000003, K - 1 - j, 1 << 64) for j in range(K)],
                          dtype=np.uint64)
        h = np.empty(n, dtype=np.uint64)
        h[0] = (d[:K] * powers).sum(dtype=np.uint64)
        if n > 1:
            Binv = np.uint64(pow(1000003, -1, 1 << 64))
            binv_pow = np.cumprod(np.full(n - 1, Binv, dtype=np.uint64))
            term = (d[K:] - d[:n - 1] * np.uint64(pow(1000003, K, 1 << 64))) * binv_pow
            acc = np.cumsum(term, dtype=np.uint64) + h[0]
            b_pow = np.cumprod(np.full(n - 1, np.uint64(1000003), dtype=np.uint64))
            h[1:] = acc * b_pow
        if n <= W:
            sel = np.array([h.argmin()])
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(h, W).argmin(axis=1)
            sel = np.unique(mins + np.arange(len(mins)))
        return np.unique(h[sel]).view(np.int64).tolist()

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(200)]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 80)))))
            for i in range(150)]
    rows += [(900, ""), (901, "   "), (902, "exact"), (903, "x" * 7),
             (904, "y" * 8), (905, "z" * 500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: list(r["fingerprints"])
           for r in winnowing_fingerprints(df).collect()}
    # reference path applies the same JVM normalization first
    norm = df.select("doc_id", F.regexp_replace(
        F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t")).collect()
    for r in norm:
        assert got[r["doc_id"]] == fp_one(r["t"]), r["doc_id"]


# ------------------------------------------------- unigram logprob skew split
def test_unigram_logprob_hot_tail_split_matches_plain(spark):
    """The broadcast-hot / shuffle-tail split must produce the same scores
    for ANY cutoff — all-hot, all-tail, and mixed land identically."""
    from python_hll_spark.functions.text import unigram_logprob

    import numpy as np
    rng = np.random.default_rng(21)
    vocab = ["the", "and", "of"] + [f"rare{i}" for i in range(200)]
    probs = np.array([0.2, 0.1, 0.05] + [0.65 / 200] * 200)
    rows = [(i, " ".join(rng.choice(vocab, p=probs, size=40)))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(hw):
        return sorted(
            (r["doc_id"], r["n_words"], r["sum_corpus_freq"],
             r["mean_log10_prob"])
            for r in unigram_logprob(df, hot_words=hw).collect())

    mixed, all_tail, all_hot = run(3), run(0), run(10 ** 6)
    assert mixed == all_tail == all_hot
    # sanity: rare-word docs score lower than stopword-only docs
    extra = spark.createDataFrame(
        [(1000, "the the the the"), (1001, "rare0 rare1 rare2 rare3")],
        "doc_id long, text string")
    scores = {r["doc_id"]: r["mean_log10_prob"]
              for r in unigram_logprob(df.unionByName(extra),
                                       hot_words=3).collect()}
    assert scores[1000] > scores[1001]


def test_unigram_logprob_hot_path_is_broadcast(spark):
    """Plan shape: the hot-word occurrences must join via BroadcastHashJoin
    (no shuffle of the skewed keys); only the tail takes a shuffle join."""
    from python_hll_spark.functions.text import unigram_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = unigram_logprob(docs, hot_words=100) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan  # tail carve-out is the broadcast anti-join


def test_boilerplate_ngram_stats(spark):
    """Shared footer spans are detected exactly; unique docs read zero."""
    from python_hll_spark.functions.text import boilerplate_ngram_stats

    footer = "copyright two thousand twenty four all rights reserved"  # 8 words
    rows = [
        (1, "alpha beta gamma delta epsilon " + footer),   # 13 words
        (2, "one two three four five six " + footer),      # 14 words
        (3, "totally unique words nobody else ever wrote here at all"),
        (4, "tiny doc"),                                   # < n words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    caches = []
    got = {r["doc_id"]: r for r in
           boilerplate_ngram_stats(df, n=5, min_docs=2,
                                   cache_out=caches).collect()}
    # doc1: 9 windows; the 4 windows fully inside the 8-word footer are
    # shared with doc2 (footer starts at word 6 of 13 -> window starts
    # 6..9 lie inside the footer)
    assert got[1]["n_windows"] == 9 and got[1]["n_common_windows"] == 4
    assert got[2]["n_windows"] == 10 and got[2]["n_common_windows"] == 4
    assert got[3]["n_common_windows"] == 0
    assert got[4]["n_windows"] == 0 and got[4]["boilerplate_ratio"] == 0.0
    assert abs(got[1]["boilerplate_ratio"] - round(4 / 9, 6)) < 1e-9
    for c in caches:
        c.unpersist()
