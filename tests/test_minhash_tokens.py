"""MinHash over pre-tokenized docs (the input_hint table shape)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_signatures_tokens)


@pytest.fixture()
def tok_docs(spark):
    rng = np.random.default_rng(4)
    base = rng.integers(0, 50000, 300, dtype=np.int64).tolist()
    rows = []
    for i in range(40):
        toks = list(base)
        for j in range(i):  # doc i mutates i positions -> decreasing overlap
            toks[j * 7 % 300] = 99991 + i * 300 + j
        rows.append((i, toks))
    rows.append((900, base[:2]))   # short doc (m < n)
    rows.append((901, []))         # empty doc
    return spark.createDataFrame(rows, "doc_id long, tokens array<bigint>")


def test_identical_tokens_identical_sigs(spark, tok_docs):
    shifted = tok_docs.select((F.col("doc_id") + 1000).alias("doc_id"), "tokens")
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in
            minhash_signatures_tokens(tok_docs.unionByName(shifted),
                                      num_hashes=64).collect()}
    for i in list(range(40)) + [900, 901]:
        assert sigs[i] == sigs[i + 1000], i


def test_est_jaccard_tracks_exact_shingle_jaccard(spark, tok_docs):
    n = 3
    sigs = minhash_signatures_tokens(tok_docs, n=n, num_hashes=128)
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
             lsh_candidate_pairs(sigs, bands=64).collect()}
    docs = {r["doc_id"]: list(r["tokens"]) for r in tok_docs.collect()}

    def shingles(toks):
        if not toks:
            return set()
        if len(toks) < n:
            return {tuple(toks)}
        return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    checked = 0
    for (a, b), est in pairs.items():
        if a >= 900 or b >= 900:
            continue
        sa, sb = shingles(docs[a]), shingles(docs[b])
        exact = len(sa & sb) / len(sa | sb)
        assert abs(est - exact) <= 0.15, (a, b, est, exact)
        checked += 1
    assert checked >= 10  # near-identical docs must surface as candidates


def test_empty_docs_never_pair(spark, tok_docs):
    sigs = minhash_signatures_tokens(tok_docs, num_hashes=64)
    pairs = lsh_candidate_pairs(sigs, bands=32).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 901 not in ids_in_pairs  # sentinel sigs dropped at banding


def test_short_doc_trailing_repeat_not_collided(spark):
    """[a,b] and [a,b,b] must NOT share a signature: the short-doc window
    clamp repeats the last token, so without the length mix their chains
    coincide.  Identical short docs still collide (same content)."""
    rows = [(1, [7, 9]), (2, [7, 9, 9]), (3, [7, 9]), (4, [7]), (5, [7, 7])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in
            minhash_signatures_tokens(df, n=3, num_hashes=32).collect()}
    assert sigs[1] == sigs[3]          # identical short docs
    assert sigs[1] != sigs[2]          # trailing repeat distinguishes
    assert sigs[4] != sigs[5]          # [a] vs [a,a]
