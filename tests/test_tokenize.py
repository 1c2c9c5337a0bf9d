"""Vocab build + corpus encode: frequency/tie determinism, OOV mapping,
token-count law, kernel parity, partitioning independence, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.tokenize import (
    UNK_ID, build_vocab, encode_corpus, extend_vocab, word_hash_counts)


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the dog sat", "a"),
        (3, "THE CAT  ran\tfast", "b"),     # case + multi-ws collapse
        (4, "", "b"),                       # empty -> 0 tokens
        (5, "   \t  ", "b"),                # whitespace-only -> 0 tokens
        (6, "zebra quokka axolotl", "c"),   # singletons
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_word_hash_counts_exact(spark):
    counts = {r["count"] for r in word_hash_counts(_docs(spark)).collect()}
    # the: 2+1+1=4, cat: 2, sat: 2, rest singletons
    got = sorted(r["count"] for r in word_hash_counts(_docs(spark)).collect())
    assert got == [1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 4]


def test_vocab_order_and_ties_deterministic(spark):
    df = _docs(spark)
    v1 = build_vocab(df, 5).collect()
    v2 = build_vocab(df.repartition(7), 5).collect()
    assert sorted(map(tuple, v1)) == sorted(map(tuple, v2))
    by_id = {r["id"]: r for r in v1}
    assert by_id[1]["count"] == 4            # 'the' is id 1
    assert by_id[2]["count"] == by_id[3]["count"] == 2   # cat/sat
    assert by_id[2]["word_hash"] < by_id[3]["word_hash"]  # tie by hash asc
    assert len(v1) == 5


def test_encode_law_and_oov(spark):
    df = _docs(spark)
    vocab = build_vocab(df, 4)  # the, cat, sat, + one count-1 word
    out = encode_corpus(df, vocab).orderBy("doc_id").collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    # n_tok equals the word count under the kernel rule, OOV included
    assert [rows[i]["n_tok"] for i in (1, 2, 3, 4, 5, 6)] == [6, 3, 4, 0, 0, 3]
    for r in out:
        assert len(r["tokens"]) == r["n_tok"]
        assert all(0 <= t <= 4 for t in r["tokens"])
    # doc 1: 'the cat sat on the mat' -> the=1 twice, cat/sat in-vocab
    t1 = rows[1]["tokens"]
    assert t1[0] == 1 and t1[4] == 1
    assert t1.count(UNK_ID) >= 1             # 'on'/'mat' mostly OOV
    # source column rides through
    assert rows[3]["source"] == "b"
    # doc 6 is all singletons; at most one fits the remaining vocab slot
    assert rows[6]["tokens"].count(UNK_ID) >= 2


def test_encode_partitioning_independent(spark):
    df = _docs(spark)
    vocab = build_vocab(df, 4)
    a = {r["doc_id"]: list(r["tokens"])
         for r in encode_corpus(df, vocab).collect()}
    b = {r["doc_id"]: list(r["tokens"])
         for r in encode_corpus(df.repartition(5), vocab).collect()}
    assert a == b


def test_encode_matches_kernel_hashes(spark):
    # every in-vocab id must decode back to the hash the kernel assigns:
    # re-derive each doc's word hashes and check id positions agree
    from python_hll_spark.operators.dedup import tokenize_word_hashes

    df = _docs(spark).where("doc_id <= 3")
    vocab = build_vocab(df, 3)
    vmap = {r["id"]: r["word_hash"] for r in vocab.collect()}
    enc = {r["doc_id"]: list(r["tokens"])
           for r in encode_corpus(df, vocab).collect()}
    hashes = {r["doc_id"]: list(r["tokens"])
              for r in tokenize_word_hashes(df, "text").collect()}
    in_vocab_hashes = set(vmap.values())
    for d, toks in enc.items():
        assert len(toks) == len(hashes[d])
        for tok_id, h in zip(toks, hashes[d]):
            if tok_id == UNK_ID:
                assert h not in in_vocab_hashes
            else:
                assert vmap[tok_id] == h


def test_min_count_filter(spark):
    vocab = build_vocab(_docs(spark), 100, min_count=2).collect()
    assert len(vocab) == 3  # the, cat, sat
    assert all(r["count"] >= 2 for r in vocab)


def test_empty_vocab_all_unk(spark):
    df = _docs(spark)
    empty = build_vocab(df.where("doc_id < 0"), 10)
    out = encode_corpus(df, empty).collect()
    assert all(t == UNK_ID for r in out for t in r["tokens"])
    assert sum(r["n_tok"] for r in out) == 16


def test_encode_zero_shuffle_plan(spark):
    df = _docs(spark)
    vocab = build_vocab(df, 4)
    plan = encode_corpus(df, vocab)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_output_feeds_sketch_operators(spark):
    # the encoded frame IS the library input shape: run an existing
    # tokens-path operator on it unchanged
    from python_hll_spark.operators.ndv import hll_ndv_tokens

    df = _docs(spark)
    out = encode_corpus(df, build_vocab(df, 4))
    res = {r["source"]: r for r in
           hll_ndv_tokens(out, by=["source"]).collect()}
    assert set(res) == {"a", "b", "c"}
    assert res["c"]["ndv"] > 0


def test_extend_vocab_stable_ids(spark):
    df0 = _docs(spark)
    v0 = build_vocab(df0, 4)
    ids0 = {r["word_hash"]: r["id"] for r in v0.collect()}
    # a new batch: heavy reuse of 'the' plus brand-new words
    df1 = spark.createDataFrame(
        [(10, "the the the nebula nebula pulsar", "a"),
         (11, "quasar", "a")],
        "doc_id long, text string, source string")
    v1 = extend_vocab(v0, df1, max_size=6).collect()
    ids1 = {r["word_hash"]: r["id"] for r in v1}
    # every old word keeps its exact id
    for h, i in ids0.items():
        assert ids1[h] == i
    # two new slots filled, appended AFTER the old range, by batch count
    new = sorted((r["id"], r["count"]) for r in v1
                 if r["word_hash"] not in ids0)
    assert [i for i, _ in new] == [5, 6]
    assert new[0][1] == 2          # nebula (count 2) takes id 5
    # counts refreshed: 'the' gained 3 occurrences
    the_hash = next(h for h, i in ids0.items() if i == 1)
    the_count = next(r["count"] for r in v1 if r["word_hash"] == the_hash)
    assert the_count == 4 + 3
    # encoding the old corpus against the grown vocab is unchanged
    a = {r["doc_id"]: list(r["tokens"])
         for r in encode_corpus(df0, v0).collect()}
    b = {r["doc_id"]: list(r["tokens"])
         for r in encode_corpus(df0, spark.createDataFrame(v1)).collect()}
    assert a == b


def test_extend_vocab_no_room(spark):
    df0 = _docs(spark)
    v0 = build_vocab(df0, 3)
    df1 = spark.createDataFrame([(10, "nova nova nova", "a")],
                                "doc_id long, text string, source string")
    v1 = extend_vocab(v0, df1, max_size=3).collect()
    assert len(v1) == 3
    assert {r["id"] for r in v1} == {1, 2, 3}


def test_encode_streaming(spark, tmp_path):
    # perpetual-crawl shape: a fixed vocab encodes a document STREAM
    # (mapInArrow is stateless, so the same code path runs under
    # readStream); union of micro-batches == batch encode of the same dir
    d = tmp_path / "in"
    d.mkdir()
    _docs(spark).where("doc_id <= 3").write.parquet(str(d / "a.parquet"))
    _docs(spark).where("doc_id > 3").write.parquet(str(d / "b.parquet"))
    batch_df = spark.read.parquet(str(d) + "/*")
    vocab = build_vocab(batch_df, 4)
    stream = spark.readStream.schema(batch_df.schema) \
        .option("maxFilesPerTrigger", 1).parquet(str(d) + "/*")
    enc = encode_corpus(stream, vocab)
    assert enc.isStreaming
    q = (enc.writeStream.format("memory").queryName("tok_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
           for r in spark.table("tok_sink").collect()}
    want = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
            for r in encode_corpus(batch_df, vocab).collect()}
    assert got == want and len(got) == 6
