"""Sequence packing: conservation, fixed lengths, determinism."""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.operators.packing import pack_sequences


@pytest.fixture()
def tok_docs(spark):
    rows = [(f"d{i}", list(range(i * 100, i * 100 + (i % 37) + 1)))
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id string, tokens array<bigint>")


def test_pack_conserves_every_token(spark, tok_docs):
    packed = pack_sequences(tok_docs, seq_len=64, pad_id=-1)
    n_in = tok_docs.select(F.sum(F.size("tokens"))).collect()[0][0]
    agg = packed.agg(
        F.sum("n_tokens").alias("nonpad"),
        F.sum(F.size("tokens")).alias("total"),
        F.min(F.size("tokens")).alias("minlen"),
        F.max(F.size("tokens")).alias("maxlen"),
        F.count("*").alias("n_seqs")).collect()[0]
    assert agg["nonpad"] == n_in          # lossless
    assert agg["minlen"] == agg["maxlen"] == 64
    assert agg["total"] == agg["n_seqs"] * 64
    # the multiset of non-pad tokens is exactly the input multiset
    in_toks = sorted(t for r in tok_docs.collect() for t in r["tokens"])
    out_toks = sorted(t for r in packed.collect()
                      for t in r["tokens"] if t != -1)
    assert in_toks == out_toks


def test_pack_deterministic_same_partitioning(spark, tok_docs):
    df = tok_docs.repartition(4, "doc_id").sortWithinPartitions("doc_id")
    a = {r["seq_id"]: list(r["tokens"]) for r in
         pack_sequences(df, seq_len=32).collect()}
    b = {r["seq_id"]: list(r["tokens"]) for r in
         pack_sequences(df, seq_len=32).collect()}
    assert a == b


def test_pack_no_shuffle(spark, tok_docs):
    plan = pack_sequences(tok_docs, seq_len=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_validates_seq_len(spark, tok_docs):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(tok_docs, seq_len=0)
