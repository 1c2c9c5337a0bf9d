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


def test_pack_with_eod(spark, tok_docs):
    from pyspark.sql import functions as F

    n_in = tok_docs.agg(
        F.sum(F.size("tokens")).alias("t"),
        F.count("*").alias("d")).collect()[0]
    packed = pack_sequences(tok_docs, seq_len=64, pad_id=-1, eod_id=-7)
    agg = packed.agg(
        F.sum(F.expr("size(filter(tokens, t -> t <> -1))")).alias("nonpad"),
        F.sum(F.expr("size(filter(tokens, t -> t = -7))")).alias("eods"),
        F.min(F.size("tokens")).alias("minlen"),
        F.max(F.size("tokens")).alias("maxlen")).collect()[0]
    # conservation with boundaries: one eod per input doc
    assert agg["eods"] == n_in["d"]
    assert agg["nonpad"] == n_in["t"] + n_in["d"]
    assert agg["minlen"] == agg["maxlen"] == 64
    # non-pad, non-eod multiset is exactly the input multiset
    in_toks = sorted(t for r in tok_docs.collect() for t in r["tokens"])
    out_toks = sorted(t for r in packed.collect()
                      for t in r["tokens"] if t not in (-1, -7))
    assert in_toks == out_toks
    # boundary structure: within one partition's concatenated stream, the
    # token AFTER each doc's last token is the eod (single-partition case
    # keeps the doc order deterministic)
    one = tok_docs.where("doc_id in ('d3','d5')").coalesce(1)
    seqs = pack_sequences(one.orderBy("doc_id"), seq_len=16,
                          pad_id=-1, eod_id=-7).collect()
    stream = [t for r in sorted(seqs, key=lambda r: int(
        r["seq_id"].split("-")[1])) for t in r["tokens"] if t != -1]
    d3 = list(range(300, 304)); d5 = list(range(500, 506))
    assert stream == d3 + [-7] + d5 + [-7] or \
        stream == d5 + [-7] + d3 + [-7]
