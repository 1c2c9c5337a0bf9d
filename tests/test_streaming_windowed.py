"""Watermarked windowed streaming NDV (Structured Streaming shape)."""

import os

import pytest
from pyspark.sql import functions as F


def test_windowed_ndv_stream(spark, tmp_path):
    from python_hll_spark.streaming.stream import windowed_ndv_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    windowed = windowed_ndv_stream(stream, "ts", "user_id",
                                   window="1 hour", watermark="2 hours")
    q = (windowed.writeStream.format("memory").queryName("wndv")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["window"]["start"]: r["ndv"]
           for r in spark.sql("SELECT * FROM wndv").collect()}
    exact = {r["w"]["start"]: r["ndv"] for r in
             events.groupBy(F.window("ts", "1 hour").alias("w"))
             .agg(F.countDistinct("user_id").alias("ndv")).collect()}
    assert set(got) == set(exact)
    for w, e in exact.items():
        assert abs(got[w] - e) <= max(2, 0.1 * e), (w, got[w], e)


def test_stateful_hll_stream(spark, tmp_path):
    """applyInPandasWithState HLL: final per-group NDV within bound of exact."""
    from python_hll_spark.sources.seqs import seqs_table
    from python_hll_spark.streaming.stream import stateful_hll_stream

    df = seqs_table(spark, 200, partitions=4) \
        .select("source", "doc_id")
    src = str(tmp_path / "docs_stream")
    df.write.parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = stateful_hll_stream(stream, "source", "doc_id")
    q = (out.writeStream.format("memory").queryName("shll")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # last emitted row per group carries the final state
    final = {r["g"]: r for r in
             spark.sql("""SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY n_rows DESC) rn
                FROM shll) WHERE rn = 1""").collect()}
    exact = {r["source"]: r["ndv"] for r in
             df.groupBy("source").agg(F.countDistinct("doc_id").alias("ndv")).collect()}
    n_rows = {r["source"]: r["n"] for r in
              df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(final) == set(exact)
    for g, e in exact.items():
        assert final[g]["n_rows"] == n_rows[g]
        assert abs(final[g]["ndv"] - e) <= max(3, 0.1 * e), (g, final[g]["ndv"], e)
