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
