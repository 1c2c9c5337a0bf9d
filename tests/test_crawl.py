"""Crawl JSONL ingest: schema projection, corrupt-line quarantine,
good+bad conservation, idempotent url-hash ids, single-scan plan."""

import json

from pyspark.sql import functions as F

from python_hll_spark.sources.crawl import (
    crawl_quarantine, read_crawl_jsonl, read_crawl_stream)

LINES = [
    json.dumps({"url": "https://example.com/a?utm_source=x", "text": "hello world",
                "lang": "en", "status": 200}),
    json.dumps({"url": "http://example.com/a", "text": "hello world again"}),
    json.dumps({"url": "https://other.org/p", "text": "short"}),
    json.dumps({"text": "no url here"}),                  # missing_url
    json.dumps({"url": "https://nourl.example/x"}),       # missing_text
    '{"url": "https://broken.example/y", "text": "trunc', # unparseable
    "not json at all",                                    # unparseable
    json.dumps({"url": "https://tiny.example/z", "text": ""}),  # below min
]


def _dump(tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_good_rows_projected(spark, tmp_path):
    path = _dump(tmp_path)
    docs = read_crawl_jsonl(spark, path, source="cc-2026-08")
    rows = {r["url"]: r for r in docs.collect()}
    assert len(rows) == 3
    a = rows["https://example.com/a?utm_source=x"]
    assert a["text"] == "hello world" and a["lang"] == "en"
    assert a["source"] == "cc-2026-08" and a["n_chars"] == 11
    # missing lang defaults to 'und'
    assert rows["https://other.org/p"]["lang"] == "und"
    assert set(docs.columns) == {"doc_id", "text", "lang", "source",
                                 "n_chars", "url"}


def test_doc_id_idempotent_and_tracker_param_stripped(spark, tmp_path):
    path = _dump(tmp_path)
    docs = read_crawl_jsonl(spark, path)
    ids = {r["url"]: r["doc_id"] for r in docs.collect()}
    # url_normalize strips the utm_ param and the scheme, so the first two
    # lines (same page crawled twice) share a doc_id -> URL-level dedup is
    # a plain groupBy downstream
    assert ids["https://example.com/a?utm_source=x"] == ids["http://example.com/a"]
    again = {r["url"]: r["doc_id"]
             for r in read_crawl_jsonl(spark, path).collect()}
    assert ids == again


def test_quarantine_reasons_and_conservation(spark, tmp_path):
    path = _dump(tmp_path)
    good = read_crawl_jsonl(spark, path)
    bad = crawl_quarantine(spark, path)
    reasons = sorted(r["reason"] for r in bad.collect())
    assert reasons == ["below_min_chars", "missing_text", "missing_url",
                       "unparseable_or_empty", "unparseable_or_empty"]
    assert good.count() + bad.count() == len(LINES)
    # quarantine keeps the raw line verbatim for replay after a fix
    kept = {r["raw_line"] for r in bad.collect()}
    assert "not json at all" in kept


def test_min_chars_gate(spark, tmp_path):
    path = _dump(tmp_path)
    assert read_crawl_jsonl(spark, path, min_chars=12).count() == 1
    assert crawl_quarantine(spark, path, min_chars=12).count() == 7


def test_stream_matches_batch(spark, tmp_path):
    # the streaming front door is the SAME parse+projection code path:
    # drop two dump files into the watched dir, drain the stream, and the
    # union of micro-batches must equal the batch read of the same dir
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(LINES[:4]) + "\n")
    (d / "b.jsonl").write_text("\n".join(LINES[4:]) + "\n")
    stream = read_crawl_stream(spark, str(d), source="cc-s",
                               max_files_per_trigger=1)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("crawl_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("crawl_sink").collect()))
    want = sorted(map(tuple,
                      read_crawl_jsonl(spark, str(d), source="cc-s")
                      .collect()))
    assert got == want and len(got) == 3


def test_single_scan_no_shuffle(spark, tmp_path):
    plan = read_crawl_jsonl(spark, _dump(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1
