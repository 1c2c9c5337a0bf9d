"""Raw-crawl ingest: JSONL crawl dumps -> the ``documents`` table shape,
with a quarantine lane for undecodable records.

The front door of the curation pipeline: crawlers emit line-delimited JSON
(one page per line: url, text, optional lang/fetch metadata).  This reader
turns a dump into the ``(doc_id, text, lang, source, n_chars)`` frame every
downstream operator consumes, without ever letting a malformed line kill a
100-TB job or silently vanish.

Spark shape notes:

- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a full extra pass over the data just to guess types; at
  crawl scale that doubles ingest cost and lets one weird line widen a
  column.  The schema here is fixed and versioned in code.
- **``text`` source + ``from_json``, not the json reader's PERMISSIVE
  corrupt column.**  Filtering on ``_corrupt_record`` requires caching the
  parsed frame (Spark refuses the lazy internal column otherwise); parsing
  lines explicitly keeps ingest a single streamed pass, gives us the raw
  line for the quarantine sink, and works identically under Structured
  Streaming (``readStream.text``).
- Good/bad split is two filters over one parsed projection — Catalyst
  collapses both onto the same scan; nothing is read twice, nothing
  shuffles.  ``doc_id`` is the hex of ``xxhash64(normalized url)`` so
  re-ingesting the same dump is idempotent and URL-level dedup upstream
  of text dedup is a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_hll_spark.functions.web import url_normalize

# one crawled page per JSONL line
CRAWL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("fetch_ts", T.TimestampType()),
    T.StructField("status", T.IntegerType()),
])

_RAW = "__raw_line"


def parse_crawl_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse a frame of raw JSONL lines.  Returns the raw line plus the
    typed struct fields; corrupt lines parse to all-null fields (the raw
    line is what the quarantine keeps)."""
    j = F.from_json(F.col(line_col), CRAWL_SCHEMA)
    return (lines
            .select(F.col(line_col).alias(_RAW), j.alias("__j"))
            .select(_RAW, "__j.*"))


def _is_good(min_chars: int):
    return (F.col("url").isNotNull() & F.col("text").isNotNull()
            & (F.length("text") >= min_chars))


def _good_docs(parsed: DataFrame, source: str, min_chars: int) -> DataFrame:
    return (parsed.where(_is_good(min_chars))
            .select(
                F.lower(F.hex(F.xxhash64(url_normalize(F.col("url")))))
                .alias("doc_id"),
                "text",
                F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
                F.lit(source).alias("source"),
                F.length("text").cast("long").alias("n_chars"),
                F.col("url")))


def read_crawl_jsonl(spark: SparkSession, path: str, source: str = "crawl",
                     min_chars: int = 1) -> DataFrame:
    """Read a JSONL crawl dump into the ``documents`` shape:
    (doc_id, text, lang, source, n_chars, url).  Records failing to parse
    or missing url/text are EXCLUDED — recover them with
    ``crawl_quarantine`` on the same path."""
    return _good_docs(parse_crawl_lines(spark.read.text(path)),
                      source, min_chars)


def read_crawl_stream(spark: SparkSession, path: str, source: str = "crawl",
                      min_chars: int = 1,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming twin of ``read_crawl_jsonl`` for a perpetual crawl: watch
    ``path`` for new JSONL dump files and emit the same documents-shaped
    rows per micro-batch (same parse, same projection — one code path, so
    batch and stream can never skew).  Compose with the streaming dedup /
    decontamination stages or a parquet sink + checkpoint.  Cap ingest
    rate with ``max_files_per_trigger`` so one giant dump drop does not
    produce an unbounded micro-batch."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _good_docs(parse_crawl_lines(reader.text(path)),
                      source, min_chars)


def crawl_quarantine(spark: SparkSession, path: str,
                     min_chars: int = 1) -> DataFrame:
    """The rejected lane for the same dump: every input line that
    ``read_crawl_jsonl`` dropped, with the raw line and a reason tag.
    Row-count law: good + quarantine == input line count (tested)."""
    parsed = parse_crawl_lines(spark.read.text(path))
    bad = parsed.where(~_is_good(min_chars)
                       | F.col("url").isNull() | F.col("text").isNull())
    return bad.select(
        F.col(_RAW).alias("raw_line"),
        F.when(F.col("url").isNull() & F.col("text").isNull(),
               "unparseable_or_empty")
         .when(F.col("url").isNull(), "missing_url")
         .when(F.col("text").isNull(), "missing_text")
         .otherwise("below_min_chars").alias("reason"))
