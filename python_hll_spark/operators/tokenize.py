"""Corpus tokenization: clean text -> the pre-tokenized training table
``(doc_id, tokens:array<int32>, n_tok, source)`` every sketch/dedup
operator in this library consumes.

Closes the pipeline loop: ``prepare_corpus``/``refresh_corpus`` emit clean
TEXT, but the north-rule input shape is token arrays.  This module builds
a frequency vocabulary over the corpus and encodes each document against
it, with one reserved id for out-of-vocabulary words.

Tokenization rule: the library's word rule — ASCII-lowercase + ASCII-
whitespace split, words identified by their murmur3-x64-128-h1 hash —
i.e. exactly ``functions.murmur3.word_hash_segments``, the same kernel
MinHash and the quality classifier tokenize with.  Identifying vocabulary
entries by their 64-bit hash instead of the word string keeps both passes
pure numpy over Arrow buffers (zero per-word Python) and makes the vocab
frame 16 bytes/entry; a 64-bit collision between two distinct corpus words
is ~n²/2⁶⁵ (≈3e-7 at a 1M-word vocabulary) and would merely merge two ids.

Spark shape, sized for 10^12 rows:

- ``word_hash_counts``: one ``mapInArrow`` pass doing per-batch
  ``np.unique`` partial counts (the map-side combine — the shuffle moves
  (hash, partial_count) pairs bounded by per-task vocabulary, NOT one row
  per word occurrence), then one groupBy-sum.  Output is
  vocabulary-sized, orders of magnitude smaller than the corpus.
- ``build_vocab``: global top-``vocab_size`` of that counts frame by
  (count desc, hash asc — deterministic ties), ids assigned 1..V by the
  same order.  The single-partition window runs on a vocabulary-scale
  frame (≤ vocab_size rows after a distributed ``limit``), never on
  corpus-scale data.
- ``encode_corpus``: vocab broadcast to executors as two sorted numpy
  arrays; each batch re-runs the word-hash kernel and maps hashes to ids
  with one ``np.searchsorted`` — vectorized, shuffle-free, streams from
  the scan to the writer.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK_ID = 0  # reserved out-of-vocabulary id; vocabulary words get 1..V


def word_hash_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word_hash bigint, count bigint) corpus word frequencies under the
    library word rule.  One Arrow pass with per-batch partial counts, one
    vocabulary-sized shuffle."""
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import word_hash_segments

    def gen(batches):
        for batch in batches:
            hashes, _ = word_hash_segments(batch.column(0))
            if len(hashes) == 0:
                continue
            uniq, cnt = np.unique(hashes, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq, pa.int64()), pa.array(cnt, pa.int64())],
                names=["word_hash", "count"])

    partial = df.select(text_col).mapInArrow(
        gen, schema="word_hash long, count long")
    return partial.groupBy("word_hash").agg(
        F.sum("count").alias("count"))


def build_vocab(df: DataFrame, vocab_size: int, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """(word_hash bigint, id int, count bigint): the ``vocab_size`` most
    frequent corpus words, ids 1..V assigned by (count desc, hash asc) —
    fully deterministic including ties."""
    counts = word_hash_counts(df, text_col)
    if min_count > 1:
        counts = counts.where(F.col("count") >= min_count)
    top = counts.orderBy(F.col("count").desc(), F.col("word_hash")) \
        .limit(vocab_size)
    # vocabulary-scale frame: the one-partition sort window is fine here
    from pyspark.sql import Window
    w = Window.orderBy(F.col("count").desc(), F.col("word_hash"))
    return top.select(
        "word_hash",
        F.row_number().over(w).cast("int").alias("id"),
        "count")


def extend_vocab(vocab: DataFrame, df: DataFrame, max_size: int,
                 text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Grow an existing vocab with a new batch's frequent words WITHOUT
    touching existing ids (re-encoding yesterday's 100 TB because an id
    moved is not an option): words already in ``vocab`` keep their id;
    new words take ids V+1, V+2, ... by (batch count desc, hash asc),
    until ``max_size``.  Returns the same (word_hash, id, count) shape
    with counts refreshed to include the new batch."""
    new_counts = word_hash_counts(df, text_col)
    if min_count > 1:
        new_counts = new_counts.where(F.col("count") >= min_count)
    old = vocab.select("word_hash", "id",
                       F.col("count").alias("__old_count"))
    joined = new_counts.join(F.broadcast(old), "word_hash", "full_outer")
    kept = (joined.where(F.col("id").isNotNull())
            .select("word_hash", "id",
                    (F.coalesce(F.col("count"), F.lit(0))
                     + F.col("__old_count")).alias("count")))
    n_old = vocab.count()
    room = max_size - n_old
    if room <= 0:
        return kept
    fresh = (joined.where(F.col("id").isNull())
             .orderBy(F.col("count").desc(), F.col("word_hash"))
             .limit(room))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("count").desc(), F.col("word_hash"))
    fresh = fresh.select(
        "word_hash",
        (F.row_number().over(w) + F.lit(n_old)).cast("int").alias("id"),
        "count")
    return kept.unionByName(fresh)


def encode_corpus(df: DataFrame, vocab: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Encode each document against ``vocab``: returns
    (id_col, tokens array<int>, n_tok int, *keep_cols) — the library's
    pre-tokenized input shape.  OOV words map to ``UNK_ID``; n_tok counts
    every word (in-vocab or not), so ``n_tok`` equals the word count of
    the document under the library word rule."""
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import word_hash_segments

    rows = vocab.select("word_hash", "id").collect()
    h = np.array([r["word_hash"] for r in rows], dtype=np.int64)
    ids = np.array([r["id"] for r in rows], dtype=np.int32)
    order = np.argsort(h)
    h_sorted, ids_sorted = h[order], ids[order]
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((h_sorted, ids_sorted))

    keep = [c for c in keep_cols if c in df.columns]
    cols = [id_col, text_col] + keep
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"`{id_col}` {dtypes[id_col]}", "tokens array<int>", "n_tok int"]
        + [f"`{c}` {dtypes[c]}" for c in keep])

    def gen(batches):
        hs, idv = bc.value
        for batch in batches:
            hashes, counts = word_hash_segments(batch.column(1))
            if len(hashes) and len(hs) == 0:
                tok = np.full(len(hashes), UNK_ID, dtype=np.int32)
            elif len(hashes):
                pos = np.searchsorted(hs, hashes)
                pos[pos == len(hs)] = 0
                tok = np.where(hs[pos] == hashes, idv[pos],
                               np.int32(UNK_ID)).astype(np.int32)
            else:
                tok = np.empty(0, dtype=np.int32)
            offsets = np.concatenate(
                ([0], np.cumsum(counts))).astype(np.int32)
            arrs = [batch.column(0),
                    pa.ListArray.from_arrays(pa.array(offsets),
                                             pa.array(tok, pa.int32())),
                    pa.array(counts.astype(np.int32), pa.int32())]
            arrs += [batch.column(i + 2) for i in range(len(keep))]
            yield pa.RecordBatch.from_arrays(
                arrs, names=[id_col, "tokens", "n_tok"] + keep)

    return df.select(*cols).mapInArrow(gen, schema=out_schema)
