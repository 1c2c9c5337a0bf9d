"""Context-window chunking: long tokenized documents -> overlapping
fixed-width training/RAG chunks.

The other half of sequence preparation next to ``packing``: packing
concatenates SHORT docs up to seq_len; chunking splits LONG docs down to a
window, with an overlap (``stride`` < ``window``) so no span of
``window - stride`` tokens is ever cut in half — the standard long-document
treatment for pretraining and retrieval indexing.

Semantics (cover-the-end): a doc of ``n`` tokens yields
``1`` chunk if ``n <= window``, else ``ceil((n - window) / stride) + 1``
chunks starting at ``0, stride, 2*stride, ...``; every chunk is exactly
``window`` tokens except the last, which holds the remaining
``n - (n_chunks - 1) * stride`` — so every token appears in at least one
chunk and chunk boundaries are deterministic functions of ``n`` alone.

Spark shape: pure JVM expressions — ``sequence`` builds the start offsets,
``posexplode`` fans out rows, ``slice`` cuts the windows.  Zero shuffle,
zero Python; the whole operator inlines into the scan's codegen stage and
composes with any downstream groupBy/write.  At 10^12 rows the fan-out
factor is bounded by ``~n/stride`` per doc and each output row is built by
pointer arithmetic over the parent array — no row ever leaves its input
partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_chunks(n: Column, window: int, stride: int) -> Column:
    # exact integer ceil((n - window)/stride) + 1; doubles are exact here
    # (n is a per-doc token count, far below 2^53)
    return (F.when(n <= window, F.lit(1))
            .otherwise(F.floor((n - window + stride - 1) / stride) + 1)
            .cast("int"))


def chunk_tokens(df: DataFrame, window: int, stride: int | None = None,
                 token_col: str = "tokens", id_col: str = "doc_id",
                 drop_empty: bool = True) -> DataFrame:
    """Explode each row's ``token_col`` array into overlapping chunks.

    Returns ``df``'s id column plus (chunk_idx int, chunk array — same
    element type as ``token_col``, chunk_len int).  ``stride`` defaults to
    ``window`` (disjoint chunks).  Rows with an empty token array emit
    nothing when ``drop_empty`` (a doc with no tokens has no training
    value), else one empty chunk.
    """
    if stride is None:
        stride = window
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    n = F.size(F.col(token_col))
    nc = _n_chunks(n, window, stride)
    starts = F.transform(F.sequence(F.lit(0), nc - 1),
                         lambda i: i * stride)
    base = df.where(n > 0) if drop_empty else df
    exploded = base.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        F.slice(F.col(token_col), F.col("__start") + 1,
                window).alias("chunk"))
    return (exploded
            .withColumn("chunk_len", F.size("chunk"))
            .drop("__start"))


def chunk_text_words(df: DataFrame, window: int, stride: int | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     sep: str = " ") -> DataFrame:
    """Word-level chunking of raw text: tokenize with the library's word
    rule (``[A-Za-z0-9]+`` runs, the same rule ``functions.text`` counts
    by), chunk the word array, and re-join each chunk with ``sep``.
    Returns (id, chunk_idx, chunk_text, chunk_len).  Whitespace-only and
    symbol-only docs emit nothing."""
    words = F.expr(f"regexp_extract_all({text_col}, '[A-Za-z0-9]+', 0)")
    chunks = chunk_tokens(df.select(F.col(id_col), words.alias("__w")),
                          window, stride, token_col="__w", id_col=id_col)
    return chunks.select(
        F.col(id_col), "chunk_idx",
        F.array_join("chunk", sep).alias("chunk_text"), "chunk_len")


def reconstruct_ok(chunked: DataFrame, original: DataFrame,
                   window: int, stride: int,
                   token_col: str = "tokens",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc boolean audit that chunking is lossless and correctly
    overlapped: taking the first ``stride`` tokens of every chunk but the
    last, then the whole last chunk, must rebuild the original array
    exactly.  One groupBy on the id (the only shuffle; audit-time only).
    Returns (id, n_chunks, tok_total, ok)."""
    rebuilt = (chunked
               .groupBy(id_col)
               .agg(F.count("*").alias("n_chunks"),
                    F.sum("chunk_len").alias("tok_total"),
                    F.max("chunk_idx").alias("__mx"),
                    F.sort_array(F.collect_list(
                        F.struct("chunk_idx", "chunk"))).alias("__cs")))
    parts = F.transform(
        F.col("__cs"),
        lambda s: F.when(s["chunk_idx"] < F.col("__mx"),
                         F.slice(s["chunk"], 1, stride))
                   .otherwise(s["chunk"]))
    rebuilt = rebuilt.withColumn("__flat", F.flatten(parts))
    orig = original.select(F.col(id_col),
                           F.col(token_col).alias("__orig"))
    return (rebuilt.join(orig, id_col)
            .select(id_col, "n_chunks",
                    F.col("tok_total").cast("bigint").alias("tok_total"),
                    (F.col("__flat") == F.col("__orig")).alias("ok")))
