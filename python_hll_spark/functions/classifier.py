"""Hashed n-gram linear quality classifier — the fastText-style "model
score" stage of an LLM data pipeline (GPT-3/LLaMA-era pipelines filter
web text with exactly this shape of model: hashed uni+bigram features ->
mean pooling -> linear layer -> sigmoid).

The Spark-side plumbing is the real deliverable: ONE shuffle-free
``mapInArrow`` pass over pre-hashed tokens, numpy-vectorized feature
hashing and weight gather, weights either regenerated per task from a
seed (default: deterministic synthetic weights, no broadcast traffic at
all) or supplied as a real trained vector (closure-captured -> Spark
broadcasts it once per executor; a 2^18-bucket float32 model is 1 MiB).
Swap ``weights``/``bias`` for fastText-derived values to run a real
model — the kernel does not change.

Scale shape: linear single scan, zero shuffle, zero per-row Python;
composes with ``operators.sampling.group_topk`` / ``web.domain_cap`` as
the quality key for score-ranked retention.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

_PHI64 = np.uint64(0x9E3779B97F4A7C15)


def synthetic_weights(n_buckets: int, seed: int = 7) -> np.ndarray:
    """Deterministic stand-in weight vector (swap for a trained model)."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n_buckets) * 0.5).astype(np.float32)


def _score_segments(flat: np.ndarray, offs: np.ndarray, w: np.ndarray,
                    nb: np.uint64, bias: float, bigrams: bool) -> np.ndarray:
    """Per-document sigmoid scores from a flat uint64 token-hash buffer +
    int64 doc offsets (the Arrow list layout).  Shared by the (id, score)
    kernel and the column-appending passthrough kernel."""
    n_docs = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    contrib = w[(flat % nb).astype(np.int64)].astype(np.float64)
    # prefix-sum segment reduction (reduceat mishandles empty segments)
    csum = np.concatenate([[0.0], np.cumsum(contrib)])
    uni_sum = csum[offs[1:]] - csum[offs[:-1]]
    tot_sum, tot_n = uni_sum, lens.astype(np.float64)
    if bigrams and len(flat) > 1:
        # adjacent-pair mix; pairs crossing doc boundaries are masked out
        # via the per-doc last position
        big = (flat[:-1] * _PHI64) ^ flat[1:]
        bcontrib = w[(big % nb).astype(np.int64)].astype(np.float64)
        last = offs[1:] - 1              # last token index per doc
        valid = np.ones(len(flat) - 1, dtype=bool)
        valid[last[(last >= 0) & (last < len(flat) - 1)]] = False
        bcontrib = np.where(valid, bcontrib, 0.0)
        bcsum = np.concatenate([[0.0], np.cumsum(bcontrib)])
        # clamp BOTH ends into bcsum's index range: a trailing empty doc
        # has s == offs[-1] == len(flat), one past bcsum's last slot
        cap = len(flat) - 1
        s = np.minimum(offs[:-1], cap)
        e = np.maximum(np.minimum(offs[1:] - 1, cap), s)
        tot_sum = tot_sum + (bcsum[e] - bcsum[s])
        tot_n = tot_n + np.maximum(lens - 1, 0).astype(np.float64)
    mean = np.divide(tot_sum, tot_n, out=np.zeros(n_docs), where=tot_n > 0)
    return 1.0 / (1.0 + np.exp(-(bias + mean)))


def classifier_scores_tokens(df: DataFrame, tokens_col: str = "tokens",
                             id_col: str = "doc_id",
                             n_buckets: int = 1 << 18, seed: int = 7,
                             bias: float = 0.0,
                             weights: np.ndarray | None = None,
                             bigrams: bool = True) -> DataFrame:
    """(id, score double): sigmoid(bias + mean(w[feature buckets])) per
    document over hashed unigram (+ adjacent-bigram) features of a
    pre-hashed ``tokens array<bigint>`` column.  Empty/null token lists
    score sigmoid(bias) — rank-neutral, never dropped here (length
    filtering is a separate, explicit stage)."""
    dtypes = dict(df.dtypes)
    id_type = dtypes[id_col]
    nb = np.uint64(n_buckets)

    def gen(batches):
        import pyarrow as pa

        # per-task weight materialization: regenerated from the seed when
        # no trained vector is supplied (cheap, keeps the closure tiny)
        w = np.asarray(weights if weights is not None
                       else synthetic_weights(n_buckets, seed),
                       dtype=np.float32)
        for batch in batches:
            toks = batch.column(tokens_col)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offs = toks.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            offs = offs - offs[0]
            flat = toks.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.uint64, copy=False)
            score = _score_segments(flat, offs, w, nb, bias, bigrams)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(score, pa.float64())],
                names=[id_col, "score"])

    return df.select(id_col, tokens_col).mapInArrow(
        gen, schema=f"`{id_col}` {id_type}, score double")


def with_classifier_score(df: DataFrame, text_col: str = "text",
                          n_buckets: int = 1 << 18, seed: int = 7,
                          bias: float = 0.0,
                          weights: np.ndarray | None = None,
                          bigrams: bool = True) -> DataFrame:
    """ALL original columns + ``score`` double, in ONE mapInArrow pass
    (tokenize + feature-hash + score inline) — the filter-stage shape:
    no (id, score) join back against the payload, no shuffle at all;
    ``df.where(F.col("score") >= t)`` composes directly.  Scores are
    identical to ``classifier_scores`` (same kernel)."""
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import word_hash_segments

    nb = np.uint64(n_buckets)
    text_idx = df.columns.index(text_col)

    def gen(batches):
        w = np.asarray(weights if weights is not None
                       else synthetic_weights(n_buckets, seed),
                       dtype=np.float32)
        for batch in batches:
            txt = batch.column(text_idx)
            # same tokenization as dedup.tokenize_word_hashes: lowercase,
            # whitespace split, murmur3 word hashes (word_hash_segments —
            # buffer-tail-safe; see its docstring for the pyarrow
            # utf8_split_whitespace overread this avoids)
            hashes, counts = word_hash_segments(txt)
            flat = hashes.view(np.uint64)
            tok_offs = np.concatenate(
                [[0], np.cumsum(counts)]).astype(np.int64)
            score = _score_segments(flat, tok_offs, w, nb, bias, bigrams)
            cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c for c in batch.columns]
            yield pa.RecordBatch.from_arrays(
                cols + [pa.array(score, pa.float64())],
                names=list(batch.schema.names) + ["score"])

    fields = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)
    return df.mapInArrow(gen, schema=f"{fields}, score double")


def classifier_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", **kw) -> DataFrame:
    """(id, score) from raw text: one shared Arrow tokenizer pass
    (``dedup.tokenize_word_hashes``) then the token-hash kernel."""
    from python_hll_spark.operators.dedup import tokenize_word_hashes

    toks = tokenize_word_hashes(df, text_col=text_col, id_col=id_col)
    return classifier_scores_tokens(toks, tokens_col="tokens",
                                    id_col=id_col, **kw)
