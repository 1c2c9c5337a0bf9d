"""Text-analysis column functions for training-data pipelines.

Everything here is pure ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — no Python UDFs in these paths, so they run at scan speed over
100TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"

# Small, deterministic stopword lists for the n-gram language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "que", "dans", "pour", "une"],
    "es": ["el", "la", "los", "las", "que", "de", "en", "es", "por", "con"],
}


def word_count(text: Column) -> Column:
    """Number of [A-Za-z0-9]+ word matches (BPE-ish token proxy)."""
    return F.regexp_count(text, F.lit(WORD_RE))


def whitespace_token_count(text: Column) -> Column:
    """Whitespace tokenization count (robust to leading/trailing space)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-pre-tokenizer-style token count: letter runs, digit runs, and
    individual punctuation/symbol characters each count as one token (the
    GPT-2 pre-tokenizer shape, minus lookahead so the same pattern runs
    identically under Java regex AND RE2/DuckDB — the alternatives have
    disjoint first-character classes, so both engines match identically).
    A budget estimator for LLM training-token accounting."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    letters = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        letters.cast("double") / F.length(text))


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / F.length(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language's list."""
    pattern = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    wc = word_count(text)
    return F.when(wc == 0, F.lit(0.0)).otherwise(
        stopword_hits(text, lang).cast("double") / wc)


def detect_language(text: Column) -> Column:
    """Argmax over per-language stopword hit counts ('und' if all zero)."""
    hits = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best_count = F.greatest(*[h for _, h in hits])
    expr = F.lit("und")
    # reverse order so earlier (alphabetical) languages win ties
    for lang, h in reversed(hits):
        expr = F.when((best_count > 0) & (h == best_count), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length band + alpha ratio + stopword signal.

    Deterministic arithmetic only, so it can be mirrored exactly in SQL
    oracles."""
    length = F.length(text)
    len_score = F.when(length < 200, length.cast("double") / 200.0).otherwise(
        F.when(length > 20000, F.lit(0.5)).otherwise(F.lit(1.0)))
    return F.round(
        0.4 * len_score + 0.4 * alpha_ratio(text) +
        0.2 * F.least(stopword_ratio(text) * 5.0, F.lit(1.0)), 6)


def doc_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint for exact dedup: xxhash64 of the
    whitespace-normalized lowercased text (JVM-side)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(normalized)


def winnowing_fingerprints(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           window: int = 16) -> DataFrame:
    """(id, fingerprints array<bigint>): winnowed rolling-hash fingerprints.

    Standard winnowing (Schleimer/Wilkerson/Aiken): hash every k-gram of the
    normalized text with a polynomial rolling hash, then keep the minimum
    hash of each sliding window of ``window`` k-grams (dedup'd).  Robust
    doc fingerprint for near-dup / containment detection; fully vectorized
    per Arrow batch (the rolling hash is one cumulative numpy pass)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as FF

    B = np.uint64(1000003)
    norm = FF.regexp_replace(FF.lower(FF.trim(FF.col(text_col))), r"\s+", " ")
    pruned = df.select(FF.col(id_col), norm.alias("__t"))

    bk_int = pow(1000003, k, 1 << 64)  # B^k mod 2^64

    def fp_one(text: str) -> np.ndarray:
        data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        n = len(data) - k + 1
        if n <= 0:
            return np.empty(0, dtype=np.int64)
        # polynomial rolling hash of every k-gram in one vector recurrence:
        # h[i+1] = (h[i] - data[i]*B^(k-1)) * B + data[i+k]
        d = data.astype(np.uint64)
        powers = np.array([pow(1000003, k - 1 - j, 1 << 64) for j in range(k)],
                          dtype=np.uint64)
        h = np.empty(n, dtype=np.uint64)
        # windowed dot product via cumulative trick: compute first directly,
        # then vectorized recurrence via prefix transform
        h[0] = (d[:k] * powers).sum(dtype=np.uint64)
        if n > 1:
            # recurrence h[i] = h[i-1]*B - d[i-1]*B^k + d[i+k-1] (mod 2^64)
            # becomes a prefix sum after dividing out B^i: with
            # g[i] = h[i]*B^(-i), g[i] = g[0] + cumsum((d[i+k-1] -
            # d[i-1]*B^k) * B^(-i)).  B is odd so B^(-1) exists mod 2^64,
            # and uint64 wraparound IS mod-2^64 arithmetic.
            Binv = np.uint64(pow(int(B), -1, 1 << 64))
            binv_pow = np.cumprod(np.full(n - 1, Binv, dtype=np.uint64))
            term = (d[k:] - d[:n - 1] * np.uint64(bk_int)) * binv_pow
            acc = np.cumsum(term, dtype=np.uint64) + h[0]
            # B^i via cumulative product
            b_pow = np.cumprod(np.full(n - 1, B, dtype=np.uint64))
            h[1:] = acc * b_pow
        # winnow: min per sliding window of `window` hashes
        if n <= window:
            sel = np.array([h.argmin()])
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(h, window).argmin(axis=1)
            sel = np.unique(mins + np.arange(len(mins)))
        return np.unique(h[sel]).view(np.int64)

    def compute(batches):
        for pdf in batches:
            fps = [fp_one(t) for t in pdf["__t"]]
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprints": fps})

    id_type = dict(df.dtypes)[id_col]
    return pruned.mapInPandas(compute,
                              schema=f"`{id_col}` {id_type}, fingerprints array<bigint>")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (df
            .withColumn("n_words", word_count(t))
            .withColumn("n_ws_tokens", whitespace_token_count(t))
            .withColumn("n_bpe_tokens", bpe_token_count(t))
            .withColumn("alpha_ratio", F.round(alpha_ratio(t), 6))
            .withColumn("quality", quality_score(t))
            .withColumn("lang_pred", detect_language(t))
            .withColumn("fingerprint", doc_fingerprint(t)))
