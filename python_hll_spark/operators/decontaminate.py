"""Eval-set decontamination: remove training docs that leak evaluation
content — the step every serious LLM data pipeline runs before training.

Two tiers, both train-vs-eval (never a self-join):

- exact: eval normalized-content fingerprints are tiny (eval sets are
  thousands of docs, not billions) — collect + broadcast a semi-join
  filter, so the train scan stays a single pass with a broadcast probe.
- near: MinHash signatures on BOTH sides, banded LSH keys joined
  train x eval (broadcast the eval bands), estimated Jaccard filtered at
  ``threshold``.  Train-side work is the same signature pass dedup
  already does; the eval side is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_hll_spark.functions.text import doc_fingerprint


def contamination_exact(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Train rows whose normalized content exactly matches ANY eval doc.
    Returns the contaminated train rows (all original columns)."""
    fp = doc_fingerprint(F.col(text_col))
    eval_fps = eval_df.select(fp.alias("__fp")).distinct()
    return (train.withColumn("__fp", fp)
            .join(F.broadcast(eval_fps), "__fp", "left_semi")
            .drop("__fp"))


def decontaminate_exact(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Train rows with exact eval matches REMOVED (broadcast anti-join)."""
    fp = doc_fingerprint(F.col(text_col))
    eval_fps = eval_df.select(fp.alias("__fp")).distinct()
    return (train.withColumn("__fp", fp)
            .join(F.broadcast(eval_fps), "__fp", "left_anti")
            .drop("__fp"))


def contamination_near(train: DataFrame, eval_df: DataFrame,
                       threshold: float = 0.8, num_hashes: int = 64,
                       bands: int = 16, n: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(train id, eval id, est_jaccard) pairs above ``threshold`` — the
    near-duplicate contamination report.  Bands the eval side (tiny) and
    broadcast-joins it against the train bands."""
    from python_hll_spark.operators.dedup import (
        _band_keys_frame, minhash_signatures)

    t_sigs = minhash_signatures(train, text_col, n, num_hashes, id_col)
    e_sigs = minhash_signatures(eval_df, text_col, n, num_hashes, id_col)
    t_bands = _band_keys_frame(t_sigs, bands, id_col).alias("t")
    e_bands = _band_keys_frame(e_sigs, bands, id_col).alias("e")
    cand = (t_bands.join(F.broadcast(e_bands), ["band", "band_key"])
            .select(F.col(f"t.{id_col}").alias("train_id"),
                    F.col(f"e.{id_col}").alias("eval_id"))
            .distinct())
    t_s = t_sigs.select(F.col(id_col).alias("train_id"),
                        F.col("sig").alias("t_sig"))
    e_s = e_sigs.select(F.col(id_col).alias("eval_id"),
                        F.col("sig").alias("e_sig"))
    match_frac = (F.size(F.filter(F.zip_with("t_sig", "e_sig",
                                             lambda x, y: x == y),
                                  lambda v: v)) / F.size("t_sig"))
    scored = (cand.join(t_s, "train_id").join(F.broadcast(e_s), "eval_id")
              .withColumn("est_jaccard", F.round(match_frac, 6)))
    return (scored.where(F.col("est_jaccard") >= threshold)
            .select("train_id", "eval_id", "est_jaccard"))


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  threshold: float = 0.8, num_hashes: int = 64,
                  bands: int = 16, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Full decontamination: drop exact matches, then near-duplicates of
    eval docs at ``threshold`` estimated Jaccard."""
    clean = decontaminate_exact(train, eval_df, text_col, id_col)
    near = contamination_near(clean, eval_df, threshold, num_hashes,
                              bands, n, text_col, id_col) \
        .select(F.col("train_id").alias(id_col)).distinct()
    return clean.join(F.broadcast(near), id_col, "left_anti")


def contamination_ngrams(train: DataFrame, eval_df: DataFrame, n: int = 13,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """GPT-3/PaLM-style n-gram collision decontamination: a train doc is
    contaminated when ANY of its word ``n``-grams also occurs in the eval
    set (the published method uses 13-grams).  Deterministic — unlike the
    LSH tier there is no hash-seeded banding, so results are exactly
    SQL-mirrorable.

    Returns (id, n_grams, n_hit_grams) for every train doc with at least
    one colliding window.

    100-TB shape: n-grams travel as 8-byte xxhash64 keys.  The eval gram
    set is eval-sized (thousands of docs), so it broadcast-joins against
    the exploded train grams — the train corpus is scanned once and never
    shuffled; the only exchange groups (id, hit) pairs for the per-doc
    count, and only HITS reach it.
    """
    from python_hll_spark.functions.text import _norm_word_array

    def gram_hashes(col):
        words = _norm_word_array(col)
        idx = F.when(F.size(words) >= n,
                     F.sequence(F.lit(1), F.size(words) - n + 1)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.xxhash64(
            F.concat_ws(" ", F.slice(words, i, n))))

    eval_grams = (eval_df
                  .select(F.explode(gram_hashes(F.col(text_col)))
                          .alias("__h"))
                  .distinct())
    t = train.select(F.col(id_col),
                     gram_hashes(F.col(text_col)).alias("__g"))
    hits = (t.select(id_col, F.size("__g").alias("n_grams"),
                     F.explode(F.array_distinct("__g")).alias("__h"))
            .join(F.broadcast(eval_grams), "__h")
            .groupBy(id_col, "n_grams")
            .agg(F.count("*").alias("n_hit_grams")))
    return hits


def decontaminate_ngrams(train: DataFrame, eval_df: DataFrame, n: int = 13,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Train rows sharing NO word n-gram with the eval set (broadcast
    anti-join against the collision report's ids)."""
    bad = contamination_ngrams(train, eval_df, n, text_col, id_col) \
        .select(id_col)
    return train.join(F.broadcast(bad), id_col, "left_anti")
