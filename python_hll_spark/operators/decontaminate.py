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
