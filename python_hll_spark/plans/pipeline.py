"""End-to-end training-corpus preparation: the composition the individual
operators exist for.

    prepare_corpus(df) =
        text stats / language-ID / quality scoring     (pure JVM functions)
        -> quality + language filters                  (Catalyst predicates)
        -> exact dedup (content-hash groupBy)
        -> near-dup removal (MinHash-LSH -> connected components)
        + per-stage metrics and a final sketch profile of what survived

Every stage is the already-tested operator; this module only sequences them
and accounts rows, so the 100TB properties (pruned scans, no raw shuffles
in sketch stages, bounded LSH joins) carry over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_hll_spark.functions.text import with_text_stats
from python_hll_spark.operators.dedup import near_dedup


@dataclass
class CorpusFilterConfig:
    min_quality: float = 0.3
    min_words: int = 5
    max_words: int = 100_000
    allowed_langs: tuple = ("en", "de", "fr", "es", "und")
    near_dup_threshold: float = 0.9
    minhash_hashes: int = 64
    minhash_bands: int = 16
    run_near_dedup: bool = True


def prepare_corpus(df: DataFrame, cfg: CorpusFilterConfig | None = None,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Returns (clean_df, metrics dict).  clean_df keeps the original
    columns plus the computed quality/lang columns."""
    cfg = cfg or CorpusFilterConfig()
    metrics: dict = {"rows_in": df.count()}

    scored = with_text_stats(df, text_col)
    filtered = scored.where(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("n_words") >= cfg.min_words)
        & (F.col("n_words") <= cfg.max_words)
        & (F.col("lang_pred").isin(*cfg.allowed_langs)))
    metrics["rows_after_quality"] = filtered.count()

    # exact dedup: keep min-id representative per fingerprint
    w_rank = F.row_number().over(
        Window.partitionBy("fingerprint").orderBy(F.asc(id_col)))
    exact_unique = (filtered.withColumn("__rn", w_rank)
                    .where(F.col("__rn") == 1).drop("__rn"))
    metrics["rows_after_exact_dedup"] = exact_unique.count()

    if cfg.run_near_dedup:
        clean = near_dedup(exact_unique, text_col=text_col, id_col=id_col,
                           threshold=cfg.near_dup_threshold,
                           num_hashes=cfg.minhash_hashes,
                           bands=cfg.minhash_bands)
        metrics["rows_after_near_dedup"] = clean.count()
    else:
        clean = exact_unique
    metrics["rows_out"] = metrics.get("rows_after_near_dedup",
                                      metrics["rows_after_exact_dedup"])
    return clean, metrics
