"""Deterministic training-shard shuffle — the last step of a corpus
pipeline: decorrelate document order from source/crawl order and land the
corpus in N balanced shards that a data loader streams sequentially.

Training runs need (a) every surviving row exactly once, (b) a
pseudo-random global order uncorrelated with ingest order (adjacent crawl
docs are near-duplicates of each other's distribution — reading them
back-to-back skews gradients), (c) balanced shard sizes so loader workers
finish together, and (d) bit-for-bit reproducibility from a seed.

Spark shape: ONE shuffle.  shard = pmod(xxhash64(seed, id), n_shards)
balances by hash; the within-shard order is ascending seeded hash, i.e.
the same pseudo-random permutation on every run, independent of input
partitioning.  The position column is a window over the shard key, which
Catalyst satisfies with the repartition's existing hash partitioning —
sort only, no second exchange (pinned by tests/test_shards.py).

At 10^12 rows: n_shards scales with the corpus (shards of ~10^6 docs);
the single shuffle moves each row once, the per-task sort is
O(rows-per-shard log rows-per-shard), and the write streams straight out
of the sorted partitions.  No driver-side state of any kind.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KEY = "__shard_key"


def _id_cols(id_col: str | Sequence[str]) -> list[str]:
    # a chunked corpus has no single unique column: accept a composite key
    # (list, or comma-separated string from the CLI) so (doc_id, chunk_idx)
    # rows still get a collision-free deterministic order key
    if isinstance(id_col, str):
        return [c.strip() for c in id_col.split(",") if c.strip()]
    return list(id_col)


def assign_shards(df: DataFrame, n_shards: int, seed: int = 42,
                  id_col: str | Sequence[str] = "doc_id") -> DataFrame:
    """Append ``shard`` (int, [0, n_shards)) and the seeded order key.
    Pure projection — composes into any scan, zero shuffle.  ``id_col``
    may be a composite key (list or comma-separated) — it must uniquely
    identify a row for the within-shard order to be reproducible."""
    cols = _id_cols(id_col)
    key = F.xxhash64(F.lit(seed), *[F.col(c) for c in cols])
    return (df.withColumn(_KEY, key)
            .withColumn("shard",
                        F.pmod(F.col(_KEY), F.lit(n_shards)).cast("int")))


def shuffle_shards(df: DataFrame, n_shards: int, seed: int = 42,
                   id_col: str | Sequence[str] = "doc_id") -> DataFrame:
    """Seeded global shuffle: returns ``df``'s columns plus ``shard`` and
    ``pos`` (1-based position within the shard in seeded pseudo-random
    order).  Deterministic for a given (seed, n_shards, ids) regardless of
    input partitioning or cluster size; exactly one Exchange."""
    cols = _id_cols(id_col)
    tagged = assign_shards(df, n_shards, seed, cols)
    # repartition ON the shard column: the window below reuses this hash
    # partitioning (sort, no second exchange), and each output partition
    # holds whole shards, so the partitionBy-writer emits one directory's
    # rows from one task
    parted = tagged.repartition(n_shards, "shard")
    w = Window.partitionBy("shard").orderBy(
        F.col(_KEY), *[F.col(c) for c in cols])
    return (parted.withColumn("pos", F.row_number().over(w))
            .drop(_KEY))


def write_shards(df: DataFrame, path: str, n_shards: int, seed: int = 42,
                 id_col: str | Sequence[str] = "doc_id",
                 fmt: str = "parquet") -> None:
    """Materialize the shuffled corpus under ``{path}/shard=K/``.  Rows in
    each shard's files are in ``pos`` order (the sort the plan already
    has), so loaders can stream shard files sequentially without a sort of
    their own."""
    out = shuffle_shards(df, n_shards, seed, id_col) \
        .sortWithinPartitions("shard", "pos")
    out.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)
