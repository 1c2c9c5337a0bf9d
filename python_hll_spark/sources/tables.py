"""Token-table readers: Iceberg catalog when available, parquet fallback.

north_rule targets Iceberg tables of pre-tokenized sequences.  The local
pyspark distribution ships no Iceberg runtime jar, so this module is the
single swap point: on a cluster, submit with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hadoop \
        --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> ...

and pass ``table="lake.db.seqs"``; in this sandbox, pass a parquet ``path``.
Checkpoint state (sources/state.py) keeps the same Iceberg-shaped
commit-by-manifest semantics on the parquet fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEQS_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_seqs(spark: SparkSession, path: str | None = None,
              table: str | None = None) -> DataFrame:
    """Load the token table from an Iceberg table name or a parquet path,
    pruned to the input_hint schema columns."""
    if table is not None:
        df = spark.read.table(table)
    elif path is not None:
        df = spark.read.parquet(path)
    else:
        raise ValueError("pass either table= (Iceberg) or path= (parquet)")
    return df.select(*[c for c in SEQS_COLUMNS if c in df.columns])


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 64, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist a table bucketed (and optionally sorted) by a join/group key.

    Bucketing is the 100 TB co-location lever Spark gives tables that are
    joined or grouped repeatedly on the same key: both sides of an
    equi-join on ``bucket_col`` (with matching bucket counts) scan
    pre-shuffled data, so the join plans with ZERO Exchange — at cluster
    scale that deletes the dominant all-to-all network step.  On Iceberg
    the same lever is the bucket partition transform
    (``PARTITIONED BY (bucket(N, col))``); this writes a Spark-native
    bucketed table into the session warehouse (works in-sandbox).
    """
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.mode(mode).format("parquet").saveAsTable(table_name)
