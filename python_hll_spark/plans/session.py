"""SparkSession construction with the engine's scale-oriented defaults.

These settings are what we'd ship to a 1000-executor cluster; on the
sandbox's local[N] they matter mostly for Arrow batch shaping and AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # local[N] runs all tasks in the driver JVM: size the heap for N
    # concurrent parquet/Arrow column batches (overridden by spark-submit
    # on a real cluster).
    "spark.driver.memory": "12g",
    # Arrow is the JVM<->Python boundary for every sketch UDF: always on.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Token rows are wide (array<int32> ~200 elems); 8k rows/batch keeps
    # Arrow batches ~10MB and numpy passes cache-friendly.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    # AQE re-plans the tiny merge shuffles and coalesces partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Partial-sketch rows are tiny; don't over-shard the merge stage.
    "spark.sql.shuffle.partitions": "32",
    # 128MB scan splits (parquet row-group aligned) — the 100TB default.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Iterative algorithms (connected components) reliable-checkpoint every
    # round; without this the checkpoint files outlive their RDDs and a
    # long-running session's disk grows without bound.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
}


def get_spark(app_name: str = "python-hll-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None,
              checkpoint_dir: str | None = None) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Reliable checkpoint location for iterative algorithms (connected
    # components): survives executor loss, unlike localCheckpoint.  On a
    # real cluster point SPARK_GRAFT_CHECKPOINT_DIR at HDFS/S3.
    if spark.sparkContext.getCheckpointDir() is None:
        ckpt = (checkpoint_dir
                or os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
                or os.path.join(os.environ.get("TMPDIR", "/tmp"),
                                "spark_graft_checkpoints"))
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
