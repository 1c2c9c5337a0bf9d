"""Iceberg catalog round-trip — gated on the Iceberg runtime jar.

north_rule targets Iceberg token tables; this sandbox ships no Iceberg jar
and has no network to fetch one, so the test SKIPS here but runs anywhere
the jar exists (set ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar, or
drop it into $SPARK_HOME/jars).  It proves the single swap point
(sources/tables.read_seqs(table=...)) actually works against a hadoop-type
Iceberg catalog: write the deterministic token table, read it back through
the catalog, and verify per-row token-array equality vs the parquet source.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    try:
        import pyspark
        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    except Exception:  # noqa: BLE001
        pass
    return None


_WORKER = r"""
import json, sys
from pyspark.sql import SparkSession, functions as F

warehouse, out_path = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[2]")
         .appName("iceberg-roundtrip")
         .config("spark.jars", sys.argv[3])
         .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
         .config("spark.sql.catalog.lake.type", "hadoop")
         .config("spark.sql.catalog.lake.warehouse", warehouse)
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
from python_hll_spark.sources.seqs import seqs_table
from python_hll_spark.sources.tables import read_seqs

src = seqs_table(spark, 200, partitions=4)
src.writeTo("lake.db.seqs").using("iceberg").createOrReplace()
back = read_seqs(spark, table="lake.db.seqs")
diff = (src.alias("a").join(back.alias("b"), "doc_id")
        .where(F.col("a.tokens") != F.col("b.tokens")).count())
print(json.dumps({"rows": back.count(), "token_mismatches": diff}))
spark.stop()
"""


@pytest.mark.skipif(_find_iceberg_jar() is None,
                    reason="Iceberg runtime jar not available in this "
                           "sandbox (no network); set ICEBERG_JAR to run")
def test_iceberg_catalog_roundtrip(tmp_path):
    jar = _find_iceberg_jar()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "warehouse"),
         str(tmp_path / "out"), jar],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO})
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] == 200
    assert res["token_mismatches"] == 0
