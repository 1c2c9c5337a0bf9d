"""SQL surface: the sketch algebra callable from spark.sql().

``SELECT source, hll_card(hll_union_agg(state)) FROM states GROUP BY source``
must equal the kernel-level union byte-for-byte — SQL users get the same
monoid the operators use.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_hll_spark.functions.sketch_funcs import register_sql_functions
from python_hll_spark.operators.ndv import hll_ndv_column
from python_hll_spark.sketches.hll import HLLConfig

CFG = HLLConfig.create(11, 5)


@pytest.fixture()
def registered(spark):
    names = register_sql_functions(spark)
    assert "hll_union_agg" in names and "kll_quantile" in names
    return spark


def test_sql_hll_union_agg_matches_kernel(registered, spark):
    rows = [(f"d{p}-{i}", f"s{i % 3}", p) for p in range(3) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id string, source string, p int")
    # three per-partition state rows per source (the store shape)
    parts = [hll_ndv_column(docs.where(F.col("p") == p), "doc_id",
                            by=["source"], cfg=CFG).select("source", "state")
             for p in range(3)]
    states = parts[0].unionByName(parts[1]).unionByName(parts[2])
    states.createOrReplaceTempView("daily_states")

    got = {r["source"]: (bytes(r["merged"]), r["ndv"]) for r in spark.sql("""
        SELECT source, hll_union_agg(state) AS merged,
               hll_card(hll_union_agg(state)) AS ndv
        FROM daily_states GROUP BY source""").collect()}

    direct = {r["source"]: (bytes(r["state"]), r["ndv"]) for r in
              hll_ndv_column(docs, "doc_id", by=["source"], cfg=CFG)
              .select("source", "state", "ndv").collect()}
    assert got == direct  # byte-identical states AND identical estimates


def test_sql_kll_quantile_roundtrip(registered, spark):
    from python_hll_spark.operators.quantiles import sketch_quantiles
    from python_hll_spark.sketches.kll import KLLConfig

    rng = np.random.default_rng(3)
    vals = [(f"g{i % 2}", float(v)) for i, v in
            enumerate(rng.uniform(0, 100, 4000))]
    df = spark.createDataFrame(vals, "g string, v double")
    est = sketch_quantiles(df, "v", [0.5], by=["g"], method="kll", k=200)
    est.select("g", "state").createOrReplaceTempView("kll_states")

    got = {r["g"]: r["med"] for r in spark.sql(
        "SELECT g, kll_quantile(state, 0.5d) AS med FROM kll_states").collect()}
    tol = 3 * KLLConfig(k=200).rank_error * 100 + 1e-6
    for g in ("g0", "g1"):
        assert abs(got[g] - 50.0) <= max(tol, 5.0), (g, got[g])
