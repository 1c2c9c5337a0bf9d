"""Driver-simulation: run every __spark_entry__ query at sf0.01 and compare
against its DuckDB oracle (row count + column names + order-insensitive
values), mirroring CORRECTNESS_r{N}.json semantics.  Rows-only queries are
smoke-checked for execution + row count."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from python_hll_spark.plans.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional argv[2:]: restrict to named queries (spot-check during dev)
ONLY = set(sys.argv[2:])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


def main():
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    timings = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        timings[name] = dt
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows in {dt:.1f}s (rows-only)")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = normalize(srows, scols) == normalize(drows, dcols)
        status = "OK   " if (ok_cols and ok_count and ok_vals) else "FAIL "
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} "
              f"vals={ok_vals} ({dt:.1f}s)")
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {scols}\n   duck  cols: {dcols}")
            if ok_cols and not ok_vals:
                sn, dn = normalize(srows, scols), normalize(drows, dcols)
                only_s = [x for x in sn if x not in set(dn)][:3]
                only_d = [x for x in dn if x not in set(sn)][:3]
                print(f"   only-spark: {only_s}\n   only-duck : {only_d}")

    # entry() smoke
    edf = entrymod.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema {edf.columns}")
    if len(erows) == 0:
        failures.append("entry")

    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print(f"total spark wall: {sum(timings.values()):.1f}s over "
          f"{len(timings)} queries; slowest: "
          + ", ".join(f"{k}={v:.1f}s" for k, v in slowest))

    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL ORACLES MATCH")


if __name__ == "__main__":
    main()
