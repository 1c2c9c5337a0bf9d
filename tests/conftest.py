import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DATA_DIR = "/root/reference/tests/data"
TESTDATA_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from python_hll_spark.plans.session import get_spark

    spark = get_spark(app_name="python-hll-spark-tests", master="local[4]",
                      shuffle_partitions=8)
    yield spark
    spark.stop()
