"""Golden-vector replay: postgresql-hll generated CSVs from the reference
checkout (/root/reference/tests/data, provenance citusdata/postgresql-hll).

Every present CSV is replayed through our vectorized kernel asserting BOTH
the exact serialized hex and the float cardinality (pytest.approx), matching
the reference's own integration harness (test_integration.py:123-176).
"""

import csv
import os

import numpy as np
import pytest

from python_hll_spark.sketches.hll import HLLConfig, HLLSketch, HLLType

DATA = "/root/reference/tests/data"

ADD_FILES = [
    "cumulative_add_sparse_edge.csv",
    "cumulative_add_sparse_random.csv",
    "cumulative_add_sparse_step.csv",
]
UNION_FILES = [
    "cumulative_union_comprehensive.csv",
    "cumulative_union_explicit_explicit.csv",
    "cumulative_union_explicit_promotion.csv",
    "cumulative_union_sparse_promotion.csv",
    "cumulative_union_sparse_sparse.csv",
]

LOG2M, REGWIDTH = 11, 5
EXPLICIT_THRESHOLD, SPARSE_THRESHOLD = 256, 850


def _rows(filename):
    with open(os.path.join(DATA, filename)) as f:
        return list(csv.DictReader(f))


@pytest.mark.parametrize("filename", ADD_FILES)
def test_cumulative_add(filename):
    rows = _rows(filename)
    sk = HLLSketch.from_hex(rows[0]["multiset"])
    for i, row in enumerate(rows[1:], start=2):
        sk.add_raw(int(row["raw_value"]))
        assert sk.cardinality_float() == pytest.approx(float(row["cardinality"])), \
            f"{filename}:{i}"
        assert sk.to_hex() == row["multiset"], f"{filename}:{i}"
        sk = HLLSketch.from_hex(row["multiset"])


@pytest.mark.parametrize("filename", ADD_FILES)
def test_cumulative_add_as_one_batch(filename):
    """The same element sequence pushed through one vectorized batch call
    must land on the same final bytes as the per-element replay."""
    rows = _rows(filename)
    sk = HLLSketch.from_hex(rows[0]["multiset"])
    values = np.array([int(r["raw_value"]) for r in rows[1:]], dtype=np.int64)
    sk.add_hashed(values)
    assert sk.to_hex() == rows[-1]["multiset"]
    assert sk.cardinality_float() == pytest.approx(float(rows[-1]["cardinality"]))


@pytest.mark.parametrize("filename", UNION_FILES)
def test_cumulative_union(filename):
    rows = _rows(filename)
    sk = HLLSketch.from_hex(rows[0]["union_multiset"])
    for i, row in enumerate(rows[1:], start=2):
        other = HLLSketch.from_hex(row["multiset"])
        assert other.cardinality_float() == pytest.approx(float(row["cardinality"])), \
            f"{filename}:{i}:multiset"
        sk.union(other)
        assert sk.cardinality_float() == pytest.approx(float(row["union_cardinality"])), \
            f"{filename}:{i}"
        assert sk.to_hex() == row["union_multiset"], f"{filename}:{i}"
        sk = HLLSketch.from_hex(row["union_multiset"])


def _construct_hll_value(log2m, register_index, register_value):
    """Build a raw long that sets exactly one register (reference
    tests/probabilistic_test_util.py:8-23)."""
    return ((1 << (register_value - 1)) << log2m) | register_index


def _new_test_sketch(type):
    cfg = HLLConfig.for_testing(LOG2M, REGWIDTH, EXPLICIT_THRESHOLD, SPARSE_THRESHOLD)
    return HLLSketch(cfg, type)


def test_cumulative_union_sparse_full_representation():
    rows = _rows(os.path.join(DATA, "cumulative_union_sparse_full_representation.csv"))

    def check(hll, union_hll, row, line):
        assert hll.cardinality_float() == pytest.approx(float(row["cardinality"])), line
        assert hll.to_hex() == row["HLL"], line
        assert union_hll.cardinality_float() == pytest.approx(float(row["union_cardinality"])), line
        assert union_hll.to_hex() == row["union_HLL"], line

    empty1, empty2 = _new_test_sketch(HLLType.EMPTY), _new_test_sketch(HLLType.EMPTY)
    check(empty1, empty2, rows[0], 1)

    full = _new_test_sketch(HLLType.FULL)
    full.add_raw(_construct_hll_value(LOG2M, 0, 1))
    sparse = _new_test_sketch(HLLType.SPARSE)
    sparse.add_raw(_construct_hll_value(LOG2M, 0, 1))
    check(full, sparse, rows[1], 2)

    full2 = _new_test_sketch(HLLType.FULL)
    full2.add_raw(_construct_hll_value(LOG2M, 1, 1))
    sparse.add_raw(_construct_hll_value(LOG2M, 1, 1))
    check(full2, sparse, rows[2], 3)

    full3 = _new_test_sketch(HLLType.FULL)
    vals = np.array([_construct_hll_value(LOG2M, i, 1)
                     for i in range(2, SPARSE_THRESHOLD + 1)], dtype=np.int64)
    full3.add_hashed(vals)
    sparse.add_hashed(vals)
    check(full3, sparse, rows[3], 4)
