"""The compat facade must replay the reference's own integration flow
(signed-byte lists in/out) unchanged."""

import csv

import pytest

from python_hll_spark.compat import HLL, HLLType


def _signed_from_hex(s):
    s = s[2:]
    return [b - 256 if b > 127 else b
            for b in bytes.fromhex(s)]


def _hex_from_signed(lst):
    return "\\x" + bytes((b & 0xFF) for b in lst).hex().upper()


def test_reference_usage_pattern():
    hll = HLL(13, 5)
    for v in (7436236700, -126946270, 98237923872, 7436236700):
        hll.add_raw(v)
    assert hll.cardinality() == 3
    assert hll.get_type() == HLLType.EXPLICIT
    data = hll.to_bytes()
    assert all(-128 <= b <= 127 for b in data)
    back = HLL.from_bytes(data)
    assert back.cardinality() == 3
    assert back.to_bytes() == data


def test_compat_replays_golden_vectors():
    with open("/root/reference/tests/data/cumulative_add_sparse_edge.csv") as f:
        rows = list(csv.DictReader(f))
    hll = HLL.from_bytes(_signed_from_hex(rows[0]["multiset"]))
    for row in rows[1:50]:
        hll.add_raw(int(row["raw_value"]))
        assert _hex_from_signed(hll.to_bytes()) == row["multiset"]
        hll = HLL.from_bytes(_signed_from_hex(row["multiset"]))


def test_union_matches_reference_flow():
    import numpy as np
    from python_hll_spark.functions.hashing import splitmix64

    a = HLL.create_for_testing(11, 5, 256, 850, HLLType.EMPTY)
    b = HLL.create_for_testing(11, 5, 256, 850, HLLType.EMPTY)
    # values must be pre-hashed, as the reference requires of its callers
    a.add_hashed(splitmix64(np.arange(1, 300, dtype=np.int64)))
    b.add_hashed(splitmix64(np.arange(200, 600, dtype=np.int64)))
    a.union(b)
    assert a.cardinality() == pytest.approx(599, rel=0.05)
