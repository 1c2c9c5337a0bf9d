"""Unit-level parity tests modeled on the reference suite's constructed-input
tests (test_full_hll.py / test_sparse_hll.py / test_explicit_hll.py /
test_big_endian_ascending_word_serializer.py) — reimplemented against our
kernel's API."""

import math

import numpy as np
import pytest

from python_hll_spark.sketches.hll import (
    HLLConfig, HLLSketch, HLLType, _TWO_TO_L, alpha_m_squared,
)

LOG2M, REGWIDTH = 11, 5


def construct_value(log2m, register_index, register_value):
    """Raw long that sets exactly register ``register_index`` to
    ``register_value`` (reference tests/probabilistic_test_util.py:8-23)."""
    return ((1 << (register_value - 1)) << log2m) | register_index


def _full(log2m=LOG2M, regwidth=REGWIDTH):
    return HLLSketch(HLLConfig.for_testing(log2m, regwidth, 256, 850), HLLType.FULL)


def _sparse(log2m=LOG2M, regwidth=REGWIDTH):
    return HLLSketch(HLLConfig.for_testing(log2m, regwidth, 256, 850), HLLType.SPARSE)


# ------------------------------------------------------------ add semantics
def test_add_sets_expected_register():
    for idx, val in [(0, 1), (1, 5), (2047, 31), (500, 17)]:
        sk = _full()
        sk.add_raw(construct_value(LOG2M, idx, val))
        assert sk.regs[idx] == val
        assert sk.regs.sum() == val  # nothing else touched


def test_add_is_register_max():
    sk = _full()
    sk.add_raw(construct_value(LOG2M, 7, 3))
    sk.add_raw(construct_value(LOG2M, 7, 9))
    assert sk.regs[7] == 9
    sk.add_raw(construct_value(LOG2M, 7, 4))  # lower value ignored
    assert sk.regs[7] == 9


def test_add_idempotent():
    sk = _full()
    v = construct_value(LOG2M, 13, 8)
    sk.add_raw(v)
    before = sk.to_bytes()
    sk.add_raw(v)
    assert sk.to_bytes() == before


def test_rho_overflow_clamped_by_pw_mask():
    """A value whose substream has >=31 trailing zeros must clamp at the
    regwidth-5 max register value 31 (pw_max_mask construction)."""
    sk = _full()
    sk.add_raw(1 << (LOG2M + 40))  # 40 trailing zeros in substream
    j = 0
    assert sk.regs[j] == 31


def test_zero_substream_ignored_in_full():
    sk = _full()
    sk.add_raw(5)  # substream = 5 >> 11 == 0
    assert sk.regs.sum() == 0


# ------------------------------------------------------------ estimator
def test_small_range_correction():
    """One register set: estimator < 5m/2 with zeros -> m*ln(m/V)."""
    sk = _full()
    sk.add_raw(construct_value(LOG2M, 0, 1))
    m = 1 << LOG2M
    expected = m * math.log(m / (m - 1))
    assert sk.cardinality_float() == pytest.approx(expected)


def test_uncorrected_range():
    """All registers at a mid value -> raw alpha_m2/sum estimator."""
    sk = _full()
    sk.regs[:] = 7
    m = 1 << LOG2M
    est = alpha_m_squared(m) / (m * 2.0 ** -7)
    two_to_l = _TWO_TO_L[(REGWIDTH, LOG2M)]
    assert est <= two_to_l / 30.0  # in uncorrected range
    assert sk.cardinality_float() == pytest.approx(est)


def test_large_range_correction():
    """Registers at 30 -> estimator beyond 2^L/30 -> -2^L ln(1-E/2^L)."""
    sk = _full()
    sk.regs[:] = 30
    m = 1 << LOG2M
    est = alpha_m_squared(m) / (m * 2.0 ** -30)
    two_to_l = _TWO_TO_L[(REGWIDTH, LOG2M)]
    assert two_to_l / 30.0 < est <= two_to_l
    expected = -1 * two_to_l * math.log(1.0 - est / two_to_l)
    assert sk.cardinality_float() == pytest.approx(expected)


def test_large_range_saturation_guard():
    """All registers at max pushes E beyond 2^L: the reference's
    ValueError->0 guard (hllutil.py:155-158) must be preserved."""
    sk = _full()
    sk.regs[:] = 31
    m = 1 << LOG2M
    est = alpha_m_squared(m) / (m * 2.0 ** -31)
    assert est > _TWO_TO_L[(REGWIDTH, LOG2M)]
    assert sk.cardinality_float() == 0


def test_sparse_estimator_equals_full_for_same_registers():
    sp, fu = _sparse(), _full()
    for i in range(100):
        v = construct_value(LOG2M, i * 3, (i % 31) + 1)
        sp.add_raw(v)
        fu.add_raw(v)
    assert sp.type == HLLType.SPARSE
    assert sp.cardinality_float() == pytest.approx(fu.cardinality_float())


# ------------------------------------------------------------ explicit
def test_explicit_exact_cardinality_and_dedup():
    cfg = HLLConfig.for_testing(LOG2M, REGWIDTH, 128, 850)
    sk = HLLSketch(cfg)
    vals = np.array([1, -1, 2, 2, 1, 7], dtype=np.int64)
    sk.add_hashed(vals)
    assert sk.type == HLLType.EXPLICIT
    assert sk.cardinality() == 4
    # serialization: sorted signed order, 64-bit words
    data = sk.to_bytes()
    assert len(data) == 3 + 4 * 8
    back = HLLSketch.from_bytes(data)
    assert back.cardinality() == 4


def test_explicit_promotes_at_threshold():
    cfg = HLLConfig.for_testing(LOG2M, REGWIDTH, 4, 850)
    sk = HLLSketch(cfg)
    sk.add_hashed(np.arange(1, 5, dtype=np.int64) << 11)
    assert sk.type == HLLType.EXPLICIT
    sk.add_raw(5 << 11)
    assert sk.type == HLLType.SPARSE


def test_clear_preserves_type():
    sk = _full()
    sk.add_raw(construct_value(LOG2M, 3, 3))
    sk.clear()
    assert sk.type == HLLType.FULL
    assert sk.regs.sum() == 0


# ------------------------------------------------------------ serializer bits
def test_word_packing_golden_bytes():
    """Reference serializer golden case: words [9,31,1] @ width 5 ->
    bytes [79,-62] (0x4F,0xC2)."""
    packed = HLLSketch._pack_words(np.array([9, 31, 1], dtype=np.uint64), 5)
    assert list(packed) == [0x4F, 0xC2]


def test_word_packing_doc_example():
    """serialization docstring example: [31,1,5] @ width 5 -> [0xF8,0x4A]."""
    packed = HLLSketch._pack_words(np.array([31, 1, 5], dtype=np.uint64), 5)
    assert list(packed) == [0xF8, 0x4A]


def test_word_unpack_roundtrip_widths():
    rng = np.random.default_rng(0)
    for width in (1, 5, 7, 8, 13, 16, 31, 64):
        max_v = (1 << width) - 1
        words = rng.integers(0, min(max_v, 2**63 - 1), size=17,
                             endpoint=True, dtype=np.uint64)
        words &= np.uint64(max_v)
        packed = HLLSketch._pack_words(words, width)
        back = HLLSketch._unpack_words(packed, width)[:17]
        assert np.array_equal(back, words), width


def test_header_encoding_full():
    cfg = HLLConfig.for_testing(LOG2M, REGWIDTH, 256, 850)
    sk = HLLSketch(cfg, HLLType.SPARSE)
    data = sk.to_bytes()
    assert data[0] == 0x13  # version 1, SPARSE ordinal 3
    assert data[1] == 0x8B  # (regwidth-1)=4 <<5 | log2m=11
    assert data[2] == 0x49  # sparse bit (0x40) | cutoff log2(256)+1 = 9
    # and a threshold-128 config (what from_bytes of the golden CSVs yields)
    cfg128 = HLLConfig.create(LOG2M, REGWIDTH, expthresh=8)
    assert HLLSketch(cfg128, HLLType.SPARSE).to_bytes()[2] == 0x48
