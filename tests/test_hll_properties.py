"""Property tests for the HLL kernel: merge associativity/commutativity under
arbitrary partition orderings and tree shapes (BASELINE.md merge-associativity
target), plus a serialize/deserialize parameter sweep modeled on the
reference's test_hll_serialization.py:16-61 (vectorized here, so it runs in
seconds instead of the reference's ~1.5h)."""

import numpy as np
import pytest

from python_hll_spark.sketches.hll import HLLConfig, HLLSketch, HLLType

RNG = np.random.default_rng(42)


def _random_values(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2 ** 63), 2 ** 63 - 1, size=n, dtype=np.int64)


@pytest.mark.parametrize("n", [0, 1, 10, 200, 300, 2000, 20000])
@pytest.mark.parametrize("parts", [1, 3, 8])
def test_merge_matches_sequential(n, parts):
    """Partition the stream arbitrarily, build partials, merge in random
    order: bytes must equal the sequential single-sketch build."""
    cfg = HLLConfig.for_testing(11, 5, 256, 850)
    values = _random_values(n, seed=n * 31 + parts)

    seq = HLLSketch(cfg)
    seq.add_hashed(values)

    rng = np.random.default_rng(7 * n + parts)
    perm = rng.permutation(n)
    chunks = np.array_split(values[perm], parts)
    partials = []
    for c in chunks:
        p = HLLSketch(cfg)
        p.add_hashed(c)
        partials.append(p)
    rng.shuffle(partials)
    acc = HLLSketch(cfg)
    for p in partials:
        acc.union(p)

    assert acc.to_bytes() == seq.to_bytes()
    assert acc.cardinality() == seq.cardinality()


def test_merge_tree_shapes():
    """Left-fold vs balanced-tree merge must agree byte-for-byte."""
    cfg = HLLConfig.create(11, 5)
    values = _random_values(50000, seed=99)
    chunks = np.array_split(values, 16)
    partials = []
    for c in chunks:
        p = HLLSketch(cfg)
        p.add_hashed(c)
        partials.append(p)

    fold = HLLSketch(cfg)
    for p in partials:
        fold.union(p)

    layer = [p.copy() for p in partials]
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer), 2):
            if i + 1 < len(layer):
                layer[i].union(layer[i + 1])
            nxt.append(layer[i])
        layer = nxt

    assert fold.to_bytes() == layer[0].to_bytes()


@pytest.mark.parametrize("log2m", [4, 5, 8, 11, 13, 16])
@pytest.mark.parametrize("regwidth", [1, 2, 5, 8])
def test_serialization_round_trip_sweep(log2m, regwidth):
    for expthresh in (-1, 0, 1, 7, 18):
        for sparseon in (True, False):
            cfg = HLLConfig.create(log2m, regwidth, expthresh, sparseon)
            for n in (0, 1, 5, 300, 4000):
                sk = HLLSketch(cfg)
                sk.add_hashed(_random_values(n, seed=log2m * 1000 + n))
                data = sk.to_bytes()
                back = HLLSketch.from_bytes(data)
                assert back.type == sk.type
                assert back.to_bytes() == data
                assert back.cardinality() == sk.cardinality()


def test_heterogeneous_union_matrix():
    """Every (dest_type, src_type) pairing via content-staged sketches."""
    cfg = HLLConfig.for_testing(11, 5, 8, 32)

    def staged(n, seed):
        sk = HLLSketch(cfg)
        sk.add_hashed(_random_values(n, seed))
        return sk

    stages = {
        HLLType.EMPTY: staged(0, 1),
        HLLType.EXPLICIT: staged(4, 2),
        HLLType.SPARSE: staged(20, 3),
        HLLType.FULL: staged(4000, 4),
    }
    for t, sk in stages.items():
        assert sk.type == t, (t, sk.type)

    for ta, a0 in stages.items():
        for tb, b0 in stages.items():
            a, b = a0.copy(), b0.copy()
            a.union(b)
            # cardinality sanity: union >= max single estimate within slack
            est = a.cardinality()
            assert est >= 0
            # byte round trip of the merged result
            assert HLLSketch.from_bytes(a.to_bytes()).to_bytes() == a.to_bytes()


def test_union_commutative_content():
    """a U b and b U a must agree on register content / cardinality
    (final *type* may differ across heterogeneous pairings, as in the
    reference's asymmetric clone-then-readd matrix)."""
    cfg = HLLConfig.create(11, 5)
    a0, b0 = HLLSketch(cfg), HLLSketch(cfg)
    a0.add_hashed(_random_values(3000, 11))
    b0.add_hashed(_random_values(5000, 12))
    ab, ba = a0.copy(), b0.copy()
    ab.union(b0)
    ba.union(a0)
    assert ab.cardinality_float() == pytest.approx(ba.cardinality_float())
    assert ab.to_bytes() == ba.to_bytes()


def test_explicit_promotion_by_final_element_stays_sparse():
    """The reference's explicit->sparse promotion replay is not re-checked
    against sparse_threshold until the next add (hll.py:247-261); our batch
    path must reproduce that when the batch's last element triggers it."""
    cfg = HLLConfig.for_testing(11, 5, 4, 2)
    # 5 distinct values hitting 5 distinct registers (index = low log2m bits),
    # >4 => promotion at the 5th (last) element
    vals = np.array([(1 << 30) | i for i in range(5)], dtype=np.int64)
    sk = HLLSketch(cfg)
    sk.add_hashed(vals)
    assert sk.type == HLLType.SPARSE  # nnz=5 > 2, but unchecked
    sk.add_raw(int(vals[0]))  # next add re-checks
    assert sk.type == HLLType.FULL

    # same multiset, trigger NOT last => checked => FULL immediately
    sk2 = HLLSketch(cfg)
    sk2.add_hashed(np.concatenate([vals, vals[:1]]))
    assert sk2.type == HLLType.FULL


def test_zero_substream_promotes_empty():
    """Adding a value whose substream is zero still promotes EMPTY (the
    register is untouched but the type changes), per hll.py:234-245."""
    cfg = HLLConfig.create(11, 5, expthresh=0)  # skip EXPLICIT
    sk = HLLSketch(cfg)
    sk.add_raw(5)  # 5 >> 11 == 0 -> rho 0
    assert sk.type == HLLType.SPARSE
    assert sk.cardinality_float() == 0.0
    assert int(np.count_nonzero(sk.regs)) == 0


def test_error_bound_at_scale():
    """HLL relative error within 1.04/sqrt(m) (x3 slack for a single trial)."""
    for log2m in (11, 14):
        cfg = HLLConfig.create(log2m, 5)
        n = 1_000_000
        vals = _random_values(n, seed=log2m)
        sk = HLLSketch(cfg)
        sk.add_hashed(vals)
        exact = len(np.unique(vals))
        rel_err = abs(sk.cardinality() - exact) / exact
        assert rel_err < 3 * cfg.error_bound, (log2m, rel_err, cfg.error_bound)
