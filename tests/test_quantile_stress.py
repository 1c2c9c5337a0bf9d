"""Deep-merge stress for the quantile sketches: 10^4 partials merged under
different tree shapes x 3 value distributions, rank error checked against
the advertised tolerances (KLL: 3 x 2/k; t-digest: 0.02 — the same numbers
the bound-check queries assert).

This is the cluster fan-in shape: 10^4 partials is a 10^4-task stage
feeding the salted two-level merge, and a deterministic-offset KLL variant
could in principle accumulate bias under deep or skewed merge trees — so
bias is measured, not assumed.
"""

import numpy as np
import pytest

from python_hll_spark.sketches.kll import KLLConfig, KLLSketch
from python_hll_spark.sketches.tdigest import TDigestConfig, TDigestSketch

N_PARTIALS = 10_000
VALS_PER_PARTIAL = 100
QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def _distributions(rng):
    n = N_PARTIALS * VALS_PER_PARTIAL
    return {
        "uniform": rng.uniform(0, 1, n),
        "lognormal": rng.lognormal(0.0, 2.0, n),
        "zipf_discrete": rng.zipf(1.5, n).astype(np.float64).clip(max=1e6),
    }


def _rank_errors(data: np.ndarray, estimates: np.ndarray,
                 qs: np.ndarray) -> np.ndarray:
    """Rank error under interval semantics: a heavily-tied value occupies a
    rank INTERVAL [rank_left, rank_right]; the estimate is exact whenever
    the target quantile falls inside it (matters for discrete/zipf data
    where one value can span 30%+ of the mass)."""
    s = np.sort(data)
    lo = np.searchsorted(s, estimates, side="left") / len(s)
    hi = np.searchsorted(s, estimates, side="right") / len(s)
    below = np.maximum(lo - qs, 0)
    above = np.maximum(qs - hi, 0)
    return np.maximum(below, above)


def _merge_chain(parts, make):
    acc = make()
    for p in parts:
        acc.merge(p)
    return acc


def _merge_balanced(parts, make):
    layer = list(parts)
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer) - 1, 2):
            layer[i].merge(layer[i + 1])
            nxt.append(layer[i])
        if len(layer) % 2:
            nxt.append(layer[-1])
        layer = nxt
    return layer[0]


def _merge_shuffled_chain(parts, make, seed):
    order = np.random.default_rng(seed).permutation(len(parts))
    return _merge_chain([parts[i] for i in order], make)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "zipf_discrete"])
def test_kll_deep_merge_rank_error(dist):
    cfg = KLLConfig(k=200)
    tol = 3 * cfg.rank_error + 1e-9
    rng = np.random.default_rng(17)
    data = _distributions(rng)[dist]
    chunks = data.reshape(N_PARTIALS, VALS_PER_PARTIAL)

    parts = []
    for i in range(N_PARTIALS):
        sk = KLLSketch(cfg)
        sk.update(chunks[i])
        parts.append(sk)

    def fresh_parts():
        out = []
        for i in range(N_PARTIALS):
            sk = KLLSketch(cfg)
            sk.update(chunks[i])
            out.append(sk)
        return out

    trees = {
        "chain": _merge_chain(parts, lambda: KLLSketch(cfg)),
        "balanced": _merge_balanced(fresh_parts(), lambda: KLLSketch(cfg)),
        "shuffled": _merge_shuffled_chain(fresh_parts(),
                                          lambda: KLLSketch(cfg), seed=3),
    }
    for shape, sk in trees.items():
        assert sk.n == len(data)
        est = np.array([sk.quantile(q) for q in QS])
        err = _rank_errors(data, est, QS)
        assert err.max() <= tol, (dist, shape, err.max())


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "zipf_discrete"])
def test_tdigest_deep_merge_rank_error(dist):
    cfg = TDigestConfig()
    rng = np.random.default_rng(29)
    data = _distributions(rng)[dist]
    chunks = data.reshape(N_PARTIALS, VALS_PER_PARTIAL)

    parts = []
    for i in range(N_PARTIALS):
        sk = TDigestSketch(cfg)
        sk.update(chunks[i])
        parts.append(sk)
    merged = _merge_balanced(parts, lambda: TDigestSketch(cfg))
    est = np.array([merged.quantile(q) for q in QS])
    err = _rank_errors(data, est, QS)
    # 0.02 is what q_tdigest_price_quantiles asserts in production
    assert err.max() <= 0.02, (dist, err.max())
