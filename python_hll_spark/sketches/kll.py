"""KLL quantile sketch (Karnin-Lang-Liberty, FOCS'16) — numpy kernel.

New capability per BASELINE.json north_rule.  This is the deterministic-
offset variant: each compactor alternates its even/odd offset instead of
drawing a random bit, making distributed runs byte-reproducible while
preserving the O(1/eps * sqrt(log(1/delta))) space/error trade-off in
practice (rank error is validated empirically in tests against exact
quantiles rather than assumed).

Merge concatenates per-level compactors then re-compacts top-down; it is
associative in the multiset sense (any merge tree yields a sketch whose
rank estimates stay within the bound), which is what the salted tree-merge
pipeline requires.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


@dataclass(frozen=True)
class KLLConfig:
    k: int = 200

    def capacity(self, level: int, num_levels: int) -> int:
        """Capacity of ``level`` when ``num_levels`` exist (top gets k)."""
        depth = num_levels - level - 1
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    @property
    def rank_error(self) -> float:
        # empirical constant for the k-parameterized family (cf. the
        # published analysis; validated by tests/test_sketches.py)
        return 2.0 / self.k


class KLLSketch:
    __slots__ = ("cfg", "levels", "offsets", "n", "min_v", "max_v")

    def __init__(self, cfg: KLLConfig):
        self.cfg = cfg
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.offsets: list[int] = [0]
        self.n = 0
        self.min_v = np.inf
        self.max_v = -np.inf

    # -- maintenance ---------------------------------------------------------
    def _total_capacity(self) -> int:
        L = len(self.levels)
        return sum(self.cfg.capacity(h, L) for h in range(L))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            L = len(self.levels)
            for h in range(L):
                if len(self.levels[h]) > self.cfg.capacity(h, L):
                    buf = np.sort(self.levels[h])
                    off = self.offsets[h] & 1
                    self.offsets[h] += 1
                    promoted = buf[off::2]
                    self.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                        self.offsets.append(0)
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break

    # -- ingest ----------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.n += len(values)
        self.min_v = min(self.min_v, float(values.min()))
        self.max_v = max(self.max_v, float(values.max()))
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        if other.cfg != self.cfg:
            raise ValueError("KLL merge with mismatched config")
        if other.n == 0:
            return
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.offsets.append(0)
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self.min_v = min(self.min_v, other.min_v)
        self.max_v = max(self.max_v, other.max_v)
        self._compress()

    # -- read --------------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << h, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0, 1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if len(v) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs, 0.0, 1.0) * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(v) - 1)
        out = v[idx]
        out[qs <= 0.0] = self.min_v
        out[qs >= 1.0] = self.max_v
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Approximate normalized rank of ``value``."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        below = w[v <= value].sum()
        return float(below) / float(w.sum())

    # -- serialize ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack("<iqi dd", self.cfg.k, self.n, len(self.levels),
                                    self.min_v, self.max_v)
        parts = [head]
        for buf, off in zip(self.levels, self.offsets):
            parts.append(struct.pack("<iq", len(buf), off))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        assert data[:4] == _MAGIC, "not a KLL1 blob"
        k, n, n_levels, min_v, max_v = struct.unpack("<iqi dd", data[4:36])
        sk = cls(KLLConfig(k))
        sk.n, sk.min_v, sk.max_v = n, min_v, max_v
        sk.levels, sk.offsets = [], []
        pos = 36
        for _ in range(n_levels):
            ln, off = struct.unpack("<iq", data[pos:pos + 12])
            pos += 12
            sk.levels.append(np.frombuffer(data[pos:pos + 8 * ln], dtype=np.float64).copy())
            sk.offsets.append(off)
            pos += 8 * ln
        if not sk.levels:
            sk.levels, sk.offsets = [np.empty(0, dtype=np.float64)], [0]
        return sk
