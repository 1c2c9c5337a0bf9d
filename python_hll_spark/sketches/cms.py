"""Count-min sketch: vectorized numpy kernel with sum-merge.

New capability mandated by BASELINE.json north_rule (the reference library
has no CMS — hll.py is its only sketch).  Standard Cormode-Muthukrishnan
bounds: point estimates overcount by at most eps*N with probability >=
1-delta, where eps = e/width and delta = e^-depth.  Row hashing uses the
Kirsch-Mitzenmacher double-hashing scheme over splitmix64, so updates for
all depth rows derive from two vector hashes.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from python_hll_spark.functions.hashing import splitmix64

_MAGIC = b"CMS1"
_MAGIC_SPARSE = b"CMS2"
_MAGIC_DENSE = b"CMS3"


@dataclass(frozen=True)
class CMSConfig:
    depth: int = 5
    width: int = 16384
    seed: int = 0

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    @property
    def width_is_pow2(self) -> bool:
        return self.width & (self.width - 1) == 0

    @staticmethod
    def from_error(eps: float, delta: float, seed: int = 0) -> "CMSConfig":
        width = int(math.ceil(math.e / eps))
        width = 1 << max(1, (width - 1).bit_length())  # round up to pow2
        return CMSConfig(depth=int(math.ceil(math.log(1.0 / delta))),
                         width=width, seed=seed)


class CMSSketch:
    """counts[d, w] of int64; merge = elementwise sum (commutative monoid)."""

    __slots__ = ("cfg", "counts", "total")

    def __init__(self, cfg: CMSConfig):
        self.cfg = cfg
        self.counts = np.zeros((cfg.depth, cfg.width), dtype=np.int64)
        self.total = 0

    def _iter_row_indices(self, hashed: np.ndarray):
        """Yield per-row column indices via double hashing, one row at a
        time with in-place arithmetic (pow2 width -> mask, no division)."""
        h1 = splitmix64(hashed, seed=self.cfg.seed).view(np.uint64)
        h2 = splitmix64(hashed, seed=self.cfg.seed + 1).view(np.uint64) | np.uint64(1)
        cur = h1  # splitmix64 returns a fresh array; safe to mutate in place
        buf = np.empty_like(cur)
        pow2 = self.cfg.width_is_pow2
        mask = np.uint64(self.cfg.width - 1)
        width = np.uint64(self.cfg.width)
        for d in range(self.cfg.depth):
            if d:
                cur += h2
            if pow2:
                np.bitwise_and(cur, mask, out=buf)
            else:
                np.remainder(cur, width, out=buf)
            # masked values < 2^63 so the int64 view is free; the SAME
            # buffer is yielded every iteration — consumers gather/scatter
            # immediately and never retain it across iterations
            yield d, buf.view(np.int64)

    def update(self, hashed: np.ndarray, weights: np.ndarray | None = None) -> None:
        if len(hashed) == 0:
            return
        hashed = np.asarray(hashed, dtype=np.int64)
        small = len(hashed) * 4 < self.cfg.width
        if weights is None:
            self.total += len(hashed)
            for d, idx in self._iter_row_indices(hashed):
                if small:
                    # chunked batches: indexed scatter-add beats allocating
                    # a width-sized bincount buffer per row
                    np.add.at(self.counts[d], idx, 1)
                else:
                    self.counts[d] += np.bincount(idx, minlength=self.cfg.width)
        else:
            w = np.asarray(weights, dtype=np.int64)
            self.total += int(w.sum())
            for d, idx in self._iter_row_indices(hashed):
                self.counts[d] += np.bincount(idx, weights=w,
                                              minlength=self.cfg.width).astype(np.int64)

    def estimate(self, hashed: np.ndarray) -> np.ndarray:
        """Point-frequency estimates (vectorized over queries)."""
        if len(hashed) == 0:
            return np.empty(0, dtype=np.int64)
        hashed = np.asarray(hashed, dtype=np.int64)
        out = None
        for d, idx in self._iter_row_indices(hashed):
            row = self.counts[d][idx]
            out = row if out is None else np.minimum(out, row)
        return out

    def merge(self, other: "CMSSketch") -> None:
        if other.cfg != self.cfg:
            raise ValueError("CMS merge with mismatched config")
        self.counts += other.counts
        self.total += other.total

    def to_bytes(self) -> bytes:
        """Self-describing blob; representation chosen by size.

        A depth x width int64 grid is 2.6 MB at the default top-k shape,
        yet per-task PARTIALS of a distributed build are mostly zeros and
        every count is bounded by the (tiny) slice a task saw — so sparse
        (flat positions + narrow counts, ``CMS2``) or dense-narrow
        (``CMS3``) encodings win by 10-100x and the partial-merge shuffles
        stop moving megabytes per row.  The choice is a deterministic
        function of the counts, so distributed and sequential builds of
        the same multiset still byte-match.  Negative counts (never
        produced by update/merge) fall back to the legacy int64 grid."""
        head = struct.pack("<iiqq", self.cfg.depth, self.cfg.width,
                           self.cfg.seed, self.total)
        maxc = int(self.counts.max(initial=0))
        minc = int(self.counts.min(initial=0))
        if minc < 0:
            return _MAGIC + head + self.counts.tobytes()
        cnt_dtype = next(d for d in (np.uint8, np.uint16, np.uint32, np.uint64)
                         if maxc <= np.iinfo(d).max)
        cnt_size = np.dtype(cnt_dtype).itemsize
        cells = self.cfg.depth * self.cfg.width
        pos_dtype = np.uint32 if cells <= (1 << 32) else np.uint64
        pos_size = np.dtype(pos_dtype).itemsize
        flat = self.counts.ravel()
        positions = np.flatnonzero(flat)
        sparse_size = len(positions) * (pos_size + cnt_size)
        if sparse_size < cells * cnt_size:
            return (_MAGIC_SPARSE + head + bytes([cnt_size])
                    + positions.astype(pos_dtype).tobytes()
                    + flat[positions].astype(cnt_dtype).tobytes())
        return (_MAGIC_DENSE + head + bytes([cnt_size])
                + flat.astype(cnt_dtype).tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CMSSketch":
        magic = bytes(data[:4])
        assert magic in (_MAGIC, _MAGIC_SPARSE, _MAGIC_DENSE), "not a CMS blob"
        depth, width, seed, total = struct.unpack("<iiqq", data[4:28])
        sk = cls(CMSConfig(depth, width, seed))
        if magic == _MAGIC:
            sk.counts = np.frombuffer(data[28:], dtype=np.int64) \
                .reshape(depth, width).copy()
        else:
            cnt_size = data[28]
            cnt_dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32,
                         8: np.uint64}[cnt_size]
            body = data[29:]
            if magic == _MAGIC_DENSE:
                sk.counts = np.frombuffer(body, dtype=cnt_dtype) \
                    .astype(np.int64).reshape(depth, width)
            else:
                cells = depth * width
                pos_dtype = np.uint32 if cells <= (1 << 32) else np.uint64
                pos_size = np.dtype(pos_dtype).itemsize
                nnz = len(body) // (pos_size + cnt_size)
                positions = np.frombuffer(body[:nnz * pos_size], dtype=pos_dtype)
                vals = np.frombuffer(body[nnz * pos_size:], dtype=cnt_dtype)
                flat = sk.counts.ravel()
                flat[positions] = vals
        sk.total = total
        return sk
