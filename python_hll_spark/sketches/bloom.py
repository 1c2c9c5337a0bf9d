"""Bloom filter: packed-bitarray numpy kernel with OR-merge.

New capability per BASELINE.json north_rule (token-membership queries).
k hash functions via Kirsch-Mitzenmacher double hashing over splitmix64;
m is kept a power of two so the modulo is a mask.  False-positive rate
follows the published (1 - e^(-kn/m))^k; no false negatives by construction.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from python_hll_spark.functions.hashing import splitmix64

_MAGIC = b"BLM1"
_MAGIC_SPARSE = b"BLM2"


@dataclass(frozen=True)
class BloomConfig:
    log2_bits: int = 23  # 8 Mbit = 1 MiB packed
    num_hashes: int = 7
    seed: int = 0

    @property
    def n_bits(self) -> int:
        return 1 << self.log2_bits

    @staticmethod
    def from_capacity(n_items: int, fp_rate: float = 0.01, seed: int = 0) -> "BloomConfig":
        m = max(64, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        log2_bits = max(6, math.ceil(math.log2(m)))
        k = max(1, round((1 << log2_bits) / n_items * math.log(2))) if n_items else 7
        return BloomConfig(log2_bits=log2_bits, num_hashes=min(int(k), 16), seed=seed)

    def expected_fp_rate(self, n_items: int) -> float:
        return (1.0 - math.exp(-self.num_hashes * n_items / self.n_bits)) ** self.num_hashes


class BloomSketch:
    """Bit array kept UNPACKED (one byte per bit) in memory: plain fancy
    assignment is several times faster than read-modify-write bit ops in
    the build hot loop.  Packing happens only at the serialization boundary
    (same memory-vs-throughput trade the HLL kernel makes), so shuffled
    partial states stay n_bits/8 wide."""

    __slots__ = ("cfg", "unpacked", "n_added")

    def __init__(self, cfg: BloomConfig):
        self.cfg = cfg
        self.unpacked = np.zeros(cfg.n_bits, dtype=np.uint8)
        self.n_added = 0

    def _iter_positions(self, hashed: np.ndarray):
        """Yields the SAME index buffer each iteration (masked values are
        < 2^63 so the int64 view is free) — consumers must gather/scatter
        immediately, never retain a yielded array across iterations."""
        h1 = splitmix64(hashed, seed=self.cfg.seed).view(np.uint64)
        h2 = splitmix64(hashed, seed=self.cfg.seed + 1).view(np.uint64) | np.uint64(1)
        mask = np.uint64(self.cfg.n_bits - 1)
        cur = h1  # splitmix64 returns a fresh array; safe to mutate in place
        buf = np.empty_like(cur)
        for k in range(self.cfg.num_hashes):
            if k:
                cur += h2
            np.bitwise_and(cur, mask, out=buf)
            yield buf.view(np.int64)

    def update(self, hashed: np.ndarray) -> None:
        if len(hashed) == 0:
            return
        hashed = np.asarray(hashed, dtype=np.int64)
        for pos in self._iter_positions(hashed):
            self.unpacked[pos] = 1
        self.n_added += len(hashed)

    def might_contain(self, hashed: np.ndarray) -> np.ndarray:
        if len(hashed) == 0:
            return np.empty(0, dtype=bool)
        hashed = np.asarray(hashed, dtype=np.int64)
        hit = None
        for pos in self._iter_positions(hashed):
            row = self.unpacked[pos]
            hit = row if hit is None else (hit & row)
        return hit.astype(bool)

    def merge(self, other: "BloomSketch") -> None:
        if other.cfg != self.cfg:
            raise ValueError("Bloom merge with mismatched config")
        np.bitwise_or(self.unpacked, other.unpacked, out=self.unpacked)
        self.n_added += other.n_added

    @property
    def bits(self) -> np.ndarray:
        """Packed little-bit-order view (bit k of byte j = position j*8+k)."""
        return np.packbits(self.unpacked, bitorder="little")

    def to_bytes(self) -> bytes:
        """Self-describing blob; representation chosen by size.

        Sparse states (few set bits — e.g. per-task PARTIALS of a
        distributed build, which otherwise ship the full n_bits/8 bitmap
        through two shuffle stages) serialize as sorted uint32/uint64 set-bit
        positions (``BLM2``); dense states keep the packed bitmap
        (``BLM1``).  The choice is a deterministic function of the state,
        so distributed and sequential builds of the same bit set still
        byte-match."""
        head = struct.pack("<iiqq", self.cfg.log2_bits, self.cfg.num_hashes,
                           self.cfg.seed, self.n_added)
        positions = np.flatnonzero(self.unpacked)
        pos_dtype = np.uint32 if self.cfg.log2_bits <= 32 else np.uint64
        if len(positions) * np.dtype(pos_dtype).itemsize < self.cfg.n_bits // 8:
            return (_MAGIC_SPARSE + head
                    + positions.astype(pos_dtype).tobytes())
        return _MAGIC + head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSketch":
        magic = bytes(data[:4])
        assert magic in (_MAGIC, _MAGIC_SPARSE), "not a BLM blob"
        log2_bits, k, seed, n_added = struct.unpack("<iiqq", data[4:28])
        sk = cls(BloomConfig(log2_bits, k, seed))
        if magic == _MAGIC_SPARSE:
            pos_dtype = np.uint32 if log2_bits <= 32 else np.uint64
            positions = np.frombuffer(data[28:], dtype=pos_dtype)
            sk.unpacked[positions] = 1
        else:
            sk.unpacked = np.unpackbits(np.frombuffer(data[28:], dtype=np.uint8),
                                        bitorder="little")
        sk.n_added = n_added
        return sk
