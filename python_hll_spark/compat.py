"""Drop-in API facade matching the reference library's public surface.

A python-hll user can ``from python_hll_spark.compat import HLL, HLLType``
and keep their code: constructor signature, ``create_for_testing``,
``add_raw``, ``union``, ``cardinality``, ``clear``, ``to_bytes`` /
``from_bytes`` (returning/accepting the reference's signed-int byte lists),
``get_type`` — same parameter ranges, same storage-spec bytes.
(Reference surface: /root/reference/python_hll/hll.py:94-855.)
"""

from __future__ import annotations

import numpy as np

from python_hll_spark.sketches.hll import HLLConfig, HLLSketch
from python_hll_spark.sketches.hll import HLLType as HLLType  # noqa: PLC0414


class HLL:
    """Reference-shaped wrapper around the vectorized kernel."""

    def __init__(self, log2m: int, regwidth: int, expthresh: int = -1,
                 sparseon: bool = True, type: int = HLLType.EMPTY):
        self._sk = HLLSketch(HLLConfig.create(log2m, regwidth, expthresh, sparseon),
                             type)

    @classmethod
    def create_for_testing(cls, log2m, regwidth, explicit_threshold,
                           sparse_threshold, type=HLLType.EMPTY):
        out = cls.__new__(cls)
        out._sk = HLLSketch(
            HLLConfig.for_testing(log2m, regwidth, explicit_threshold,
                                  sparse_threshold), type)
        return out

    @classmethod
    def _wrap(cls, sk: HLLSketch) -> "HLL":
        out = cls.__new__(cls)
        out._sk = sk
        return out

    def get_type(self) -> int:
        return self._sk.type

    def add_raw(self, raw_value: int) -> None:
        self._sk.add_raw(raw_value)

    def add_hashed(self, values) -> None:
        """Vectorized extension: batch add of pre-hashed int64 values."""
        self._sk.add_hashed(np.asarray(values, dtype=np.int64))

    def cardinality(self) -> int:
        return self._sk.cardinality()

    def clear(self) -> None:
        self._sk.clear()

    def union(self, other: "HLL") -> None:
        self._sk.union(other._sk)

    def to_bytes(self) -> list[int]:
        """Reference interchange form: list of Java-style signed ints."""
        return [b - 256 if b > 127 else b for b in self._sk.to_bytes()]

    @classmethod
    def from_bytes(cls, data) -> "HLL":
        raw = bytes((b & 0xFF) for b in data)
        return cls._wrap(HLLSketch.from_bytes(raw))
