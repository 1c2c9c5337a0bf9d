"""SketchSpec adapters binding the numpy kernels to the distributed
aggregation operator (operators/aggregate.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from python_hll_spark.sketches.hll import HLLConfig, HLLSketch


@dataclass
class HLLSpec:
    """HLL aggregator: update takes pre-hashed int64 values."""

    cfg: HLLConfig = field(default_factory=lambda: HLLConfig.create(11, 5))
    name: str = "hll"

    def new(self) -> HLLSketch:
        return HLLSketch(self.cfg)

    def update(self, state: HLLSketch, values: np.ndarray) -> None:
        state.add_hashed(values)

    def merge(self, state: HLLSketch, other: HLLSketch) -> None:
        state.union(other)

    def serialize(self, state: HLLSketch) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes) -> HLLSketch:
        return HLLSketch.from_bytes(data)

    def estimate(self, data: bytes) -> int:
        return HLLSketch.from_bytes(data).cardinality()
