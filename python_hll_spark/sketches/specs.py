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


@dataclass
class CMSSpec:
    """Count-min aggregator: update takes pre-hashed int64 values."""

    cfg: "CMSConfig" = None
    name: str = "cms"

    def __post_init__(self):
        from python_hll_spark.sketches.cms import CMSConfig
        if self.cfg is None:
            self.cfg = CMSConfig()

    def new(self):
        from python_hll_spark.sketches.cms import CMSSketch
        return CMSSketch(self.cfg)

    def update(self, state, values: np.ndarray) -> None:
        state.update(values)

    def merge(self, state, other) -> None:
        state.merge(other)

    def serialize(self, state) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes):
        from python_hll_spark.sketches.cms import CMSSketch
        return CMSSketch.from_bytes(data)


@dataclass
class BloomSpec:
    """Bloom-filter aggregator: update takes pre-hashed int64 values."""

    cfg: "BloomConfig" = None
    name: str = "bloom"

    def __post_init__(self):
        from python_hll_spark.sketches.bloom import BloomConfig
        if self.cfg is None:
            self.cfg = BloomConfig()

    def new(self):
        from python_hll_spark.sketches.bloom import BloomSketch
        return BloomSketch(self.cfg)

    def update(self, state, values: np.ndarray) -> None:
        state.update(values)

    def merge(self, state, other) -> None:
        state.merge(other)

    def serialize(self, state) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes):
        from python_hll_spark.sketches.bloom import BloomSketch
        return BloomSketch.from_bytes(data)


@dataclass
class KLLSpec:
    """KLL quantile aggregator: update takes raw float64 values."""

    cfg: "KLLConfig" = None
    name: str = "kll"

    def __post_init__(self):
        from python_hll_spark.sketches.kll import KLLConfig
        if self.cfg is None:
            self.cfg = KLLConfig()

    def new(self):
        from python_hll_spark.sketches.kll import KLLSketch
        return KLLSketch(self.cfg)

    def update(self, state, values: np.ndarray) -> None:
        state.update(values)

    def merge(self, state, other) -> None:
        state.merge(other)

    def serialize(self, state) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes):
        from python_hll_spark.sketches.kll import KLLSketch
        return KLLSketch.from_bytes(data)


@dataclass
class TDigestSpec:
    """t-digest quantile aggregator: update takes raw float64 values."""

    cfg: "TDigestConfig" = None
    name: str = "tdigest"

    def __post_init__(self):
        from python_hll_spark.sketches.tdigest import TDigestConfig
        if self.cfg is None:
            self.cfg = TDigestConfig()

    def new(self):
        from python_hll_spark.sketches.tdigest import TDigestSketch
        return TDigestSketch(self.cfg)

    def update(self, state, values: np.ndarray) -> None:
        state.update(values)

    def merge(self, state, other) -> None:
        state.merge(other)

    def serialize(self, state) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes):
        from python_hll_spark.sketches.tdigest import TDigestSketch
        return TDigestSketch.from_bytes(data)
