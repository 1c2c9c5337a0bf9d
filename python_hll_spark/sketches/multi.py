"""Dispatch spec for mixed-sketch state columns.

Serialized blobs are self-describing: CMS/Bloom/KLL/t-digest carry a 4-byte
magic; anything else is an hll-storage-spec v1 blob (its first byte's high
nibble is the schema version).  This lets one merge pipeline carry rows of
different sketch kinds (the single-pass corpus profile)."""

from __future__ import annotations


_MAGICS = {}


def _registry():
    global _MAGICS
    if not _MAGICS:
        from python_hll_spark.sketches.bloom import BloomSketch
        from python_hll_spark.sketches.cms import CMSSketch
        from python_hll_spark.sketches.kll import KLLSketch
        from python_hll_spark.sketches.tdigest import TDigestSketch

        _MAGICS = {b"CMS1": CMSSketch, b"CMS2": CMSSketch, b"CMS3": CMSSketch,
                   b"BLM1": BloomSketch, b"BLM2": BloomSketch,
                   b"KLL1": KLLSketch, b"TDG1": TDigestSketch}
    return _MAGICS


def sketch_from_bytes(data: bytes):
    """Deserialize any engine sketch blob by magic (HLL as fallback)."""
    cls = _registry().get(bytes(data[:4]))
    if cls is not None:
        return cls.from_bytes(data)
    from python_hll_spark.sketches.hll import HLLSketch

    return HLLSketch.from_bytes(data)


class MultiSpec:
    """SketchSpec whose deserialize dispatches on the blob's magic; used for
    merging heterogeneous (group, sketch_kind, state) partial rows."""

    name = "multi"

    def new(self):  # partials are built elsewhere; merge-only spec
        raise NotImplementedError("MultiSpec is merge/finalize-only")

    def update(self, state, values):
        raise NotImplementedError("MultiSpec is merge/finalize-only")

    def merge(self, state, other) -> None:
        if type(state) is not type(other):
            raise ValueError("cannot merge different sketch kinds")
        from python_hll_spark.sketches.hll import HLLSketch

        if isinstance(state, HLLSketch):
            state.union(other)
        else:
            state.merge(other)

    def serialize(self, state) -> bytes:
        return state.to_bytes()

    def deserialize(self, data: bytes):
        return sketch_from_bytes(bytes(data))
