"""mmh3-compatible MurmurHash3 x64_128: scalar oracle, vectorized kernel,
and semantic sketch interop with the reference ecosystem.

The reference library's contract is caller-hashes-with-MurmurHash3
(reference README.rst:44-49, hll.py:226-230).  These tests prove that a
sketch built by THIS engine from raw strings (hasher="murmur3") is
byte-identical to one built "the reference way" — per-element add_raw of
pre-computed murmur hashes, i.e. exactly what a java-hll / postgresql-hll /
mmh3 user would produce — so the two can be semantically unioned.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_hll_spark.functions.murmur3 import (
    murmur3_64, murmur3_x64_128_scalar)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ------------------------------------------------------------ known vector
def test_mmh3_published_vector():
    # mmh3 README example: mmh3.hash64('foo') == (-2129773440516405919,
    # 9128664383759220103)
    h1, h2 = murmur3_x64_128_scalar(b"foo")
    assert (_signed(h1), _signed(h2)) == (-2129773440516405919,
                                          9128664383759220103)


def test_empty_and_seed():
    assert murmur3_x64_128_scalar(b"") == (0, 0)
    h1, _ = murmur3_x64_128_scalar(b"", seed=1)
    assert h1 != 0  # seed participates


# ------------------------------------------------- vector == scalar oracle
def test_vectorized_matches_scalar_all_lengths():
    rng = np.random.default_rng(11)
    vals = [bytes(rng.integers(0, 256, size=ln, dtype=np.uint8))
            for ln in list(range(0, 40)) + [64, 127, 128, 1000]
            for _ in range(3)]
    vec = murmur3_64(vals)
    for i, v in enumerate(vals):
        expect = np.int64(np.uint64(murmur3_x64_128_scalar(v)[0])).item()
        assert int(vec[i]) == expect, f"len={len(v)}"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=48), min_size=1, max_size=20))
def test_vectorized_matches_scalar_hypothesis(vals):
    vec = murmur3_64(vals)
    for i, v in enumerate(vals):
        assert int(vec[i]) == np.int64(
            np.uint64(murmur3_x64_128_scalar(v)[0])).item()


def test_unicode_strings_hash_as_utf8():
    vals = ["héllo", "日本語テキスト", "emoji 🙂", ""]
    vec = murmur3_64(vals)
    for i, v in enumerate(vals):
        assert int(vec[i]) == np.int64(
            np.uint64(murmur3_x64_128_scalar(v.encode("utf-8"))[0])).item()


def test_null_values_rejected():
    import pyarrow as pa
    with pytest.raises(ValueError, match="null"):
        murmur3_64(pa.array(["a", None]))


def test_arrow_sliced_array_offsets():
    import pyarrow as pa
    arr = pa.array(["aaa", "bbbb", "cc", "ddddd"]).slice(1, 2)
    vec = murmur3_64(arr)
    assert int(vec[0]) == np.int64(np.uint64(murmur3_x64_128_scalar(b"bbbb")[0])).item()
    assert int(vec[1]) == np.int64(np.uint64(murmur3_x64_128_scalar(b"cc")[0])).item()


# --------------------------------------------- semantic interop (the point)
def test_sketch_interop_with_reference_path(spark):
    """Engine sketch (hasher='murmur3') is byte-identical to a sketch built
    the reference way (per-element add_raw of mmh3-style hashes), and the
    union of the two halves equals the full-build bytes."""
    from python_hll_spark.operators.ndv import hll_ndv_column
    from python_hll_spark.sketches.hll import HLLConfig, HLLSketch

    cfg = HLLConfig.create(11, 5)
    strings = [f"user-{i}" for i in range(5000)]
    df = spark.createDataFrame([(s,) for s in strings], "u string")

    # Spark-side build through the public operator
    row = hll_ndv_column(df, "u", cfg=cfg, hasher="murmur3").collect()[0]
    spark_bytes = bytes(row["state"])

    # reference-path build: caller pre-hashes with murmur3, per-element add
    ref = HLLSketch(HLLConfig.create(11, 5))
    for s in strings:
        h = np.int64(np.uint64(murmur3_x64_128_scalar(s.encode())[0]))
        ref.add_hashed(np.array([h], dtype=np.int64))
    assert ref.to_bytes() == spark_bytes
    assert row["ndv"] == ref.cardinality()

    # union interop: reference user sketches half, we sketch the other half
    df_a = spark.createDataFrame([(s,) for s in strings[:2500]], "u string")
    ours = HLLSketch.from_bytes(bytes(
        hll_ndv_column(df_a, "u", cfg=cfg, hasher="murmur3")
        .collect()[0]["state"]))
    theirs = HLLSketch(HLLConfig.create(11, 5))
    for s in strings[2500:]:
        h = np.int64(np.uint64(murmur3_x64_128_scalar(s.encode())[0]))
        theirs.add_hashed(np.array([h], dtype=np.int64))
    ours.union(theirs)
    assert ours.to_bytes() == spark_bytes  # same multiset -> same registers


def test_murmur3_udf_null_safe(spark):
    from pyspark.sql import functions as F
    from python_hll_spark.functions.murmur3 import murmur3_64_udf

    df = spark.createDataFrame([("a",), (None,), ("b",)], "s string")
    out = df.select(murmur3_64_udf()(F.col("s")).alias("h")).collect()
    assert out[1]["h"] is None
    assert out[0]["h"] == np.int64(np.uint64(murmur3_x64_128_scalar(b"a")[0])).item()


def test_murmur3_hash_frame_matches_udf_and_keeps_nulls(spark):
    """The Arrow-buffer mapInArrow path must hash identically to the
    pandas-UDF tier (both mmh3-compatible) and preserve NULLs."""
    from pyspark.sql import functions as F

    from python_hll_spark.functions.murmur3 import (murmur3_64_udf,
                                                    murmur3_hash_frame)

    rows = [(f"v{i}" * (i % 7), "g") for i in range(500)]
    rows += [(None, "g"), ("", "h"), (None, "h")]
    df = spark.createDataFrame(rows, "v string, g string")
    frame = murmur3_hash_frame(df.select("g", "v"), ["g"], "v") \
        .groupBy("g").agg(F.sum(F.col("__h").cast("decimal(38,0)")).alias("s"),
                          F.count("__h").alias("n"))
    udf = df.select("g", murmur3_64_udf()(F.col("v")).alias("__h")) \
        .groupBy("g").agg(F.sum(F.col("__h").cast("decimal(38,0)")).alias("s"),
                          F.count("__h").alias("n"))
    a = {r["g"]: (r["s"], r["n"]) for r in frame.collect()}
    b = {r["g"]: (r["s"], r["n"]) for r in udf.collect()}
    assert a == b
    assert a["g"][1] == 500  # nulls not hashed


# ------------------------------------------------- word_hash_segments
def _whs_gt(texts):
    """Ground truth: per-doc murmur3 hashes of ASCII-lowered,
    ASCII-whitespace-split words."""
    from python_hll_spark.functions.murmur3 import murmur3_64
    table = str.maketrans({chr(c): chr(c + 32) for c in range(65, 91)})
    out = []
    for t in texts:
        words = [] if t is None else \
            "".join(t.translate(table)).split()
        out.append([int(h) for h in murmur3_64(words)] if words else [])
    return out


def test_word_hash_segments_matches_python_split():
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import word_hash_segments

    texts = ["  Hello   WORLD ", "", None, "one", "a\tb\nc",
             "trailing space ", " leading", "x", "\t\n  ", "last"]
    hashes, counts = word_hash_segments(pa.array(texts))
    gt = _whs_gt(texts)
    assert counts.tolist() == [len(g) for g in gt]
    offs = np.concatenate([[0], np.cumsum(counts)])
    got = [hashes[offs[i]:offs[i + 1]].tolist() for i in range(len(texts))]
    assert got == gt


def test_word_hash_segments_buffer_tail_safe():
    """Regression for the pyarrow utf8_split_whitespace overread: a text
    ending in whitespace at the exact end of the data buffer, with a
    UTF-8-continuation-looking byte (0xff) physically after it, must
    still split off the trailing space.  pc.utf8_split_whitespace on this
    exact layout returns ['hello', 'world '] (pyarrow 16.1.0), which made
    MinHash signatures nondeterministic across Spark partition layouts."""
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import (murmur3_64,
                                                    word_hash_segments)

    payload = b"hello world "
    offs = np.array([0, len(payload)], dtype=np.int32)
    whole = pa.py_buffer(payload + b"\xff")
    arr = pa.StringArray.from_buffers(
        1, pa.py_buffer(offs.tobytes()), whole.slice(0, len(payload)))
    hashes, counts = word_hash_segments(arr)
    assert counts.tolist() == [2]
    assert hashes.tolist() == [int(h) for h in murmur3_64(["hello", "world"])]


def test_word_hash_segments_sliced_array():
    import pyarrow as pa

    from python_hll_spark.functions.murmur3 import word_hash_segments

    texts = ["skip me", "Keep THIS one ", " and this", "not me"]
    arr = pa.array(texts).slice(1, 2)
    hashes, counts = word_hash_segments(arr)
    gt = _whs_gt(texts[1:3])
    offs = np.concatenate([[0], np.cumsum(counts)])
    got = [hashes[offs[i]:offs[i + 1]].tolist() for i in range(2)]
    assert got == gt
