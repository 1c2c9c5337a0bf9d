"""char_entropy_frame: vectorized per-doc byte-entropy kernel."""
import math

import pytest

from python_hll_spark.functions.text import char_entropy_frame


def _py_entropy(s: str) -> tuple[int, int, float]:
    b = s.encode("utf-8")
    if not b:
        return 0, 0, 0.0
    freq: dict = {}
    for x in b:
        freq[x] = freq.get(x, 0) + 1
    t = float(len(b))
    snl = sum(n * math.log2(n) for n in freq.values())
    return len(b), len(freq), math.log2(t) - snl / t


TEXTS = [
    "",                     # empty -> entropy 0
    "aaaaaaa",              # single symbol -> exactly 0
    "abababab",             # two symbols, equal -> exactly 1
    "the quick brown fox jumps over the lazy dog",
    "  \t\n  ",             # whitespace-only
    "0123456789" * 40,
    "café naïve 中文",  # multibyte: BYTE entropy, by contract
    None,                   # NULL -> empty
]


def test_kernel_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string")
    rows = {r["doc_id"]: r
            for r in char_entropy_frame(df).collect()}
    assert len(rows) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        n, d, e = _py_entropy(t or "")
        r = rows[i]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == d
        assert r["entropy"] == pytest.approx(e, abs=1e-12)


def test_exact_values_and_bounds(spark):
    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd")], "doc_id bigint, text string")
    got = {r["doc_id"]: r["entropy"] for r in char_entropy_frame(df).collect()}
    assert got[0] == 0.0
    assert got[1] == 1.0
    assert got[2] == 2.0


def test_duplicate_texts_equal_entropy(spark):
    df = spark.createDataFrame(
        [(i, "shared body " * 7) for i in range(5)] + [(99, "other text")],
        "doc_id bigint, text string")
    rows = char_entropy_frame(df).collect()
    dups = {r["entropy"] for r in rows if r["doc_id"] < 90}
    assert len(dups) == 1


def test_zero_exchange_plan(spark):
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('doc body ', id) AS text")
    plan = char_entropy_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
