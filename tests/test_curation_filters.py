"""Web-curation filter operators: Gopher-style quality rules, line-level
dedup, and n-gram collision decontamination."""

from pyspark.sql import functions as F

from python_hll_spark.functions.text import gopher_quality_flags, line_dedup
from python_hll_spark.operators.decontaminate import (contamination_ngrams,
                                                      decontaminate_ngrams)

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest tonight where it rests under "
        "tall trees and the wind is soft and the night is long and "
        "quiet for every creature that lives there in peace") * 2


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return gopher_quality_flags(df, **kw).collect()[0].asDict()


def test_gopher_good_doc_keeps(spark):
    r = _flags(spark, GOOD)
    assert r["keep"] and r["n_rules_failed"] == 0, r


def test_gopher_word_count_rule(spark):
    r = _flags(spark, "too short to train on")
    assert not r["ok_word_count"] and not r["keep"]
    assert r["ok_mean_word_len"] and r["ok_alpha_words"]


def test_gopher_mean_word_len_rule(spark):
    long_words = ("the extraordinarily incomprehensible overcomplicated "
                  "internationalization phenomenally " * 20)
    r = _flags(spark, long_words)
    assert not r["ok_mean_word_len"], r


def test_gopher_symbol_ratio_rule(spark):
    r = _flags(spark, GOOD + " #" * 20)
    assert not r["ok_symbol_ratio"]
    # hashes are not words, so word count is unchanged
    assert r["n_words"] == _flags(spark, GOOD)["n_words"]


def test_gopher_alpha_words_rule(spark):
    numeric = GOOD + " " + " ".join(str(i) for i in range(100))
    r = _flags(spark, numeric)
    assert not r["ok_alpha_words"], r


def test_gopher_stopword_rule(spark):
    no_stop = "alpha beta gamma delta epsilon zeta " * 20
    r = _flags(spark, no_stop)
    assert not r["ok_stopwords"]


def test_gopher_empty_doc_fails_everything(spark):
    r = _flags(spark, "")
    assert not r["keep"] and r["n_rules_failed"] == 5, r


def test_line_dedup_removes_cross_doc_lines_only(spark):
    rows = [
        (1, "NAV menu\nunique body one\n\nCopyright"),
        (2, "NAV menu\nunique body two\nCopyright"),
        (3, "solo header\nunique body three\nCopyright"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique body one\n"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "unique body two"
    assert out[3]["clean_text"] == "solo header\nunique body three"
    assert out[3]["n_removed"] == 1


def test_line_dedup_within_doc_repeats_survive(spark):
    # a line repeated inside ONE doc is not cross-document boilerplate
    rows = [(1, "echo\necho\nbody"), (2, "other\nlines")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "echo\necho\nbody"
    assert out[1]["n_removed"] == 0


def test_line_dedup_whitespace_lines_never_counted(spark):
    # "   " appears in both docs but is structural, not boilerplate
    rows = [(1, "a\n   \nbody one"), (2, "b\n   \nbody two")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "a\n   \nbody one"
    assert out[1]["n_removed"] == 0


def test_line_dedup_trim_matching(spark):
    # same content with different indentation is the same line
    rows = [(1, "  menu \nbody one"), (2, "menu\nbody two")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "body one"
    assert out[2]["clean_text"] == "body two"


def test_ngram_contamination_counts(spark):
    train = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon"),   # shares the eval 3-grams
        (2, "one two three four five"),          # disjoint
        (3, "alpha beta"),                       # shorter than n: no grams
    ], "doc_id int, text string")
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id int, text string")
    hits = {r["doc_id"]: r for r in
            contamination_ngrams(train, eval_df, n=3).collect()}
    assert set(hits) == {1}
    # doc 1 windows: (a b g) (b g d) (g d e); first two collide
    assert hits[1]["n_grams"] == 3 and hits[1]["n_hit_grams"] == 2
    clean = decontaminate_ngrams(train, eval_df, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_ngram_contamination_normalizes_case_and_space(spark):
    train = spark.createDataFrame(
        [(1, "  ALPHA   beta GAMMA  ")], "doc_id int, text string")
    eval_df = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id int, text string")
    hits = contamination_ngrams(train, eval_df, n=3).collect()
    assert len(hits) == 1 and hits[0]["n_hit_grams"] == 1


def test_strip_spans_removes_shared_span(spark):
    from python_hll_spark.functions.text import strip_common_ngrams

    shared = "all rights reserved by the site"        # 6 words
    rows = [
        (1, "unique article body here today " + shared),
        (2, shared + " another different page entirely here"),
        (3, "totally unrelated words live in this document"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r
           for r in strip_common_ngrams(df, n=3, min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique article body here today"
    assert out[1]["n_covered_words"] == 6
    assert out[2]["clean_text"] == "another different page entirely here"
    assert out[3]["clean_text"] == out[3]["text"].lower()
    assert out[3]["n_covered_words"] == 0


def test_strip_spans_short_doc_untouched(spark):
    from python_hll_spark.functions.text import strip_common_ngrams

    rows = [(1, "too short"), (2, "too short")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = strip_common_ngrams(df, n=3, min_docs=2).collect()
    assert all(r["n_covered_words"] == 0 and r["clean_text"] == "too short"
               for r in out)


def test_strip_spans_within_doc_repeat_survives(spark):
    from python_hll_spark.functions.text import strip_common_ngrams

    rows = [(1, "la la la la la la"), (2, "other words here today now")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r
           for r in strip_common_ngrams(df, n=3, min_docs=2).collect()}
    assert out[1]["n_covered_words"] == 0


def test_strip_spans_full_coverage_empties_doc(spark):
    from python_hll_spark.functions.text import strip_common_ngrams

    t = "exactly the same text in both documents"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id int, text string")
    out = strip_common_ngrams(df, n=3, min_docs=2).collect()
    assert all(r["clean_text"] == "" and
               r["n_covered_words"] == r["n_words"] for r in out)
