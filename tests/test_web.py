"""URL/web curation operators: normalization, registrable domains,
URL dedup, per-domain caps, blocklists (functions/web.py) plus the
generalized group_topk they ride on."""

from pyspark.sql import functions as F

from python_hll_spark.functions.web import (blocklist_filter, domain_cap,
                                            registrable_domain, url_dedup,
                                            url_normalize, with_url_columns)
from python_hll_spark.operators.sampling import group_topk


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")


def test_url_normalize_collapses_variants(spark):
    cases = {
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&page=2#frag":
            "https://example.com/a/b?page=2",
        "https://example.com:443/a/b?page=2":
            "https://example.com/a/b?page=2",
        "https://example.com/a/b?page=2&utm_campaign=y":
            "https://example.com/a/b?page=2",
        # param sort + untracked params survive
        "https://example.com/x?b=2&a=1&gclid=zzz":
            "https://example.com/x?a=1&b=2",
        # no query, trailing slashes, fragment only
        "https://Example.com/path///#sec": "https://example.com/path",
        # bare host
        "https://WWW.Foo.ORG/": "https://foo.org",
    }
    df = _urls(spark, list(cases))
    got = [r["n"] for r in
           df.select(url_normalize(F.col("url")).alias("n"))
           .orderBy("doc_id").collect()]
    assert got == list(cases.values())


def test_registrable_domain_heuristic(spark):
    cases = {
        "a.b.example.com": "example.com",
        "news.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "example.com": "example.com",
        "localhost": "localhost",
        # .co.us-style: 2-letter cc + registry second-level
        "x.y.gov.br": "y.gov.br",
        # NOT a cc suffix: com.example is an ordinary label pair
        "foo.com.example": "com.example",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r["host"]: r["d"] for r in
           df.select("host",
                     registrable_domain(F.col("host")).alias("d")).collect()}
    assert got == cases


def test_url_dedup_keeps_min_id_per_normalized(spark):
    df = _urls(spark, [
        "https://a.com/x",               # 0: canonical
        "HTTP://WWW.A.com:80/x",         # 1: same page, messy
        "https://a.com/x?utm_source=t",  # 2: same page, tracked
        "https://a.com/y",               # 3: different page
    ])
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [0, 3]


def test_domain_cap_keeps_best_by_quality(spark):
    rows = [(i, f"https://big.com/p{i}", i * 10) for i in range(20)]
    rows += [(100, "https://small.org/a", 5), (101, "https://small.org/b", 4)]
    df = spark.createDataFrame(rows, "doc_id long, url string, q long")
    kept = domain_cap(df, cap=3, quality_key="q")
    by_dom = {}
    for r in kept.collect():
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert sorted(by_dom["big.com"]) == [17, 18, 19]   # top-3 by q desc
    assert sorted(by_dom["small.org"]) == [100, 101]   # under cap: all


def test_group_topk_prune_equivalence_and_ties(spark):
    df = spark.createDataFrame(
        [(i, "g", i % 3) for i in range(30)], "doc_id long, g string, k long")
    a = group_topk(df, 4, "k", by=["g"], ascending=False, prune=True)
    b = group_topk(df.repartition(7), 4, "k", by=["g"], ascending=False,
                   prune=False)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b           # prune lossless, partitioning-free
    assert ids_a == [2, 5, 8, 11]   # k=2 rows first (desc), ties by min id


def test_blocklist_filter(spark):
    df = _urls(spark, [
        "https://ok.com/a",
        "https://www.spam.co.uk/buy",
        "https://sub.spam.co.uk/buy2",
        "https://fine.org/x",
    ])
    kept = sorted(r["doc_id"] for r in
                  blocklist_filter(df, ["spam.co.uk"]).collect())
    assert kept == [0, 3]


def test_with_url_columns_schema(spark):
    df = with_url_columns(_urls(spark, ["https://a.b.example.co.uk/x?q=1"]))
    row = df.collect()[0]
    assert row["norm_url"] == "https://a.b.example.co.uk/x?q=1"
    assert row["host"] == "a.b.example.co.uk"
    assert row["domain"] == "example.co.uk"
