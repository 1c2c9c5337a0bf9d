"""URL / web-domain curation operators: URL normalization, registrable-
domain extraction, URL-level exact dedup, per-domain document caps, and
domain blocklist filtering — the C4/RefinedWeb-style crawl-curation stages
that sit in front of content-level dedup in a web-scale training-data
pipeline.

Everything here is pure JVM column expressions (regexp/array built-ins —
whole-stage-codegen friendly, zero Python in the hot path) plus the
partition-pruned per-group top-k from ``operators.sampling`` for caps.
Every regex is written in the common Java-regex/RE2 subset so a DuckDB
oracle can mirror it 1:1 (no lookaround, no group refs in replacements).

Scale shape:
- normalization/domain extraction: narrow projections, no shuffle;
- URL dedup: shuffles one 8-byte ``xxhash64(normalized_url)`` key per row
  (never the URL string, never the payload), same plan as content dedup;
- domain caps: per-partition lossless top-k prune first, so the ranking
  shuffle moves at most ``cap`` rows per (domain, input partition) — a
  10^9-page domain costs its cap, not its crawl;
- blocklist: broadcast anti-join on the registrable domain (blocklists
  are small dimension tables by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters stripped by normalization (tracking / click-id params,
# the set C4-era pipelines drop).  Kept as one alternation used on BOTH
# the Spark and oracle sides.
TRACKING_PARAM_RE = "^(utm_[a-zA-Z_]+|fbclid|gclid|msclkid|ref)="

# Second-level labels that mark a country-code registrable domain
# (public-suffix-lite heuristic: "example.co.uk" is one registrant).
_CC_SECOND_LEVEL = ("co", "com", "net", "org", "gov", "edu", "ac")


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, http->https, strip ``www.``,
    default ports, fragments, and tracking params; sort surviving query
    params; strip trailing slashes.  Pure JVM expressions."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")          # fragment
    prefix = F.lower(F.regexp_extract(u, "^[^/]*//[^/:]*(:[0-9]+)?", 0))
    prefix = F.regexp_replace(prefix, "^http:", "https:")
    prefix = F.regexp_replace(prefix, "//www\\.", "//")
    prefix = F.regexp_replace(prefix, ":443$", "")
    prefix = F.regexp_replace(prefix, ":80$", "")
    rest = F.regexp_replace(u, "^[^/]*//[^/]*", "")
    path = F.regexp_replace(F.regexp_extract(rest, "^[^?]*", 0), "/+$", "")
    params = F.split(F.regexp_replace(rest, "^[^?]*[?]?", ""), "&")
    kept = F.array_sort(F.filter(
        params, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    query = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(prefix, path, query)


def url_host(url: Column) -> Column:
    """Hostname of a NORMALIZED url (lowercase, no port/www by then)."""
    return F.regexp_extract(url, "^[a-z]+://([^/:?]+)", 1)


def registrable_domain(host: Column) -> Column:
    """Registrable domain via the public-suffix-lite heuristic: last two
    labels, or last three when the second-to-last label is a known
    second-level registry label under a two-letter country code
    (``foo.example.co.uk`` -> ``example.co.uk``).  A full public-suffix
    list drops in as a broadcast join on this column's suffix; the
    heuristic covers the dominant crawl mass and keeps the expression
    JVM-side and oracle-mirrorable."""
    parts = F.split(host, "\\.")
    k = F.size(parts)
    last, second, third = (F.element_at(parts, -1), F.element_at(parts, -2),
                           F.element_at(parts, -3))
    cc3 = ((k >= 3) & second.isin(*_CC_SECOND_LEVEL)
           & (F.length(last) == 2))
    return (F.when(cc3, F.concat_ws(".", third, second, last))
            .when(k >= 2, F.concat_ws(".", second, last))
            .otherwise(host))


def with_url_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``norm_url``, ``host``, ``domain`` derived columns."""
    norm = url_normalize(F.col(url_col))
    host = url_host(norm)
    return (df.withColumn("norm_url", norm)
            .withColumn("host", host)
            .withColumn("domain", registrable_domain(host)))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per NORMALIZED url (the crawl-frontier dedup
    that runs before any content hashing — scheme/www/port/tracking-param
    variants of one page collapse to one fetch).

    Scale shape: ranks inside 8-byte ``xxhash64(norm_url)`` partitions —
    only (id, hash) shuffles, the payload stays put and survivors are
    selected with one narrow filter after a window on the hash key.  The
    ~2^-64/pair hash-collision risk is the same accepted trade as
    content-fingerprint dedup (``dedup.dedup_exact``)."""
    key = F.xxhash64(url_normalize(F.col(url_col)))
    narrow = df.select(id_col, key.alias("__uk"))
    from pyspark.sql import Window
    w = Window.partitionBy("__uk")
    winners = (narrow.withColumn("__min", F.min(id_col).over(w))
               .where(F.col(id_col) == F.col("__min"))
               .select(id_col))
    return df.join(winners, id_col, "left_semi")


def domain_cap(df: DataFrame, cap: int, url_col: str = "url",
               quality_key: Column | str | None = None,
               id_col: str = "doc_id") -> DataFrame:
    """At most ``cap`` documents per registrable domain, keeping the
    best by ``quality_key`` (desc; ties by min id).  Default quality key
    is document length via ``length(url)``-free heuristics left to the
    caller — pass e.g. ``F.col("n_chars")`` or a classifier score.

    Scale shape: delegates to ``sampling.group_topk`` — per-partition
    lossless prune bounds the per-domain shuffle at cap x partitions
    rows regardless of how large the dominant domain is; winners are
    semi-joined back without a broadcast (domain count is unbounded)."""
    from python_hll_spark.operators.sampling import group_topk

    if quality_key is None:
        quality_key = F.lit(0)
    key = F.col(quality_key) if isinstance(quality_key, str) else quality_key
    dom = registrable_domain(url_host(url_normalize(F.col(url_col))))
    dfd = df.withColumn("domain", dom)
    return group_topk(dfd, cap, key, by=["domain"], id_col=id_col,
                      ascending=False, broadcast_winners=False)


def blocklist_filter(df: DataFrame, blocked_domains, url_col: str = "url") \
        -> DataFrame:
    """Drop rows whose registrable domain is on the blocklist (broadcast
    anti-join; ``blocked_domains`` is a list of strings or a one-column
    DataFrame — blocklists are small dims by construction)."""
    spark = df.sparkSession
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.toDF("__bl_domain")
    else:
        bl = spark.createDataFrame([(d,) for d in blocked_domains],
                                   "__bl_domain string")
    dom = registrable_domain(url_host(url_normalize(F.col(url_col))))
    return (df.withColumn("__dom", dom)
            .join(F.broadcast(bl),
                  F.col("__dom") == F.col("__bl_domain"), "left_anti")
            .drop("__dom"))
