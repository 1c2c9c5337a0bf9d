"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the Data Selection via Importance Resampling recipe
(Xie et al. 2023, arXiv:2302.03169) the way a Spark pipeline should:

1. featurize every doc as a bag of HASHED unigram+bigram buckets
   (``buckets`` ~ 10k, the paper's setting) — pure JVM array expressions,
   no Python in the corpus pass;
2. fit two bag-of-buckets unigram models — target corpus ``p`` and raw
   corpus ``q`` — each ONE map-side-combined aggregation that collapses a
   100 TB scan to a ``buckets``-row frame;
3. score every raw doc with the log importance weight
   ``sum_f count(f) * (ln p[f] - ln q[f])`` via a BROADCAST join of the
   buckets-row log-ratio frame against the exploded features (occurrence
   rows never shuffle; the per-doc sum map-side-combines to one row per
   doc before its only shuffle);
4. resample with seeded Gumbel top-k (the paper's sampling-without-
   replacement trick: argmax of ``w + Gumbel`` ~ sampling proportional to
   ``exp(w)``), planned as TakeOrderedAndProject — count-free, bounded
   driver result, no global sort.

The reference library (AdRoll/python-hll) has no selection surface at all;
this operator exists for the training-data-pipeline tier of the target
engine. Hash choice is Spark's built-in xxhash64 so the whole featurizer
stays inside whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_hll_spark.functions.text import _norm_word_array


def hashed_ngram_features(text: Column, buckets: int = 10000,
                          bigrams: bool = True) -> Column:
    """array<bigint> of hashed feature buckets for ``text``: one entry per
    unigram occurrence plus (optionally) one per bigram occurrence —
    multiplicity preserved, exactly the paper's bag-of-hashed-ngrams."""
    ws = _norm_word_array(text)
    uni = F.transform(ws, lambda w: F.pmod(F.xxhash64(w), F.lit(buckets)))
    if not bigrams:
        return uni
    idx = F.when(F.size(ws) >= 2,
                 F.sequence(F.lit(1), F.size(ws) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    big = F.transform(
        idx,
        lambda i: F.pmod(
            F.xxhash64(F.concat_ws(" ", F.element_at(ws, i),
                                   F.element_at(ws, i + 1))),
            F.lit(buckets)))
    return F.concat(uni, big)


def hashed_ngram_features_tokens(tokens: Column, buckets: int = 10000,
                                 bigrams: bool = True) -> Column:
    """Pre-tokenized (input_hint shape) featurizer: one bucket per token
    occurrence plus one per adjacent token pair.  Bigrams hash the two ids
    directly (``xxhash64(a, b)``) — no string building, stays in
    whole-stage codegen."""
    uni = F.transform(tokens, lambda t: F.pmod(F.xxhash64(t),
                                               F.lit(buckets)))
    if not bigrams:
        return uni
    idx = F.when(F.size(tokens) >= 2,
                 F.sequence(F.lit(1), F.size(tokens) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    big = F.transform(
        idx,
        lambda i: F.pmod(F.xxhash64(F.element_at(tokens, i),
                                    F.element_at(tokens, i + 1)),
                         F.lit(buckets)))
    return F.concat(uni, big)


def bucket_counts(df: DataFrame, text_col: str = "text",
                  buckets: int = 10000, bigrams: bool = True) -> DataFrame:
    """(bucket bigint, cnt bigint) hashed-feature occurrence counts — the
    sufficient statistics of a bag-of-buckets unigram model.  ONE corpus
    scan; groupBy partial-aggregates map-side so the shuffle moves at most
    ``buckets`` rows per task regardless of corpus size."""
    feats = hashed_ngram_features(F.col(text_col), buckets, bigrams)
    return (df.select(F.explode(feats).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def bucket_counts_tokens(df: DataFrame, tokens_col: str = "tokens",
                         buckets: int = 10000,
                         bigrams: bool = True) -> DataFrame:
    """``bucket_counts`` over the pre-tokenized table shape — as ONE Arrow
    kernel pass: per-task ``np.bincount`` over the bit-exact vectorized
    ``pmod(xxhash64(...), buckets)`` featurizer (``hashing.xxhash64_int``),
    emitting at most ``buckets`` (bucket, cnt) partial rows per task for a
    final tiny sum.  Counts are integers, so the result is EXACTLY the
    explode + groupBy plan's, without materializing ~2 JVM rows per token."""
    import numpy as np
    import pyarrow as pa

    from python_hll_spark.functions.hashing import xxhash64_int

    nb = buckets

    def gen(batches):
        acc = np.zeros(nb, dtype=np.int64)
        for batch in batches:
            toks = batch.column(tokens_col)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offs = toks.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            offs = offs - offs[0]
            flat = toks.flatten().to_numpy(zero_copy_only=False)
            if len(flat) == 0:
                continue
            h_uni = xxhash64_int(flat, 42)
            acc += np.bincount(np.remainder(h_uni, nb), minlength=nb)
            if bigrams and len(flat) > 1:
                bb = np.remainder(
                    xxhash64_int(flat[1:], h_uni[:-1].view(np.uint64)), nb)
                last = offs[1:] - 1
                valid = np.ones(len(flat) - 1, dtype=bool)
                valid[last[(last >= 0) & (last < len(flat) - 1)]] = False
                acc += np.bincount(bb[valid], minlength=nb)
        nz = np.flatnonzero(acc)
        if len(nz) == 0:
            return
        yield pa.RecordBatch.from_arrays(
            [pa.array(nz, pa.int64()), pa.array(acc[nz], pa.int64())],
            names=["bucket", "cnt"])

    partials = df.select(tokens_col).mapInArrow(
        gen, schema="bucket bigint, cnt bigint")
    return partials.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def dsir_logratio(target_counts: DataFrame, raw_counts: DataFrame,
                  buckets: int = 10000, alpha: float = 1.0) -> DataFrame:
    """(bucket, logratio double): ``ln p_target[b] - ln q_raw[b]`` with
    add-``alpha`` smoothing over the full bucket space, so buckets absent
    from either side stay finite.  Inputs are buckets-row frames; the two
    total-count lookups are aggregations over those frames (never a corpus
    re-scan).  The result is KBs — broadcast it at the scoring join."""
    t_total = target_counts.agg(F.sum("cnt")).first()[0] or 0
    r_total = raw_counts.agg(F.sum("cnt")).first()[0] or 0
    t_denom = float(t_total + alpha * buckets)
    r_denom = float(r_total + alpha * buckets)
    spark = target_counts.sparkSession
    # smoothing gives absent buckets a NONZERO constant log-ratio, so the
    # frame must cover the full bucket space, not just observed buckets
    full = spark.range(buckets).select(F.col("id").alias("bucket"))
    t = target_counts.withColumnRenamed("cnt", "t_cnt")
    r = raw_counts.withColumnRenamed("cnt", "r_cnt")
    return (full.join(t, "bucket", "left").join(r, "bucket", "left")
            .select(
                "bucket",
                (F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(alpha))
                       / F.lit(t_denom))
                 - F.log((F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(alpha))
                         / F.lit(r_denom))).alias("logratio")))


def dsir_weights(df: DataFrame, logratio: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", buckets: int = 10000,
                 bigrams: bool = True) -> DataFrame:
    """(id, n_features, dsir_weight): per-doc log importance weight — the
    feature-count-weighted sum of broadcast log-ratios.  The exploded
    occurrence rows join the buckets-row ratio frame as a broadcast hash
    join (no occurrence shuffle) and partial-aggregate to one row per doc
    before the only shuffle (per-doc combine happens map-side because
    explode keeps a doc's features inside one partition)."""
    feats = hashed_ngram_features(F.col(text_col), buckets, bigrams)
    return _weights_impl(df, feats, logratio, id_col)


def dsir_weights_tokens(df: DataFrame, logratio: DataFrame,
                        tokens_col: str = "tokens", id_col: str = "doc_id",
                        buckets: int = 10000,
                        bigrams: bool = True) -> DataFrame:
    """``dsir_weights`` over the pre-tokenized table shape — as ONE Arrow
    kernel pass instead of explode + broadcast join + re-aggregate.

    The explode materializes ~2 JVM rows per token (a billion-row frame
    per 500M-token batch) only to look each one up in a 10k-row broadcast
    table and sum per doc.  The kernel does the same lookup as a numpy
    gather against the broadcast ``float64[buckets]`` ratio table inside
    the scan, with the featurizer a BIT-EXACT vectorized replication of
    the JVM ``pmod(xxhash64(...), buckets)`` path (``hashing.xxhash64_int``,
    pinned against ``F.xxhash64``), so per-doc feature buckets — and
    therefore ``n_features`` — are identical to the join plan's.  Docs
    with zero (matched) features drop out exactly like the inner join;
    per-doc float sums agree with the join plan up to summation-order ulp
    (same tolerance class as any shuffle-order change).

    NOTE: materializes ``logratio`` eagerly (buckets-row collect — the
    same rows the join plan would broadcast)."""
    import numpy as np
    import pyarrow as pa

    from python_hll_spark.functions.hashing import xxhash64_int

    table = np.zeros(buckets, dtype=np.float64)
    present = np.zeros(buckets, dtype=bool)
    for r in logratio.select("bucket", "logratio").collect():
        table[r["bucket"]] = r["logratio"]
        present[r["bucket"]] = True
    all_present = bool(present.all())
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((table, None if all_present else present))
    id_type = dict(df.dtypes)[id_col]
    nb = buckets

    def gen(batches):
        tbl, pres = bc.value
        for batch in batches:
            toks = batch.column(tokens_col)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offs = toks.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            offs = offs - offs[0]
            flat = toks.flatten().to_numpy(zero_copy_only=False)
            n_docs = len(offs) - 1
            lens = offs[1:] - offs[:-1]
            h_uni = xxhash64_int(flat, 42)
            ub = np.remainder(h_uni, nb)
            contrib = tbl[ub]
            if pres is not None:
                uok = pres[ub]
                contrib = np.where(uok, contrib, 0.0)
                ucnt_all = np.concatenate([[0], np.cumsum(uok)])
                n_feat = ucnt_all[offs[1:]] - ucnt_all[offs[:-1]]
            else:
                n_feat = lens.copy()
            csum = np.concatenate([[0.0], np.cumsum(contrib)])
            weight = csum[offs[1:]] - csum[offs[:-1]]
            if bigrams and len(flat) > 1:
                # pair hash folds the running hash as the next seed, so
                # the first element's unigram hash is reused directly
                bb = np.remainder(
                    xxhash64_int(flat[1:], h_uni[:-1].view(np.uint64)), nb)
                bcontrib = tbl[bb]
                last = offs[1:] - 1
                valid = np.ones(len(flat) - 1, dtype=bool)
                valid[last[(last >= 0) & (last < len(flat) - 1)]] = False
                if pres is not None:
                    valid &= pres[bb]
                bcontrib = np.where(valid, bcontrib, 0.0)
                bcsum = np.concatenate([[0.0], np.cumsum(bcontrib)])
                cap = len(flat) - 1
                s = np.minimum(offs[:-1], cap)
                e = np.maximum(np.minimum(offs[1:] - 1, cap), s)
                weight = weight + (bcsum[e] - bcsum[s])
                vcnt = np.concatenate([[0], np.cumsum(valid)])
                n_feat = n_feat + (vcnt[e] - vcnt[s])
            keep = n_feat > 0
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if not keep.all():
                mask = pa.array(keep)
                ids = ids.filter(mask)
                n_feat = n_feat[keep]
                weight = weight[keep]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n_feat.astype(np.int64), pa.int64()),
                 pa.array(weight, pa.float64())],
                names=[id_col, "n_features", "dsir_weight"])

    return df.select(id_col, tokens_col).mapInArrow(
        gen, schema=f"`{id_col}` {id_type}, n_features bigint, "
                    f"dsir_weight double")


def _weights_impl(df: DataFrame, feats: Column, logratio: DataFrame,
                  id_col: str) -> DataFrame:
    occ = df.select(F.col(id_col), F.explode(feats).alias("bucket"))
    return (occ.join(F.broadcast(logratio), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_features"),
                 F.sum("logratio").alias("dsir_weight")))


def dsir_resample(df: DataFrame, weights: DataFrame, k: int,
                  id_col: str = "doc_id", seed: int = 42,
                  gumbel: bool = True) -> DataFrame:
    """Select ``k`` rows of ``df`` by importance weight.

    ``gumbel=True`` (the paper's estimator): key = weight + Gumbel noise
    seeded from ``xxhash64(seed, id)`` — deterministic for a given seed,
    equivalent to sampling without replacement proportional to
    ``exp(weight)``.  ``gumbel=False``: plain top-k by weight.
    Either way the selection plans as TakeOrderedAndProject (bounded
    per-task heaps, driver merges heads) — count-free and never a global
    sort of the corpus."""
    two53 = float(1 << 53)
    u = (F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(1 << 53))
         .cast("double") + F.lit(1.0)) / F.lit(two53 + 2.0)
    key = F.col("dsir_weight") + (-F.log(-F.log(u)) if gumbel else F.lit(0.0))
    picked = (weights.select(F.col(id_col), key.alias("__key"))
              .orderBy(F.desc("__key"), F.asc(id_col))
              .limit(k))
    return df.join(F.broadcast(picked.select(id_col)), id_col, "left_semi")


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 10000, bigrams: bool = True,
                alpha: float = 1.0, seed: int = 42,
                gumbel: bool = True) -> DataFrame:
    """End-to-end DSIR: fit target/raw hashed-ngram models, weight every
    raw doc, Gumbel-top-k resample.  Two corpus scans total (one per model;
    the scoring pass re-reads raw — at 100 TB callers should persist the
    weights frame if they also want it for analysis)."""
    t_counts = bucket_counts(target, text_col, buckets, bigrams)
    r_counts = bucket_counts(raw, text_col, buckets, bigrams)
    lr = dsir_logratio(t_counts, r_counts, buckets, alpha)
    w = dsir_weights(raw, lr, text_col, id_col, buckets, bigrams)
    return dsir_resample(raw, w, k, id_col, seed, gumbel)


def reference_dsir_weights(rows, target_rows, buckets=10000, bigrams=True,
                           alpha=1.0, hasher=None):
    """Pure-Python oracle of the weight math for tests: same normalization,
    same smoothing, caller supplies ``hasher(s) -> bucket`` matching the
    Spark-side hash (tests pass a collected xxhash64 lookup)."""
    def featurize(text):
        words = " ".join(str(text or "").lower().split()).split(" ")
        feats = [hasher(w) for w in words]
        if bigrams and len(words) >= 2:
            feats += [hasher(f"{a} {b}")
                      for a, b in zip(words, words[1:])]
        return feats

    def counts(rs):
        c = {}
        for _, text in rs:
            for f in featurize(text):
                c[f] = c.get(f, 0) + 1
        return c

    tc, rc = counts(target_rows), counts(rows)
    t_denom = sum(tc.values()) + alpha * buckets
    r_denom = sum(rc.values()) + alpha * buckets
    out = {}
    for doc_id, text in rows:
        w = 0.0
        for f in featurize(text):
            w += (math.log((tc.get(f, 0) + alpha) / t_denom)
                  - math.log((rc.get(f, 0) + alpha) / r_denom))
        out[doc_id] = w
    return out
