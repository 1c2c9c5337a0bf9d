"""Round-6 optimization probes (bench.py is FROZEN for measurement; this
file exists so per-query isolation, stage-level decomposition and plan
capture never touch the driver-timed harness).

Subcommands:
  headline [reps]       time each headline query individually (same warmup
                        discipline as bench.py), min-of-reps, noop-free
                        .count() like the frozen harness times it
  plans <dir>           write .explain("formatted") for every headline query
  lm-stages             stage decomposition of bigram_logprob_tokens over the
                        2M-doc pre-tokenized subset (the heaviest aux leg)
  aux-quick             single-rep walls for classifier/dsir/chunk legs
  flagship [cores]      one scaling-leg rep (hll_ndv_tokens by source)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000000"))
SEQS_CACHE = os.environ.get("SPARK_GRAFT_SEQS_CACHE",
                            f"/tmp/spark_graft_seqs_{BENCH_DOCS}")

HEADLINE = [
    "hll_ndv_words_by_source",
    "hll_ndv_parts_by_returnflag",
    "cms_top1_by_event_type",
    "kll_value_by_event_type",
    "tdigest_price_quantiles",
    "bloom_partkeys_by_returnflag",
    "dedup_exact_documents",
    "minhash_dedup_documents",
    "ann_topk_embeddings",
    "seqs_ndv_tokens_by_source",
]


def _headline_session():
    import __spark_entry__ as entrymod
    from python_hll_spark.plans.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def _warm(it):
        import numpy as np
        import pandas  # noqa: F401
        from python_hll_spark.functions.murmur3 import murmur3_64
        from python_hll_spark.functions.hashing import splitmix64
        murmur3_64(["warm", "up"])
        splitmix64(np.arange(4, dtype=np.int64))
        for pdf in it:
            yield pdf

    spark.range(0, CPUS * 8, 1, CPUS).mapInPandas(_warm, "id long").count()
    for table in ["documents", "lineitem", "events", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{table}.parquet").count()
    warm_sf = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf):
        qs["hll_ndv_words_by_source"](spark, warm_sf).count()
        qs["minhash_dedup_documents"](spark, warm_sf).count()
    return spark, qs


def cmd_headline(reps: int = 3) -> None:
    spark, qs = _headline_session()
    out = {}
    for name in HEADLINE:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"headline:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
        print(f"# {name}: min {min(walls):.2f}s {walls}", file=sys.stderr)
    total = sum(v["min"] for v in out.values())
    print(json.dumps({"headline_min_total": round(total, 2), "queries": out}))
    spark.stop()


def cmd_plans(outdir: str, which: list[str] | None = None) -> None:
    import contextlib
    import io

    spark, qs = _headline_session()
    os.makedirs(outdir, exist_ok=True)
    for name in which or HEADLINE:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"# wrote {name} ({plan.count('Exchange')} Exchange refs)",
              file=sys.stderr)
    spark.stop()


def _seqs_subset(spark, n_docs: int = 2_000_000):
    from pyspark.sql import functions as F
    subset = f"{SEQS_CACHE}_sub{n_docs}"
    assert os.path.exists(os.path.join(subset, "_SUCCESS")), subset
    return spark.read.parquet(subset).select("doc_id", "tokens", "n_tok")


def cmd_lm_stages() -> None:
    from pyspark.sql import functions as F
    from python_hll_spark.plans.session import get_spark

    spark = get_spark("lm-stages", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    seqs = _seqs_subset(spark)
    seqs.count()  # warm page cache

    toks = F.col("tokens")
    nb = F.greatest(F.size(toks) - 1, F.lit(0))
    pack = lambda a, b: (F.shiftleft(a.cast("bigint"), 32)  # noqa: E731
                         + b.cast("bigint"))
    bigram_keys = F.zip_with(F.slice(toks, 1, nb), F.slice(toks, 2, nb), pack)
    uni_keys = F.transform(toks, lambda t: -(t.cast("bigint") + 1))

    spark.sparkContext.setJobDescription("lm: freq agg")
    t0 = time.time()
    freq = (seqs.select(F.explode(F.concat(uni_keys, bigram_keys)).alias("k"))
            .groupBy("k").agg(F.count("*").alias("cnt")).persist())
    n_keys = freq.count()
    t1 = time.time()
    print(f"# freq agg: {t1-t0:.2f}s ({n_keys:,} distinct keys)",
          file=sys.stderr)

    uni = freq.where(F.col("k") < 0)
    total = uni.agg(F.sum("cnt")).first()[0]
    u1 = uni.select(F.col("k").alias("__k1"), F.col("cnt").alias("__c_w1"))
    u2 = uni.select(F.col("k").alias("__k2"), F.col("cnt").alias("__c_w2"))
    lam = 0.7
    p = (F.lit(lam) * F.col("cnt") / F.col("__c_w1")
         + F.lit(1.0 - lam) * F.col("__c_w2") / F.lit(float(total or 1)))
    t2 = time.time()
    model = (freq.where(F.col("k") >= 0)
             .withColumn("__k1", -(F.shiftright("k", 32) + 1))
             .withColumn("__k2",
                         -(F.col("k").bitwiseAND(F.lit(4294967295)) + 1))
             .join(u1, "__k1").join(u2, "__k2")
             .select("k", F.col("cnt").alias("c_bigram"),
                     F.log10(p).alias("__lp"))
             .persist())
    n_model = model.count()
    t3 = time.time()
    print(f"# model build: {t3-t2:.2f}s ({n_model:,} bigrams; "
          f"uni-total scan {t2-t1:.2f}s)", file=sys.stderr)

    occ = seqs.select("doc_id", F.explode(bigram_keys).alias("k"))
    hot = model.orderBy(F.desc("c_bigram"), F.asc("k")).limit(262144)
    spark.sparkContext.setJobDescription("lm: scoring join")
    t4 = time.time()
    hot_scored = occ.join(F.broadcast(hot), "k")
    tail_scored = (occ.join(F.broadcast(hot.select("k")), "k", "left_anti")
                   .join(model, "k"))
    res = (hot_scored.unionByName(tail_scored)
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_bigrams"),
                F.sum("c_bigram").alias("sum_bigram_freq"),
                F.round(F.avg("__lp"), 6).alias("mean_log10_prob")))
    res.agg(F.sum("sum_bigram_freq"), F.sum("mean_log10_prob")).collect()
    t5 = time.time()
    print(f"# scoring pass: {t5-t4:.2f}s; TOTAL {t5-t0:.2f}s", file=sys.stderr)
    print(json.dumps({"freq_agg": round(t1-t0, 2),
                      "model": round(t3-t2, 2),
                      "scoring": round(t5-t4, 2),
                      "total": round(t5-t0, 2),
                      "n_keys": n_keys, "n_model": n_model}))
    spark.stop()


def cmd_aux_quick() -> None:
    from pyspark.sql import functions as F
    from python_hll_spark.plans.session import get_spark
    from python_hll_spark.functions.classifier import (
        classifier_scores_tokens, classifier_train_tokens)
    from python_hll_spark.operators.chunking import chunk_tokens
    from python_hll_spark.operators.dsir import (bucket_counts_tokens,
                                                 dsir_logratio,
                                                 dsir_weights_tokens)

    spark = get_spark("aux-quick", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    seqs = _seqs_subset(spark)
    seqs.count()

    def passthrough(batches):
        for b in batches:
            yield b
    spark.range(0, CPUS * 4, numPartitions=CPUS * 2) \
        .mapInArrow(passthrough, "id long").count()

    out = {}
    for name, fn in [
        ("classifier", lambda: classifier_scores_tokens(
            seqs, tokens_col="tokens", id_col="doc_id")
            .agg(F.sum("score")).collect()),
        ("chunk", lambda: chunk_tokens(seqs, 2048, 1536)
            .agg(F.sum(F.col("chunk_len").cast("bigint"))).collect()),
    ]:
        walls = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"aux:{name}")
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 2))
        out[name] = min(walls)
        print(f"# {name}: {walls}", file=sys.stderr)

    target = seqs.where(F.pmod(F.xxhash64("doc_id"), F.lit(16)) == 0)
    t0 = time.time()
    lr = dsir_logratio(bucket_counts_tokens(target),
                       bucket_counts_tokens(seqs)).persist()
    lr.count()
    out["dsir_model"] = round(time.time() - t0, 2)
    walls = []
    for _ in range(2):
        spark.sparkContext.setJobDescription("aux:dsir")
        t0 = time.time()
        dsir_weights_tokens(seqs, lr) \
            .agg(F.sum("dsir_weight"), F.sum("n_features")).collect()
        walls.append(round(time.time() - t0, 2))
    out["dsir_score"] = min(walls)
    lr.unpersist()
    print(f"# dsir: model {out['dsir_model']}s, score {walls}", file=sys.stderr)

    labeled = seqs.withColumn(
        "y", (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).cast("double"))
    spark.sparkContext.setJobDescription("aux:train")
    t0 = time.time()
    classifier_train_tokens(labeled, "y", iters=2)
    out["train_2iter"] = round(time.time() - t0, 2)
    print(f"# train: {out['train_2iter']}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def cmd_flagship(n_cores: int) -> None:
    from pyspark.sql import functions as F
    from python_hll_spark.operators.ndv import hll_ndv_tokens
    from python_hll_spark.plans.session import get_spark
    from python_hll_spark.sketches.hll import HLLConfig

    spark = get_spark(f"flag-{n_cores}", master=f"local[{n_cores}]",
                      shuffle_partitions=max(32, n_cores))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(SEQS_CACHE)
    n_tokens = df.agg(F.sum("n_tok")).collect()[0][0]

    def passthrough(batches):
        for b in batches:
            yield b
    spark.range(0, n_cores * 4, numPartitions=n_cores * 2) \
        .mapInArrow(passthrough, "id long").count()

    walls = []
    for _ in range(2):
        t0 = time.time()
        hll_ndv_tokens(df, by=["source"], cfg=HLLConfig.create(11, 5),
                       n_salts=max(16, n_cores)).collect()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)
    print(json.dumps({"cores": n_cores, "walls": walls,
                      "tokens_per_sec": int(n_tokens / wall)}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if cmd == "headline":
        cmd_headline(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif cmd == "plans":
        cmd_plans(sys.argv[2], sys.argv[3:] or None)
    elif cmd == "lm-stages":
        cmd_lm_stages()
    elif cmd == "aux-quick":
        cmd_aux_quick()
    elif cmd == "flagship":
        cmd_flagship(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
