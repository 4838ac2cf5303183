"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "points_per_sec": ...}

Each query is forced end-to-end with a noop sink (full computation, no
collect/driver cost). The two-cluster-size scaling evidence (local[8] vs
local[32]) lives in tools/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytimetk_spark as tk
from pytimetk_spark.rollup.tiers import (
    derived_stats,
    encode_tier_blocks,
    gap_fill_tier,
    rollup_raw_to_tier,
    rollup_tier_to_tier,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    def q_rollup_chain():
        h1 = rollup_raw_to_tier(ev, "event_type", "ts", "value", "h")
        d1 = rollup_tier_to_tier(h1, "D")
        d7 = rollup_tier_to_tier(d1, "7D")
        _force(derived_stats(h1))
        _force(d1)
        _force(d7)

    return {
        "summarize_hourly": lambda: _force(
            tk.summarize_by_time(
                ev, "ts", "value", group_cols=["event_type"], freq="h",
                agg_func=["sum", "mean", "count"], dense=False, fillna=None,
            )
        ),
        "summarize_daily_lineitem": lambda: _force(
            tk.summarize_by_time(
                li, "l_shipdate", ["l_quantity", "l_extendedprice"],
                group_cols=["l_returnflag"], freq="D",
                agg_func=["sum", "mean"], dense=False, fillna=None,
            )
        ),
        "rollup_tier_chain_1h_1d_7d": q_rollup_chain,
        "gap_fill_tier_1h": lambda: _force(
            gap_fill_tier(
                rollup_raw_to_tier(ev, "user_id", "ts", "value", "h"), "h"
            )
        ),
        "pad_by_time_hourly": lambda: _force(
            tk.pad_by_time(
                ev.select("event_type", "ts", "value"), "ts", freq="h",
                group_cols=["event_type"],
            )
        ),
        "augment_rolling_multi": lambda: _force(
            tk.augment_rolling(
                ev.select("user_id", "ts", "value"), "ts", "value",
                window=[5, 20], window_func=["mean", "sum", "min", "max", "std"],
                group_cols=["user_id"],
            )
        ),
        "augment_shift_stack": lambda: _force(
            tk.augment_diffs(
                tk.augment_lags(
                    ev.select("user_id", "ts", "value"), "ts", "value",
                    lags=[1, 2, 3], group_cols=["user_id"],
                ),
                "ts", "value", periods=1, group_cols=["user_id"],
            )
        ),
        "timeseries_signature": lambda: _force(
            tk.augment_timeseries_signature(
                li.select("l_orderkey", "l_shipdate"), "l_shipdate"
            )
        ),
        "gorilla_encode_tier": lambda: _force(
            encode_tier_blocks(
                rollup_raw_to_tier(ev, "user_id", "ts", "value", "h"),
                ["cnt", "vsum", "vmin", "vmax"],
            )
        ),
    }


def webtext_queries(spark, web):
    """Curation-suite headline queries (VERDICT r5 ask #7) over the same
    deterministic 60k-url web table the tier job uses: exact dedup on the
    full crawl (~2M rows), MinHash near-dup dedup / Gopher repetition
    signals / BPE encode on the 60k distinct documents (the
    post-exact-dedup shape those stages consume in the pipeline job)."""
    from pytimetk_spark.webtext.bpe import bpe_encode, bpe_train
    from pytimetk_spark.webtext.dedup import (
        dedup_exact,
        minhash_dedup,
        release_minhash_cache,
    )
    from pytimetk_spark.webtext.textstats import repetition_signals

    work = "/dev/shm" if os.path.isdir("/dev/shm") else None
    import tempfile

    docs_src = f"{work or tempfile.gettempdir()}/bench_webdocs_60k"
    if not os.path.exists(f"{docs_src}/_SUCCESS"):
        (web.select("url", "text").distinct()
         .withColumn("doc_id", F.abs(F.xxhash64("url")))
         .write.mode("overwrite").parquet(docs_src))
    docs = spark.read.parquet(docs_src)
    crawl = web.withColumn("doc_id", F.monotonically_increasing_id())
    # model fit ONCE outside the timed region: bpe_train is a bounded
    # seeded-sample driver fit (a train step, not a per-run query cost);
    # the timed query is the distributed full-corpus encode
    merges = bpe_train(docs, "text", n_merges=200, fit_sample=20_000)

    def q_minhash():
        r = minhash_dedup(docs, "text", "doc_id")
        _force(r)
        release_minhash_cache(r)

    def q_ngram_lm():
        # fit + score are ONE unit: the LM is corpus-derived each run
        # (fit = one explode+groupBy; scoring = one broadcast join)
        from pytimetk_spark.webtext.lm import fit_ngram_lm, score_perplexity

        model = fit_ngram_lm(docs, "text", n=3, min_count=2)
        _force(score_perplexity(docs, model, n=3, id_col="doc_id"))

    def q_dsir():
        from pytimetk_spark.webtext.sampling import dsir_select

        _force(dsir_select(
            docs, docs.filter(F.col("doc_id") % 10 == 0), k=1000,
            n_buckets=65_536, seed=1,
        ))

    return {
        "webtext_dedup_exact": lambda: _force(
            dedup_exact(crawl, "text", "doc_id")
        ),
        "webtext_minhash_dedup": q_minhash,
        "webtext_repetition_signals": lambda: _force(
            repetition_signals(docs, "text", "doc_id")
        ),
        "webtext_bpe_encode": lambda: _force(
            bpe_encode(docs, merges, "text", "doc_id")
        ),
        "webtext_ngram_lm_ppl": q_ngram_lm,
        "webtext_dsir_select": q_dsir,
    }


def main():
    spark = tk.get_spark(app_name="pytimetk_spark-bench", master=f"local[{CPUS}]")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.count()  # warm up session/scan

    timings = {}
    for name, fn in bench_queries(spark).items():
        fn()  # warm-up run (plan compile + shuffle files)
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 4)

    # north-rule metric: rolled-up points/sec across the tier chain over a
    # web-scale-shaped table (events at sf0.1 is too small — fixed overhead
    # dominates). Deterministic synthetic web table, cached across runs.
    import tempfile

    from pytimetk_spark.sources.webpages import generate_webpages

    work = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    src = f"{work}/bench_webpages_60k"
    if not os.path.exists(f"{src}/_SUCCESS"):
        generate_webpages(
            spark, n_urls=60_000, crawls_per_url=40, days=45,
            n_domains=1200, seed=42,
        ).write.mode("overwrite").parquet(src)
    web = spark.read.parquet(src)

    # curation-suite headline queries (same warm-up + single-timed protocol;
    # NOTE: their addition is a one-time headline-total discontinuity vs
    # rounds <= 5 — see BENCH/BASELINE.md)
    for name, fn in webtext_queries(spark, web).items():
        fn()
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 4)

    pre = web.select("url", "warc_ts", F.length("text").alias("plen")).repartition(
        int(CPUS) * 2, F.col("url")
    )
    tier_dir = tempfile.mkdtemp(dir=work)
    def tier_job():
        h1 = rollup_raw_to_tier(pre, "url", "warc_ts", "plen", "h")
        h1.write.mode("overwrite").parquet(f"{tier_dir}/h1")
        d1 = rollup_tier_to_tier(spark.read.parquet(f"{tier_dir}/h1"), "D")
        d1.write.mode("overwrite").parquet(f"{tier_dir}/d1")
        rollup_tier_to_tier(spark.read.parquet(f"{tier_dir}/d1"), "7D").write.mode(
            "overwrite"
        ).parquet(f"{tier_dir}/d7")

    tier_job()  # warm-up
    # median of n>=3 measured iterations: single-shot readings on a shared
    # host swung ±16% round-over-round (r2 959k vs r3 808k pts/s at flat
    # wall time) — the median is the reported number, min/max recorded
    tier_runs = []
    for _ in range(3):
        t0 = time.time()
        tier_job()
        tier_runs.append(time.time() - t0)
    tier_elapsed = sorted(tier_runs)[len(tier_runs) // 2]
    points = sum(
        spark.read.parquet(f"{tier_dir}/{t}").count() for t in ("h1", "d1", "d7")
    )
    pps = points / tier_elapsed if tier_elapsed > 0 else 0.0
    import shutil

    shutil.rmtree(tier_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "points_per_sec": round(pps, 1),
                "tier_runs_sec": [round(t, 4) for t in sorted(tier_runs)],
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
