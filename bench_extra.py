"""Phase-isolating benchmark + plan dumper (guide §1.4/§7.2).

NOT the driver-timed bench (bench.py is frozen); this file exists so each
headline query — and the expensive *phases* inside the composite ones —
can be timed in isolation with the noop sink and its ``explain("formatted")``
captured to ``plans/r07/``.

Usage:
  python bench_extra.py                        # time everything, print JSON
  python bench_extra.py --only lm_fit,lm_score # subset
  python bench_extra.py --plans plans/r07 --suffix before   # also dump plans
  python bench_extra.py --repeats 3            # median-of-n (default 1 timed
                                               # run after 1 warm-up)
"""

from __future__ import annotations

import argparse
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


def build_targets(spark):
    """name -> zero-arg fn returning the DataFrame to force (or a callable
    that runs a composite and returns None)."""
    import tempfile

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    from pytimetk_spark.sources.webpages import generate_webpages

    work = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    src = f"{work}/bench_webpages_60k"
    if not os.path.exists(f"{src}/_SUCCESS"):
        generate_webpages(
            spark, n_urls=60_000, crawls_per_url=40, days=45,
            n_domains=1200, seed=42,
        ).write.mode("overwrite").parquet(src)
    web = spark.read.parquet(src)
    docs_src = f"{work}/bench_webdocs_60k"
    if not os.path.exists(f"{docs_src}/_SUCCESS"):
        (web.select("url", "text").distinct()
         .withColumn("doc_id", F.abs(F.xxhash64("url")))
         .write.mode("overwrite").parquet(docs_src))
    docs = spark.read.parquet(docs_src)
    crawl = web.withColumn("doc_id", F.monotonically_increasing_id())

    from pytimetk_spark.webtext.bpe import bpe_encode, bpe_train
    from pytimetk_spark.webtext.dedup import (
        dedup_exact,
        minhash_dedup,
        minhash_lsh_candidates,
        minhash_signatures,
        release_minhash_cache,
    )
    from pytimetk_spark.webtext.lm import fit_ngram_lm, score_perplexity
    from pytimetk_spark.webtext.sampling import dsir_select, hashed_ngram_features
    from pytimetk_spark.webtext.textstats import repetition_signals

    targets = {}

    # --- headline queries exactly as bench.py composes them -------------
    targets["summarize_hourly"] = lambda: tk.summarize_by_time(
        ev, "ts", "value", group_cols=["event_type"], freq="h",
        agg_func=["sum", "mean", "count"], dense=False, fillna=None,
    )
    targets["summarize_daily_lineitem"] = lambda: tk.summarize_by_time(
        li, "l_shipdate", ["l_quantity", "l_extendedprice"],
        group_cols=["l_returnflag"], freq="D",
        agg_func=["sum", "mean"], dense=False, fillna=None,
    )

    def q_rollup_chain():
        h1 = rollup_raw_to_tier(ev, "event_type", "ts", "value", "h")
        d1 = rollup_tier_to_tier(h1, "D")
        d7 = rollup_tier_to_tier(d1, "7D")
        _force(derived_stats(h1))
        _force(d1)
        _force(d7)

    targets["rollup_tier_chain_1h_1d_7d"] = q_rollup_chain
    targets["gap_fill_tier_1h"] = lambda: gap_fill_tier(
        rollup_raw_to_tier(ev, "user_id", "ts", "value", "h"), "h"
    )
    targets["pad_by_time_hourly"] = lambda: tk.pad_by_time(
        ev.select("event_type", "ts", "value"), "ts", freq="h",
        group_cols=["event_type"],
    )
    targets["augment_rolling_multi"] = lambda: tk.augment_rolling(
        ev.select("user_id", "ts", "value"), "ts", "value",
        window=[5, 20], window_func=["mean", "sum", "min", "max", "std"],
        group_cols=["user_id"],
    )
    targets["augment_shift_stack"] = lambda: tk.augment_diffs(
        tk.augment_lags(
            ev.select("user_id", "ts", "value"), "ts", "value",
            lags=[1, 2, 3], group_cols=["user_id"],
        ),
        "ts", "value", periods=1, group_cols=["user_id"],
    )
    targets["timeseries_signature"] = lambda: tk.augment_timeseries_signature(
        li.select("l_orderkey", "l_shipdate"), "l_shipdate"
    )
    targets["gorilla_encode_tier"] = lambda: encode_tier_blocks(
        rollup_raw_to_tier(ev, "user_id", "ts", "value", "h"),
        ["cnt", "vsum", "vmin", "vmax"],
    )

    # --- webtext queries + phases ---------------------------------------
    targets["webtext_dedup_exact"] = lambda: dedup_exact(crawl, "text", "doc_id")

    def q_minhash():
        r = minhash_dedup(docs, "text", "doc_id")
        _force(r)
        release_minhash_cache(r)

    targets["webtext_minhash_dedup"] = q_minhash
    targets["minhash_sigs_only"] = lambda: minhash_signatures(
        docs, "text", "doc_id", 64, 5
    )

    def q_minhash_cands():
        sigs = minhash_signatures(docs, "text", "doc_id", 64, 5)
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        _force(minhash_lsh_candidates(sigs, "doc_id", 16, 4))
        sigs.unpersist()

    targets["minhash_cands_only"] = q_minhash_cands

    targets["webtext_repetition_signals"] = lambda: repetition_signals(
        docs, "text", "doc_id"
    )

    merges = bpe_train(docs, "text", n_merges=200, fit_sample=20_000)
    targets["webtext_bpe_encode"] = lambda: bpe_encode(
        docs, merges, "text", "doc_id"
    )

    def q_ngram_lm():
        model = fit_ngram_lm(docs, "text", n=3, min_count=2)
        _force(score_perplexity(docs, model, n=3, id_col="doc_id"))

    targets["webtext_ngram_lm_ppl"] = q_ngram_lm
    targets["lm_fit"] = lambda: fit_ngram_lm(docs, "text", n=3, min_count=2)

    _model_cache = {}

    def q_lm_score():
        if "m" not in _model_cache:
            m = fit_ngram_lm(docs, "text", n=3, min_count=2)
            m = m.persist()
            m.count()
            _model_cache["m"] = m
        _force(score_perplexity(docs, _model_cache["m"], n=3, id_col="doc_id"))

    targets["lm_score"] = q_lm_score

    def q_dsir():
        _force(dsir_select(
            docs, docs.filter(F.col("doc_id") % 10 == 0), k=1000,
            n_buckets=65_536, seed=1,
        ))

    targets["webtext_dsir_select"] = q_dsir
    targets["dsir_feats_only"] = lambda: hashed_ngram_features(
        docs, "text", "doc_id", 65_536, 2
    )
    return targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    spark = tk.get_spark(
        app_name="pytimetk_spark-bench-extra", master=f"local[{CPUS}]"
    )
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    targets = build_targets(spark)
    if args.only:
        keep = [s.strip() for s in args.only.split(",")]
        targets = {k: v for k, v in targets.items() if k in keep}

    timings = {}
    for name, fn in targets.items():
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        res = fn()
        is_df = res is not None
        if args.plans and is_df:
            os.makedirs(args.plans, exist_ok=True)
            plan = res._sc._jvm.PythonSQLUtils.explainString(
                res._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        runs = []
        if not args.no_warmup:
            _force(fn()) if is_df else fn()  # warm-up
        for _ in range(args.repeats):
            t0 = time.time()
            _force(fn()) if is_df else fn()
            runs.append(time.time() - t0)
        timings[name] = {
            "median": round(sorted(runs)[len(runs) // 2], 4),
            "runs": [round(r, 4) for r in runs],
        }
        print(f"{name}: {timings[name]['median']}s {timings[name]['runs']}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({k: v["median"] for k, v in timings.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
