"""Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency N→4N).

Runs the IDENTICAL tier-rollup job on the IDENTICAL deterministic synthetic
web table at local[8] and local[32] (separate JVMs), reports rolled-up
points/sec at both and efficiency = (throughput_32 / throughput_8) / 4.
Writes BENCH/BASELINE.md.

Usage:
  python tools/scaling_bench.py            # orchestrate both runs
  python tools/scaling_bench.py --run 8    # single measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_URLS = int(os.environ.get("SCALING_N_URLS", "60000"))
CRAWLS = int(os.environ.get("SCALING_CRAWLS", "40"))
DAYS = int(os.environ.get("SCALING_DAYS", "45"))


def measured_run(cores: int) -> None:
    sys.path.insert(0, str(REPO))
    import pytimetk_spark as tk
    from pytimetk_spark.rollup.tiers import rollup_raw_to_tier, rollup_tier_to_tier
    from pytimetk_spark.sources.webpages import generate_webpages
    from pyspark.sql import functions as F

    spark = tk.get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
    )

    def chain(df):
        # ONE shuffle total: pre-partition by url — HashPartitioning(url)
        # satisfies ClusteredDistribution(url, bucket) for every tier agg,
        # so raw→1h→1d→7d is shuffle-free after it (Iceberg analogue:
        # bucket(N, url) table layout).
        pre = df.repartition(max(cores * 2, 16), F.col("url"))
        h1 = rollup_raw_to_tier(pre, "url", "warc_ts", F.length("text"), "h")
        d1 = rollup_tier_to_tier(h1, "D")
        d7 = rollup_tier_to_tier(d1, "7D")
        return h1, d1, d7

    # codegen/JIT warm-up on a miniature clone of the same plan
    small = generate_webpages(
        spark, n_urls=500, crawls_per_url=10, days=DAYS, n_domains=10, seed=7
    )
    for t in chain(small):
        t.write.format("noop").mode("overwrite").save()

    web = generate_webpages(
        spark, n_urls=N_URLS, crawls_per_url=CRAWLS, days=DAYS,
        n_domains=max(N_URLS // 50, 10), seed=42,
    )
    n_raw = web.count()

    t0 = time.time()
    h1, d1, d7 = chain(web)
    h1 = h1.cache()  # materialized once, as the tier write would be
    p1 = h1.count()
    d1 = d1.cache()
    p2 = d1.count()
    p3 = d7.count()
    elapsed = time.time() - t0
    points = p1 + p2 + p3
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "raw_rows": n_raw,
                "rolled_points": points,
                "elapsed_sec": round(elapsed, 3),
                "points_per_sec": round(points / elapsed, 1),
                "raw_rows_per_sec": round(n_raw / elapsed, 1),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--run", str(cores)],
            capture_output=True, text=True, cwd=str(REPO), timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"run at {cores} cores produced no RESULT")
        results[cores] = json.loads(line[-1][len("RESULT "):])
        print(line[-1])

    tp8 = results[8]["points_per_sec"]
    tp32 = results[32]["points_per_sec"]
    eff = (tp32 / tp8) / 4
    # raw-row throughput is the better proxy for the scan-bound regime
    rtp8 = results[8]["raw_rows_per_sec"]
    rtp32 = results[32]["raw_rows_per_sec"]
    reff = (rtp32 / rtp8) / 4

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE — two-cluster-size scaling evidence

North rule (BASELINE.json): ≥0.8 throughput scaling efficiency between N
and 4N executors. Sandbox protocol: identical tier-rollup job (raw →
1h → 1d → 7d, re-aggregable stats) on the identical deterministic synthetic
web table ({N_URLS} urls × {CRAWLS} crawls × {DAYS} days, seed 42;
{results[8]["raw_rows"]:,} raw rows after gap injection), run at local[8]
and local[32] in separate JVMs.

| parallelism | raw rows/sec | rolled points | rolled points/sec | elapsed |
|---|---|---|---|---|
| local[8]  | {rtp8:,.0f} | {results[8]["rolled_points"]:,} | {tp8:,.0f} | {results[8]["elapsed_sec"]} s |
| local[32] | {rtp32:,.0f} | {results[32]["rolled_points"]:,} | {tp32:,.0f} | {results[32]["elapsed_sec"]} s |

**Scaling efficiency (rolled points/sec): (tp32 / tp8) / 4 = {eff:.3f}**
**Scaling efficiency (raw rows/sec):     (tp32 / tp8) / 4 = {reff:.3f}**

Notes
- The job is shuffle-light by design: one partial+final hash aggregate on
  (url, hour) from raw, then two tiny tier→tier aggregates. Map-side
  combine means the shuffle carries tier cardinality, not raw rows.
- local[N] shares one JVM/driver; efficiencies here are bounded by shared
  memory bandwidth and the parquet-free generated source. On a real 4N
  cluster, scan and shuffle both scale with executors; the plan contains
  no single-point serialization (no driver collect, no global sort, no
  non-salted skewed key) that would cap it.
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps({"efficiency_points": round(eff, 3), "efficiency_raw": round(reff, 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        measured_run(int(sys.argv[2]))
    else:
        orchestrate()
