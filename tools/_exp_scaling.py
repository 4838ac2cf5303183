"""Experiment: which component anti-scales 8→32 threads in one JVM."""
import json
import os
import subprocess
import sys
import time

CODE = """
import time, sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
import pytimetk_spark as tk
from pytimetk_spark.rollup.tiers import rollup_raw_to_tier, rollup_tier_to_tier
from pyspark.sql import functions as F
cores = int(sys.argv[1]); variant = sys.argv[2]
extra = {}
if variant == "parallelgc":
    extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
spark = tk.get_spark(app_name=f"x{cores}", master=f"local[{cores}]",
                     shuffle_partitions=cores*2, extra_conf=extra)
src = "/tmp/webpages_src_150000_40_45"
web = spark.read.parquet(src)
tmp = tempfile.mkdtemp()

if variant in ("strkey", "parallelgc"):
    base = web.select("url", "warc_ts", F.length("text").alias("plen"))
    key = "url"
elif variant == "longkey":
    base = web.select(F.xxhash64("url").alias("uid"), "warc_ts", F.length("text").alias("plen"))
    key = "uid"
elif variant == "narrow":
    narrow_path = "/tmp/webpages_narrow"
    if cores == 8:
        web.select(F.xxhash64("url").alias("uid"), "warc_ts",
                   F.length("text").alias("plen")).write.mode("overwrite").parquet(narrow_path)
    base = spark.read.parquet(narrow_path)
    key = "uid"

def job():
    pre = base.repartition(cores*2, F.col(key))
    h1 = rollup_raw_to_tier(pre, key, "warc_ts", "plen", "h")
    h1.write.mode("overwrite").parquet(f"{tmp}/h1")
    h1r = spark.read.parquet(f"{tmp}/h1")
    d1 = rollup_tier_to_tier(h1r, "D")
    d1.write.mode("overwrite").parquet(f"{tmp}/d1")
    d1r = spark.read.parquet(f"{tmp}/d1")
    rollup_tier_to_tier(d1r, "7D").write.mode("overwrite").parquet(f"{tmp}/d7")
    return h1r.count() + d1r.count() + spark.read.parquet(f"{tmp}/d7").count()

job()
best = None
for _ in range(2):
    t0 = time.time(); points = job(); el = time.time() - t0
    best = el if best is None else min(best, el)
print(f"EXP cores={cores} variant={variant} best={best:.2f} pps={points/best:,.0f}")
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
"""

env = {**os.environ, "SPARK_DRIVER_MEMORY": "48g"}
for variant in ("strkey", "longkey", "narrow", "parallelgc"):
    for cores in (8, 32):
        r = subprocess.run([sys.executable, "-c", CODE, str(cores), variant],
                           capture_output=True, text=True, env=env, timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("EXP"):
                print(line)
        if r.returncode != 0:
            print(variant, cores, "FAILED", r.stderr[-500:])
