import shutil
import subprocess
import sys
import tempfile
import time

CODE = """
import time, sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
import pytimetk_spark as tk
from pytimetk_spark.rollup.tiers import rollup_raw_to_tier, rollup_tier_to_tier
from pyspark.sql import functions as F
cores = int(sys.argv[1]); src = sys.argv[2]
spark = tk.get_spark(app_name=f"s{cores}", master=f"local[{cores}]", shuffle_partitions=cores*2)
web = spark.read.parquet(src)
n = web.count()
tmp = tempfile.mkdtemp()
def job():
    pre = web.select("url","warc_ts",F.length("text").alias("plen")).repartition(cores*2, F.col("url"))
    h1 = rollup_raw_to_tier(pre, "url", "warc_ts", "plen", "h")
    h1.write.mode("overwrite").parquet(f"{tmp}/h1")
    h1r = spark.read.parquet(f"{tmp}/h1")
    d1 = rollup_tier_to_tier(h1r, "D")
    d1.write.mode("overwrite").parquet(f"{tmp}/d1")
    d1r = spark.read.parquet(f"{tmp}/d1")
    rollup_tier_to_tier(d1r, "7D").write.mode("overwrite").parquet(f"{tmp}/d7")
    return h1r.count() + d1r.count() + spark.read.parquet(f"{tmp}/d7").count()
job()
t0=time.time(); points=job(); el=time.time()-t0
print(f"cores={cores} elapsed={el:.2f} points={points} pps={points/el:,.0f} raw_rps={n/el:,.0f}")
shutil.rmtree(tmp); spark.stop()
"""

import os

env = {**os.environ, "SPARK_DRIVER_MEMORY": "48g"}
for c in (8, 32):
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", CODE, str(c), "/tmp/webpages_src"],
        capture_output=True, text=True, env=env, timeout=560,
    )
    for line in r.stdout.splitlines():
        if line.startswith("cores"):
            print(line, f"(wall {time.time()-t0:.0f}s)")
    if r.returncode != 0:
        print("STDERR:", r.stderr[-1500:])
