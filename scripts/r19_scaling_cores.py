"""r19 item 5: core-count scaling receipt at sf1 (VERDICT r18 item 5).

At sf0.1 every headline query is 0.3-2 s and dominated by fixed per-query
overhead, so the driver's 8c/32c ratios sit at ~1 and demonstrate nothing.
This script measures the r18/r19-optimized operators at sf1 (10x the bench
decade) at whatever $SPARK_GRAFT_CPUS says, so a wrapper can run it once
per core count (fresh JVM each) and the committed receipt shows the wall
ratio moving toward the core ratio once data dwarfs overhead.

Usage:
  SPARK_GRAFT_SF_DIR=$PWD/testdata_sf1 SPARK_GRAFT_CPUS=8 \
      python scripts/r19_scaling_cores.py
Prints one JSON line: {"cpus": N, "sf_dir": ..., "floors": {name: sec}}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from postgres_debezium_clickhouse_spark.session import get_spark

QUERIES = os.environ.get(
    "QS",
    "multimodal_pdf_meta,multimodal_exif_meta,text_5gram_kneser_ney,"
    "dedup_clusters,dedup_substring_removal,dedup_substring_spans").split(",")
REPS = int(os.environ.get("REPS", "3"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR")
assert SF, "set SPARK_GRAFT_SF_DIR (e.g. $PWD/testdata_sf1)"

spark = get_spark("r19-scaling-cores")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
spark.read.parquet(f"{SF}/region.parquet").count()

floors = {}
for name in QUERIES:
    walls = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"scaling: {name}")
        t0 = time.monotonic()
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
    floors[name] = min(walls)
    print(f"  {name}: {walls}", file=sys.stderr)
print(json.dumps({
    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    "sf_dir": SF, "reps": REPS, "floors": floors,
}))
