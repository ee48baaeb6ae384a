"""r19 item 2: fresh-JVM isolation floor for similarity_cosine_topk.

The only >10% driver-measured regression of r18 (0.471 -> 0.567) sits on
an UNTOUCHED code path (cosine_topk / bounded_query_topk — zero diff
fb355d0..HEAD).  VERDICT r18 asked for a fresh-JVM floor: if the
isolated floor matches the r17-era floor (~0.41 s) the bench delta is
shared-JVM adjacency noise; if it matches ~0.55 s something real moved.

Methodology (memory: bench-noise-discipline): fresh JVM, N reps to JIT
convergence, clearCache between reps, floor = min, CPU floor alongside.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from postgres_debezium_clickhouse_spark.session import get_spark

NAME = os.environ.get("Q", "similarity_cosine_topk")
REPS = int(os.environ.get("REPS", "10"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("r19-isolate")
spark.sparkContext.setLogLevel("ERROR")
fn = e.queries()[NAME]
spark.read.parquet(f"{SF}/region.parquet").count()  # warm footer caches

me = os.getpid()
jvm_pid = -1
for pid in os.listdir("/proc"):
    if pid.isdigit():
        try:
            parts = open(f"/proc/{pid}/stat").read().split()
            if parts[1] == "(java)" and int(parts[3]) == me:
                jvm_pid = int(pid)
        except OSError:
            pass
clk = os.sysconf("SC_CLK_TCK")


def cpu():
    parts = open(f"/proc/{jvm_pid}/stat").read().split()
    return (int(parts[13]) + int(parts[14])) / clk


walls, cpus = [], []
for i in range(REPS):
    spark.catalog.clearCache()
    c0, p0, t0 = cpu(), time.process_time(), time.monotonic()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    w = time.monotonic() - t0
    c = (cpu() - c0) + (time.process_time() - p0)
    walls.append(round(w, 3))
    cpus.append(round(c, 2))
print(f"{NAME} @ {SF}: walls={walls}")
print(f"{NAME} @ {SF}: cpus ={cpus}")
print(f"floor wall={min(walls)} cpu={min(cpus)} "
      f"(median wall={sorted(walls)[len(walls)//2]})")
