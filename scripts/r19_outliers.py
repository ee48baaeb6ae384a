"""r19 item 1: measure the five exchange-count outlier queries.

For each query: run it (noop sink) REPS times at $SPARK_GRAFT_SF_DIR,
record wall/CPU floors, and dump the EXECUTED plan (where AQE exchange
reuse is visible — the formatted pre-execution plan shows every Exchange
separately even when runtime reuse fires, so counting it overstates the
executed shuffle work).  Methodology: bench-noise discipline — fresh JVM
per script run, floor = min over reps, clearCache between reps.

Usage: [QS=a,b,c] [REPS=3] [OUT=plans/r19] [SUFFIX=_executed_before]
       python scripts/r19_outliers.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from postgres_debezium_clickhouse_spark.session import get_spark

OUTLIERS = os.environ.get(
    "QS",
    "events_window_funnel_dedup,similarity_ivf_seeding,"
    "similarity_ivfpq_rerank_recall,corpus_source_overlap,"
    "llm_quality_funnel").split(",")
REPS = int(os.environ.get("REPS", "3"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT", "plans/r19")
SUFFIX = os.environ.get("SUFFIX", "_executed_before")

spark = get_spark("r19-outliers")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
spark.read.parquet(f"{SF}/region.parquet").count()  # warm JVM/footers

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


os.makedirs(OUT, exist_ok=True)
for name in OUTLIERS:
    walls, cpus = [], []
    df = None
    for _ in range(REPS):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"outlier: {name}")
        c0, p0, t0 = cpu(), time.process_time(), time.monotonic()
        df = qs[name](spark, SF)
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
        cpus.append(round((cpu() - c0) + (time.process_time() - p0), 2))
    # the noop write executes its OWN QueryExecution — to see runtime AQE
    # decisions (ReusedExchange, AQEShuffleRead) the df's own execution
    # must run: collect() it (every outlier returns a tiny result)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    path = f"{OUT}/{name}{SUFFIX}.txt"
    with open(path, "w") as f:
        f.write(plan)
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_re = plan.count("ReusedExchange")
    n_scan = plan.count("Scan parquet")
    print(f"{name}: wall_floor={min(walls)} cpu_floor={min(cpus)} "
          f"walls={walls} cpus={cpus}")
    print(f"  executed: Exchange x{n_ex} ReusedExchange x{n_re} "
          f"Scan parquet x{n_scan} -> {path}")
print("done")
