"""r19 probe: verify pin-able plan signatures live (dev tool, not a test).

Checks the r18 structural wins' plan shapes at sf0.001 so the r19 pin
tests assert exactly what holds today:
  - single from_json at the 5 filtered-parse barrier sites
  - ReusedExchange in the executed LM-ladder plans (tiny corpus)
  - single interpreted argmin in the IVF plans
Also dumps the formatted before-plans of the 5 exchange-count outliers
to plans/r19/<q>_before.txt.
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from postgres_debezium_clickhouse_spark.session import get_spark

spark = get_spark("r19-probe")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
qs = e.queries()


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---- 1. from_json counts at the barrier-site queries (static plans)
for name in ("cdc_json_extract_path", "cdc_timezone_convert",
             "trn_passport_current", "trn_passport_ts_version",
             "cdc_current_state"):
    p = fmt(qs[name](spark, sf))
    head = p.split("\n\n", 1)[0]
    print(f"{name}: from_json x{p.count('from_json')} "
          f"(head exchanges {len(re.findall(chr(92)+'bExchange', head))})")

# ---- 2. LM ladder: ReusedExchange in executed plan on a tiny corpus
from pyspark.sql import functions as F  # noqa: E402

train = spark.createDataFrame(
    [(0, "a b c d e a b c d f a b c e d b c d e f"),
     (2, "c d e f a b d e f a c d e a b")],
    "doc_id long, text string")
score = spark.createDataFrame([(100, "a b c d e")], "doc_id long, text string")
from postgres_debezium_clickhouse_spark.operators.text import (  # noqa: E402
    lm_5gram_kneser_ney, lm_bigram_kneser_ney)

for fn in (lm_bigram_kneser_ney, lm_5gram_kneser_ney):
    t0 = time.time()
    df = fn(score, train_docs=train)
    df.collect()
    plan = executed(df)
    print(f"{fn.__name__}: ReusedExchange x{plan.count('ReusedExchange')} "
          f"isFinal={'isFinalPlan=true' in plan} ({time.time()-t0:.1f}s)")

# ---- 3. IVF argmin single-eval signature
for name in ("similarity_ann_ivf_topk", "similarity_ann_ivf_table"):
    p = fmt(qs[name](spark, sf))
    # the duplication puts the interpreted argmin inside a Filter node:
    # look for zip_with in any Filter detail block
    blocks = p.split("\n\n")
    filt_zip = sum(b.count("zip_with") for b in blocks
                   if b.startswith("(") and "Filter" in b.split("\n")[0])
    print(f"{name}: zip_with total x{p.count('zip_with')}, "
          f"in-Filter-blocks x{filt_zip}")

# ---- 4. before-plans for the 5 outliers
os.makedirs("plans/r19", exist_ok=True)
for name in ("events_window_funnel_dedup", "similarity_ivf_seeding",
              "similarity_ivfpq_rerank_recall", "corpus_source_overlap",
              "llm_quality_funnel"):
    t0 = time.time()
    df = qs[name](spark, sf)
    p = fmt(df)
    with open(f"plans/r19/{name}_before.txt", "w") as f:
        f.write(p)
    head = p.split("\n\n", 1)[0]
    print(f"{name}: {len(re.findall(chr(92)+'bExchange', head))} exchanges, "
          f"build {time.time()-t0:.1f}s -> plans/r19/{name}_before.txt")
print("probe done")
