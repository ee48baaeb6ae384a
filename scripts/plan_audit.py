import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import json, re, time, traceback
import __spark_entry__ as e
from postgres_debezium_clickhouse_spark.session import get_spark

spark = get_spark('plan-audit'); spark.sparkContext.setLogLevel('ERROR')
# scale path as CLI arg (ADVICE r18); smallest default — staged/stream
# queries run fastest there.  NOTE (r19): these are PRE-execution
# formatted plans — with AQE the runtime exchange reuse is invisible
# here, so exchange counts OVERSTATE executed shuffles (measured r19:
# corpus_source_overlap audits at 12 but executes 1 corpus scan + 4
# ReusedExchange).  Use scripts/r19_outliers.py-style collected
# executed plans before acting on a count.
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
qs = e.queries()
out = {}
t_start = time.time()
for i, (name, fn) in enumerate(sorted(qs.items())):
    t0 = time.time()
    try:
        df = fn(spark, sf)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), 'formatted')
        head = p.split('\n\n', 1)[0]
        rec = {
            "exchange": len(re.findall(r'\bExchange\b', head)),
            "bcast": len(re.findall(r'BroadcastExchange', head)),
            "smj": len(re.findall(r'SortMergeJoin', head)),
            "shj": len(re.findall(r'ShuffledHashJoin', head)),
            "bnlj": len(re.findall(r'BroadcastNestedLoopJoin', head)),
            "cartesian": len(re.findall(r'CartesianProduct', head)),
            "batcheval": len(re.findall(r'BatchEvalPython', head)),
            "arroweval": len(re.findall(r'ArrowEvalPython', head)),
            "mapinpandas": len(re.findall(r'MapInPandas|ArrowEvalPythonUDTF|FlatMapGroupsInPandas|MapInArrow', head)),
            "generate": len(re.findall(r'\bGenerate\b', head)),
            "window": len(re.findall(r'\bWindow\b', head)),
            "sortagg": len(re.findall(r'SortAggregate', head)),
            "build_s": round(time.time() - t0, 1),
        }
        out[name] = rec
    except Exception as ex:
        out[name] = {"error": f"{type(ex).__name__}: {ex}"[:200], "build_s": round(time.time() - t0, 1)}
    if i % 25 == 0:
        print(f"{i}/{len(qs)} {name} ({time.time()-t_start:.0f}s)", flush=True)
json.dump(out, open('plans/r18/PLAN_AUDIT.json', 'w'), indent=1)
errs = {k: v for k, v in out.items() if 'error' in v}
print("done", len(out), "errors", len(errs))
for k, v in errs.items(): print("ERR", k, v["error"])
