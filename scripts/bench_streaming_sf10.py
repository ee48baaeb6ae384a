"""r14 verdict item 8: third streaming scale decade — run the silver
upsert + collapsing replays at sf10 (~30M envelope events, repo-local
fixture testdata_sf10) and print the BASELINE.md row inputs.  Reuses
bench.py's own harness functions so the measurement is identical to the
per-round artifact's."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from postgres_debezium_clickhouse_spark.session import get_spark  # noqa: E402

SF10 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "testdata_sf10")

def main():
    spark = get_spark("bench-streaming-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}", file=sys.stderr)
    out = {}
    for label, fn, passes in (("streaming_silver_upsert", bench._bench_streaming, 2),
                              ("streaming_collapsing", bench._bench_collapsing, 2)):
        print(f"  {label} @ {SF10}", file=sys.stderr)
        out[label] = fn(spark, SF10, passes=passes)
        print(label, out[label]["value"], "ev/s", out[label]["walls"], file=sys.stderr)
    print(json.dumps({"sf": 10, "loadavg": list(os.getloadavg()), **{
        k: {"value": v["value"], "n_events": v["n_events"], "walls": v["walls"],
            "rates": v["rates"]} for k, v in out.items()}}))
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
