"""Fifth-decade scale evidence for the CDC flagship family (r14 verdict
item 7): run ``cdc_current_state`` and ``star_join_revenue`` at sf10 —
three decades above the driver fixture — and report wall / JVM+driver
CPU / effective cores per query.

Convention (BASELINE.md): the wire-log FIRST TOUCH (the one-time
synthesize-and-persist of the ~34M-event orders topic) is billed
separately — it models Debezium/Kafka producing the topic, which no
consumer query pays for.  Each query then runs ``passes`` times against
the warm log; the FLOOR is reported (ambient-load spikes only ever slow
a run down).

PASS bar, matching the substring family's sf10 runs: effective cores
≥ 16 on the flagship (the collapse mode this guards against is a
single-partition parse or merge — ≤ 2 effective cores), and
star_join_revenue's broadcast lattice staying CPU-flat (its wall is
scan-bound; the red flag would be CPU growing with the dimension
product).

Usage: python scripts/bench_cdc_sf10.py [sf_dir] [passes]
(default testdata_sf10, falls back to testdata_sf1; passes=3)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from postgres_debezium_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else None
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if sf_dir is None:
        for cand in ("testdata_sf10", "testdata_sf1"):
            p = os.path.join(_REPO, cand)
            if os.path.isdir(p):
                sf_dir = p
                break
    if sf_dir is None or not os.path.isdir(sf_dir):
        print("no fixture dir (run scripts/gen_testdata.py 10 "
              "testdata_sf10 first)", file=sys.stderr)
        return 2

    spark = get_spark("bench-cdc-sf10")
    spark.sparkContext.setLogLevel("ERROR")

    import bench  # JVM-CPU measurement helpers

    from postgres_debezium_clickhouse_spark.plans import analytics, cdc_queries
    from postgres_debezium_clickhouse_spark.sources.cdc import orders_cdc_events

    jvm_pid = bench._find_jvm_pid()
    have_cpu = jvm_pid > 0 and bench._jvm_cpu_s(jvm_pid) >= 0

    # first touch: materialize the wire log once, billed separately
    t0 = time.monotonic()
    cpu0 = (bench._jvm_cpu_s(jvm_pid) if have_cpu else 0.0) + time.process_time()
    n_events = orders_cdc_events(spark, sf_dir).count()
    first_touch = {
        "wall_s": round(time.monotonic() - t0, 2),
        "cpu_s": round((bench._jvm_cpu_s(jvm_pid) if have_cpu else 0.0)
                       + time.process_time() - cpu0, 1),
        "n_events": n_events,
    }
    print(f"  wire-log first touch: {first_touch['wall_s']}s wall, "
          f"{first_touch['cpu_s']}s CPU, {n_events} events",
          file=sys.stderr)

    results = {}
    for name, fn in (
        ("cdc_current_state",
         lambda: cdc_queries.cdc_current_state(spark, sf_dir)),
        ("star_join_revenue",
         lambda: analytics.star_join_revenue(spark, sf_dir)),
    ):
        best = None
        for i in range(passes):
            cpu0 = (bench._jvm_cpu_s(jvm_pid) if have_cpu else 0.0) \
                + time.process_time()
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            cpu = (bench._jvm_cpu_s(jvm_pid) if have_cpu else 0.0) \
                + time.process_time() - cpu0
            eff = round(cpu / wall, 1) if wall else None
            rec = {"wall_s": round(wall, 2), "cpu_s": round(cpu, 1),
                   "effective_cores": eff}
            print(f"  {name} pass {i + 1}: {rec}", file=sys.stderr)
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        results[name] = best

    flag_eff = results["cdc_current_state"]["effective_cores"]
    verdict = flag_eff is not None and flag_eff >= 16
    print(json.dumps({
        "metric": "cdc_sf10_scale",
        "sf_dir": os.path.basename(sf_dir.rstrip("/")),
        "first_touch": first_touch,
        "queries": results,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "pass": verdict,
    }))
    return 0 if verdict else 1


if __name__ == "__main__":
    raise SystemExit(main())
