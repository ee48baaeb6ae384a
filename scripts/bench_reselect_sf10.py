"""r16 verdict item 7 — FLOOR-grade sf10 evidence for
cdc_reselect_columns.

The r15 sf10 number (190.8 s) was a CEILING: it billed the checker's
23.75 M-row driver collect plus the DuckDB oracle to the query.  This
harness runs the query itself with a COUNT-style sink (no collect, no
oracle) — the same discipline the substring family's trust-scan floors
use — and reports wall, JVM+driver CPU, and effective cores per pass
(floor across passes is the number to record; the >=16 effective-core
gate is the substring family's).

Usage: python scripts/bench_reselect_sf10.py [sf_dir] [passes]
(default ./testdata_sf10, 3 passes + warmup)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import _find_jvm_pid, _jvm_cpu_s  # noqa: E402
from postgres_debezium_clickhouse_spark.plans.cdc_queries import (  # noqa: E402
    cdc_reselect_columns,
)
from postgres_debezium_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "testdata_sf10"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    jvm = _find_jvm_pid()
    n = cdc_reselect_columns(spark, sf_dir).count()      # warmup
    print(f"rows: {n}", flush=True)
    best = None
    for p in range(passes):
        load = os.getloadavg()[0]
        cpu0 = _jvm_cpu_s(jvm) + time.process_time()
        t0 = time.perf_counter()
        cdc_reselect_columns(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        cpu = (_jvm_cpu_s(jvm) + time.process_time()) - cpu0
        eff = cpu / wall
        print(f"pass {p} load {load:.1f} wall {wall:.2f}s "
              f"cpu {cpu:.1f}s eff_cores {eff:.1f}", flush=True)
        if best is None or wall < best[0]:
            best = (wall, cpu, eff)
    print(f"FLOOR wall {best[0]:.2f}s cpu {best[1]:.1f}s "
          f"eff_cores {best[2]:.1f}", flush=True)


if __name__ == "__main__":
    main()
