"""r16 verdict item 6 — quiet-window adjudication of the two r15 driver
2x-crossers: dedup_clusters (3.18 s driver vs 1.52 sf0.1 baseline) and
dedup_minhash_lsh (1.36 vs 0.67).  The r15 run was flagged
ambient_load_exceeded (loadavg 3.15, every query uniformly ~1.35x);
protocol = the r8/r9 adjudications: ONE process, interleaved passes at
sf0.1, wall + JVM+py CPU per observation, loadavg per pass, judge by
the FLOOR.

Usage: python scripts/adjudicate_dedup_r16.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _find_jvm_pid, _jvm_cpu_s  # noqa: E402
from postgres_debezium_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    jvm = _find_jvm_pid()
    q = entrymod.queries()
    watch = {
        "dedup_clusters": q["dedup_clusters"],
        "dedup_minhash_lsh": q["dedup_minhash_lsh"],
    }
    for fn in watch.values():
        fn(spark, sf_dir).count()          # warm caches once
    obs: dict[str, list[tuple[float, float]]] = {k: [] for k in watch}
    for p in range(passes):
        load = os.getloadavg()[0]
        for name, fn in watch.items():
            cpu0 = _jvm_cpu_s(jvm) + time.process_time()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            cpu = (_jvm_cpu_s(jvm) + time.process_time()) - cpu0
            obs[name].append((wall, cpu))
            print(f"pass {p} load {load:.1f} {name:18s} "
                  f"wall {wall:6.2f}s cpu {cpu:6.2f}s", flush=True)
        time.sleep(2)
    for name, o in obs.items():
        walls = sorted(w for w, _ in o)
        cpus = sorted(c for _, c in o)
        print(f"{name:18s} wall floor {walls[0]:.2f}s "
              f"(spread {walls[0]:.2f}-{walls[-1]:.2f}) "
              f"cpu floor {cpus[0]:.1f}s (spread {cpus[0]:.1f}-{cpus[-1]:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
