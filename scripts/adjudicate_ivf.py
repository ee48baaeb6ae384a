"""r9 verdict item 6 — adjudicate the similarity_ann_ivf_topk CPU drift
(driver r7 3.5 → r8 4.5 CPU-s; recorded quiet floor 3.7).

Protocol = the dedup_clusters adjudication that closed cleanly in r8
(BASELINE.md): both variants in ONE process, interleaved passes at
sf0.1, wall + JVM/py process-CPU per observation, loadavg recorded per
pass.  Variants:

* ``literal``  — ivf_ann_topk (16 centroid literals folded into the plan;
  ~0.68 s plan-build constant documented in BASELINE.md r8)
* ``table``    — similarity_ann_ivf_table's shape (centroids as a
  broadcast TABLE, no plan literals)

Usage: python scripts/adjudicate_ivf.py [passes]
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
    variants = {
        "literal": q["similarity_ann_ivf_topk"],
        "table": q["similarity_ann_ivf_table"],
    }
    # warm both once (session/codegen caches, fixture file listing)
    for fn in variants.values():
        fn(spark, sf_dir).count()
    obs: dict[str, list[tuple[float, float]]] = {k: [] for k in variants}
    for p in range(passes):
        load = os.getloadavg()[0]
        for name, fn in variants.items():
            cpu0 = _jvm_cpu_s(jvm) + time.process_time()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            cpu = (_jvm_cpu_s(jvm) + time.process_time()) - cpu0
            obs[name].append((wall, cpu))
            print(f"pass {p} load {load:.1f} {name:8s} wall {wall:6.2f}s cpu {cpu:6.2f}s", flush=True)
        time.sleep(2)
    for name, o in obs.items():
        walls = sorted(w for w, _ in o)
        cpus = sorted(c for _, c in o)
        print(
            f"{name:8s} wall floor {walls[0]:.2f}s (spread {walls[0]:.2f}-{walls[-1]:.2f}) "
            f"cpu floor {cpus[0]:.2f} (spread {cpus[0]:.2f}-{cpus[-1]:.2f})"
        )


if __name__ == "__main__":
    main()
