"""Benchmark harness — times the engine's headline queries, noise-robustly.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, ...}

Noise model (r4 post-mortem): this container shows multi-second scheduler
stalls that land on *random* queries — identical code benched 10.2 s /
31.3 s / 41.0 s across three runs, each time with a different query slow.
Wall-clock best-of-2 was not enough to reject that.  Counter-measures:

* **best-of-3, interleaved in passes** — pass 1 runs every query once,
  then pass 2, then pass 3 (with a cooldown between passes).  Repeats of
  the same query are therefore separated by a full pass (~10 s), so one
  localized stall cannot poison all runs of one query.
* **``value`` IS the floor** — per-query minimum across the 3 passes,
  summed.  ``runs`` carries every observation so the spread is auditable.
* **process-CPU time per query** — in ``local[*]`` all executor work
  happens inside the one JVM, so the delta of the JVM's OS-level process
  CPU (utime+stime from ``/proc/<jvm_pid>/stat``) plus the Python
  driver's ``time.process_time`` measures work done, not time waited.  A scheduler stall inflates wall-clock but not CPU, so
  ``queries_cpu`` / ``value_cpu`` stay comparable across noisy runs.
  (CPU *sums* thread-seconds across the 32 local cores, so it sits above
  wall-clock for parallel stages; compare CPU to CPU across rounds.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entrymod
from postgres_debezium_clickhouse_spark.session import get_spark

#: headline set: flagship CDC path + representative join/agg/window/LLM ops —
#: one per operator family so a regression anywhere shows up here.
HEADLINE = [
    "cdc_current_state",      # flagship: parse → dedup → casts (W1/S8)
    "products_usable_vw",     # reference flagship parity (F4-F7 casts)
    "cdc_json_extract_path",  # schema-on-read route (F1-F3)
    "star_join_revenue",      # FK-lattice join (J1)
    "order_totals",           # decorrelated per-key SUM (J2/A1)
    "pricing_summary",        # grouped aggregation (A1/F12/F15)
    "latest_order_per_customer",  # argmax window (A3/W1)
    "events_sessionization",  # session windows (T10)
    "dedup_exact",            # LLM: exact dedup
    "dedup_minhash_lsh",      # LLM: banded near-dup
    "similarity_cosine_topk", # LLM: brute-force ANN baseline
    "text_quality_score",     # LLM: text analysis
    "dedup_clusters",         # LLM: iterative label propagation (plan-unusual)
    "pack_greedy",            # LLM: applyInPandas Arrow path
    "similarity_ann_ivf_topk",  # LLM: IVF probe (16-literal argmin projection)
    "similarity_ann_ivf_table", # LLM: IVF probe, centroid-TABLE scale path (r9
                                # adjudication: equal CPU floor, better wall —
                                # kept alongside the literal series, BASELINE.md)
    "dedup_substring_spans",    # LLM: exact-substring dup spans (r11 — the
                                # heaviest new op: all-positions gram shuffle
                                # + per-doc interval-union window)
    "dedup_substring_removal",  # LLM: the spans' rewrite composition (r12 —
                                # merged-interval fold re-emitting cleaned text)
    "multimodal_pdf_meta",      # media walk (r17 headline add, verdict item 5:
                                # the mapInPandas media suites were not
                                # perf-regression-guarded; PDF is the heaviest
                                # per-blob walk — encoder + xref/objstm parse)
    "corpus_bpe_encode",        # tokenizer (r17 headline add: Arrow-batched
                                # BPE encode over the corpus — the other
                                # unguarded mapInPandas family)
    "multimodal_exif_meta",     # r18 headline add: the round's walk family
                                # representative (4-container dispatch + TIFF
                                # IFD parse); ogg/heif/fmp4/subtitles/gzip/
                                # zstd share the per-blob mapInPandas shape
                                # and ride the same guard
]

PASSES = 3
COOLDOWN_S = 2.0


def _find_jvm_pid() -> int:
    """Pid of the local-mode Spark JVM (a java child of this driver).

    Java 17's module system blocks py4j reflective access to
    ``sun.management`` (getProcessCpuTime), so we read the OS's own
    accounting instead: scan /proc for a ``java`` process whose parent is
    this Python driver.  Returns -1 if not found (non-Linux).
    """
    me = os.getpid()
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().split()
                # fields: pid (comm) state ppid ...  — comm may hold spaces,
                # but java's comm is "(java)"
                if parts[1] == "(java)" and int(parts[3]) == me:
                    return int(pid)
            except (OSError, IndexError, ValueError):
                continue
    except OSError:
        pass
    return -1


_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _jvm_cpu_s(pid: int) -> float:
    """utime+stime of the JVM process in seconds (from /proc/pid/stat).

    OS-level process CPU summed over all threads — immune to wall-clock
    scheduling stalls: a stalled query burns wall time but not CPU, so the
    CPU floor stays comparable across noisy container states.
    Returns -1.0 on failure.
    """
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / _CLK_TCK
    except (OSError, IndexError, ValueError):
        return -1.0


def _bench_streaming(spark, sf_dir: str, passes: int = 3) -> dict:
    """Throughput of the flagship streaming path (r7 verdict item 4): the
    multi-micro-batch silver upsert — file-source Kafka-shaped stream →
    envelope parse → foreachBatch keyed latest-wins merge on the bucketed
    manifest-committed store.  BASELINE.md claims ~38k events/s at sf0.1;
    without a per-round artifact a regression in the foreachBatch merge
    (the reference's MV chain, clickhouse.sql:57-68) would be invisible
    to the driver.  Reports the best of ``passes`` runs (events/s is a
    rate, so best = floor-equivalent under stall noise) plus every
    observation for auditability."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.schemas import ORDERS_ENVELOPE
    from postgres_debezium_clickhouse_spark.sources.cdc import (
        orders_cdc_events,
        parse_envelope,
    )
    from postgres_debezium_clickhouse_spark.streaming.pipeline import (
        silver_upsert_stream,
    )

    events = orders_cdc_events(spark, sf_dir)
    root = tempfile.gettempdir()
    src = f"{root}/bench_stream_src_{uuid.uuid4().hex[:12]}"
    # source materialization is untimed (the durable log exists already in
    # deployment); several files → several micro-batches per run
    events.repartition(4).write.mode("overwrite").json(src)
    n_events = spark.read.schema(events.schema).json(src).count()

    rates, walls = [], []
    try:
        for _ in range(passes):
            dst = f"{root}/bench_stream_out_{uuid.uuid4().hex[:12]}"
            ckpt = f"{root}/bench_stream_ckpt_{uuid.uuid4().hex[:12]}"
            try:
                stream = (
                    spark.readStream.schema(events.schema)
                    .option("maxFilesPerTrigger", "2")
                    .json(src)
                )
                p = F.col("j.payload")
                flat = parse_envelope(stream, ORDERS_ENVELOPE).select(
                    F.coalesce(p.after["o_orderkey"], p.before["o_orderkey"]).alias("o_orderkey"),
                    p.after["o_orderstatus"].alias("o_orderstatus"),
                    p.after["o_totalprice"].cast("double").alias("o_totalprice"),
                    p.op.alias("op"),
                    p.source["ts_ms"].alias("ts_ms"),
                    F.col("offset"),
                )
                t0 = time.monotonic()
                q = silver_upsert_stream(
                    flat, dst, ckpt, keys=["o_orderkey"], available_now=True
                )
                if not q.awaitTermination(600):
                    q.stop()
                    raise TimeoutError("streaming bench did not finish in 600s")
                wall = time.monotonic() - t0
                walls.append(round(wall, 3))
                rates.append(round(n_events / wall, 1))
            finally:
                shutil.rmtree(dst, ignore_errors=True)
                shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return {
        "metric": "silver_events_per_sec",
        "value": max(rates) if rates else None,
        "unit": "events/sec",
        "n_events": n_events,
        "walls": walls,
        "rates": rates,
        "passes": passes,
    }


def _bench_collapsing(spark, sf_dir: str, passes: int = 2) -> dict:
    """Collapsing-sink replay throughput (r9 verdict item 7: the new sink
    families need the same super-linearity evidence as the upsert path).
    Replays the signed insert/update/delete workload of
    ``stream_collapsing_state`` (plain mode, seq-ordered) through
    ``silver_collapsing_stream`` and reports events/s, best of
    ``passes``."""
    import shutil
    import tempfile
    import uuid

    from postgres_debezium_clickhouse_spark.plans.ops_queries import (
        _signed_order_stream,
    )
    from postgres_debezium_clickhouse_spark.streaming.pipeline import (
        silver_collapsing_stream,
    )

    signed = _signed_order_stream(spark, sf_dir, versioned=False)
    root = tempfile.gettempdir()
    src = f"{root}/bench_clps_src_{uuid.uuid4().hex[:12]}"
    signed.repartition(4).write.mode("overwrite").parquet(src)
    n_events = spark.read.parquet(src).count()

    rates, walls = [], []
    try:
        for _ in range(passes):
            dst = f"{root}/bench_clps_out_{uuid.uuid4().hex[:12]}"
            ckpt = f"{root}/bench_clps_ckpt_{uuid.uuid4().hex[:12]}"
            try:
                stream = (
                    spark.readStream.schema(signed.schema)
                    .option("maxFilesPerTrigger", "2")
                    .parquet(src)
                )
                t0 = time.monotonic()
                q = silver_collapsing_stream(
                    stream, dst, ckpt, keys=["k"], seq_col="seq",
                    available_now=True,
                )
                if not q.awaitTermination(600):
                    q.stop()
                    raise TimeoutError("collapsing bench did not finish in 600s")
                wall = time.monotonic() - t0
                walls.append(round(wall, 3))
                rates.append(round(n_events / wall, 1))
            finally:
                shutil.rmtree(dst, ignore_errors=True)
                shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return {
        "metric": "collapsing_events_per_sec",
        "value": max(rates) if rates else None,
        "unit": "events/sec",
        "n_events": n_events,
        "walls": walls,
        "rates": rates,
        "passes": passes,
    }


def _run_passes(spark, sf_dir: str, names, queries, passes: int = PASSES):
    """The interleaved-pass measurement loop (see module docstring):
    returns (wall_runs, cpu_runs) with every observation."""
    wall_runs: dict[str, list[float]] = {n: [] for n in names}
    cpu_runs: dict[str, list[float]] = {n: [] for n in names}
    jvm_pid = _find_jvm_pid()
    have_cpu = jvm_pid > 0 and _jvm_cpu_s(jvm_pid) >= 0

    for pass_i in range(passes):
        if pass_i:
            time.sleep(COOLDOWN_S)
        for name in names:
            fn = queries[name]
            cpu0 = _jvm_cpu_s(jvm_pid) if have_cpu else 0.0
            py0 = time.process_time()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            py_cpu = time.process_time() - py0
            wall_runs[name].append(round(wall, 3))
            if have_cpu:
                jvm_cpu = _jvm_cpu_s(jvm_pid) - cpu0
                cpu_runs[name].append(round(jvm_cpu + py_cpu, 3))
        print(f"  pass {pass_i + 1}/{passes}: "
              f"{round(sum(w[-1] for w in wall_runs.values()), 2)}s wall",
              file=sys.stderr)
    return wall_runs, cpu_runs


def _scaling_dirs() -> list[str]:
    """The scaling decades: the two driver fixtures, plus the repo-local
    sf1 (r11 verdict item 1: one more decade — generate it with
    ``python scripts/gen_testdata.py 1 testdata_sf1``; 183 MB, gitignored,
    distribution-matched to the driver fixtures)."""
    dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    sf1 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "testdata_sf1")
    if os.path.isdir(sf1):
        dirs.append(sf1)
    else:
        print("  (no testdata_sf1 — run scripts/gen_testdata.py 1 "
              "testdata_sf1 for the third decade)", file=sys.stderr)
    return dirs


def scaling_main() -> int:
    """``python bench.py --scaling`` (r9 verdict item 8, widened to three
    decades in r12): the per-decade cost-ratio table for the headline
    queries — the standing super-linearity check.  Data grows 10× per
    step; a query whose wall/CPU ratio sits FAR above 10× is a
    super-linear red flag the 100× scale claim needs caught before any
    real scale-up.  (Sub-10× ratios are normal: fixed per-query
    constants — plan build, session round-trips, task launch — dominate
    at small sf.)  Prints a markdown table for BASELINE.md plus one JSON
    line."""
    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    dirs = _scaling_dirs()
    labels = [os.path.basename(d.rstrip("/")).replace("testdata_", "")
              for d in dirs]
    res = {}
    for sf_dir in dirs:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm
        print(f"  scaling pass @ {sf_dir} (load {os.getloadavg()[0]:.1f})",
              file=sys.stderr)
        wall_runs, cpu_runs = _run_passes(spark, sf_dir, names, queries)
        res[sf_dir] = (
            {n: min(w) for n, w in wall_runs.items()},
            {n: min(c) for n, c in cpu_runs.items() if c},
        )
    hdr_w = " | ".join(f"{lb} wall" for lb in labels)
    hdr_c = " | ".join(f"{lb} CPU" for lb in labels)
    hdr_r = " | ".join(f"×{labels[i]}→{labels[i + 1]}"
                       for i in range(len(labels) - 1))
    print(f"| query | {hdr_w} | {hdr_c} | wall {hdr_r} | cpu {hdr_r} |")
    print("|---|" + "---|" * (2 * len(labels) + 2 * (len(labels) - 1)))
    ratios = {}
    for n in names:
        ws = [res[d][0][n] for d in dirs]
        cs = [res[d][1].get(n) for d in dirs]
        rw = [round(ws[i + 1] / ws[i], 1) if ws[i] else None
              for i in range(len(ws) - 1)]
        rc = [round(cs[i + 1] / cs[i], 1) if cs[i] and cs[i + 1] else None
              for i in range(len(cs) - 1)]
        ratios[n] = {"wall": rw, "cpu": rc,
                     "wall_s": ws, "cpu_s": cs, "dirs": labels}
        cell_w = " | ".join(f"{w:.2f}" for w in ws)
        cell_c = " | ".join(f"{c:.1f}" if c is not None else "-" for c in cs)
        cell_rw = " | ".join(f"{r}×" if r is not None else "-" for r in rw)
        cell_rc = " | ".join(f"{r}×" if r is not None else "-" for r in rc)
        print(f"| {n} | {cell_w} | {cell_c} | {cell_rw} | {cell_rc} |")
    # streaming rows (r9 verdict item 7): the silver upsert path and one
    # collapsing-sink replay get the same per-decade check.  The
    # comparable quantity is per-event COST (wall/event = 1/rate): ratio
    # = cost_big/cost_small against 10× data, same reading as above.
    stream_rows = {}
    for label, fn in (("streaming_silver_upsert", _bench_streaming),
                      ("streaming_collapsing", _bench_collapsing)):
        obs = []
        for sf_dir in dirs:
            print(f"  {label} @ {sf_dir}", file=sys.stderr)
            obs.append(fn(spark, sf_dir, passes=2))
        cost_ratios = [
            round((1.0 / obs[i + 1]["value"]) / (1.0 / obs[i]["value"]), 2)
            if obs[i]["value"] and obs[i + 1]["value"] else None
            for i in range(len(obs) - 1)
        ]
        stream_rows[label] = {
            "events_per_sec": {lb: o["value"] for lb, o in zip(labels, obs)},
            "n_events": {lb: o["n_events"] for lb, o in zip(labels, obs)},
            "per_event_cost_ratios": cost_ratios,
        }
        cells = " | ".join(str(o["value"]) for o in obs)
        rcells = " | ".join(f"{r}×" if r is not None else "-"
                            for r in cost_ratios)
        print(f"| {label} (events/s) | {cells} | per-event cost {rcells} |")
    print(json.dumps({"metric": "scaling_ratios", "ratios": ratios,
                      "streaming": stream_rows, "decades": labels}))
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0")
    # r12 verdict item 3: driver wall rose two rounds straight purely on
    # ambient load — stamp loadavg into every bench record and LOUDLY
    # mark a run started under load so it is never read as a regression
    # (or a record).  1/5/15-minute averages, captured BEFORE the JVM
    # spins up so they reflect the ambient machine, not this bench.
    load_1, load_5, load_15 = os.getloadavg()
    loaded = load_15 > 2.0
    if loaded:
        print(f"  WARNING: ambient 15-min loadavg {load_15:.2f} > 2 — "
              "results are NOT record-eligible (BASELINE.md discipline)",
              file=sys.stderr)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    # warm-up: JVM + parquet footer caches, untimed
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # streaming-throughput metric (r7 verdict item 4) — measured BEFORE
    # the headline passes as of r13: three same-code sessions showed the
    # end-of-bench JVM (~600 accumulated stages) depresses the streaming
    # rate ~25% (56k in-session vs 73k fresh-JVM probe, identical merge
    # plan), so last-position measured the session's GC state, not the
    # sink.  Run first, the JVM is equally young every round; its temp
    # source dir is written and deleted before any headline pass, so the
    # query floors are not perturbed.  Best-of-passes still applies.
    try:
        streaming = _bench_streaming(spark, sf_dir)
        print(f"  streaming: {streaming['value']} events/s "
              f"({streaming['n_events']} events, walls {streaming['walls']})",
              file=sys.stderr)
    except Exception as e:  # never let this metric kill the headline
        print(f"  streaming bench failed: {e}", file=sys.stderr)
        streaming = {"metric": "silver_events_per_sec", "value": None,
                     "error": str(e)}

    wall_runs, cpu_runs = _run_passes(spark, sf_dir, names, queries)

    import statistics

    timings = {n: min(w) for n, w in wall_runs.items()}   # per-query floor
    medians = {n: round(statistics.median(w), 3) for n, w in wall_runs.items()}
    cpu = {n: min(c) for n, c in cpu_runs.items() if c}
    total = round(sum(timings.values()), 3)
    # Full detail (every observation, per-query medians/CPU) goes to a FILE —
    # the driver captures only a 2000-char stdout tail, and the r6 summary
    # line outgrew it (BENCH_r06 parsed:null).  Stdout gets ONE compact line.
    detail = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "value_floor": total,
        "value_median": round(sum(medians.values()), 3),
        "queries_median": medians,
        "queries_cpu": cpu,           # per-query process-CPU floor (JVM+driver)
        "value_cpu": round(sum(cpu.values()), 3) if cpu else None,
        "runs": wall_runs,            # every observation — noise is auditable
        "passes": PASSES,
        "streaming": streaming,       # silver_events_per_sec detail (r8)
        "loadavg": [round(load_1, 2), round(load_5, 2), round(load_15, 2)],
        "ambient_load_exceeded": loaded,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        print(f"  full detail -> {detail_path}", file=sys.stderr)
    except OSError as e:  # never let detail-write failure kill the metric
        print(f"  detail write failed: {e}", file=sys.stderr)
    # compact machine-readable summary — MUST be the LAST stdout line
    out = {
        "metric": "headline_total",
        "value": total,               # sum of per-query wall floors (min-of-3)
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # like-for-like estimator across rounds (r5 advice): the floor
        # biases lower as PASSES grows; the per-query MEDIAN sum is
        # sample-count-insensitive for odd PASSES.
        "value_median": round(sum(medians.values()), 3),
        "value_cpu": round(sum(cpu.values()), 3) if cpu else None,
        # second metric on the SAME parsed line (r7 verdict item 4): the
        # flagship streaming path's throughput, gated in BASELINE.md
        "silver_events_per_sec": streaming.get("value"),
        # ambient load at bench start (1/5/15-min) + the record gate:
        # a run with ambient_load_exceeded must never update floors
        "loadavg": [round(load_1, 2), round(load_5, 2), round(load_15, 2)],
        "ambient_load_exceeded": loaded,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(scaling_main() if "--scaling" in sys.argv[1:] else main())
