"""Command-line surface: ``python -m postgres_debezium_clickhouse_spark …``

The operational entry points a user switching from the reference stack
reaches for first — run any registered query against a fixture scale,
inspect a silver store, print an oracle — without writing a driver
script.  Thin by design: every subcommand delegates to the same public
API the tests and the driver contract use.

    list                          registered queries (name + oracle kind)
    query NAME [--sf-dir D] [-n N]   run one query, show N rows
    oracle NAME                   print the DuckDB oracle SQL
    describe-store PATH           system.parts-style file listing
    versions PATH                 committed versions (time travel pins)
    signals PATH                  pending incremental-snapshot signals
    signal-snapshot PATH --order-col K --watermark V [--chunks N]
                    [--type incremental|blocking] [--where SQL_PREDICATE]
                    [--channel file|kafka --topic TOPIC_FILE]
                                  enqueue an execute-snapshot signal
                                  (--where = Debezium additional-conditions;
                                  --channel kafka appends the Debezium
                                  kafka-signal envelope to the topic file
                                  instead of the signal dir)
    poll-signals PATH --topic TOPIC_FILE
                                  drain the kafka signal channel into the
                                  store's signal queue (offset-committed)
    stop-snapshot PATH SIGNAL_ID  cancel a pending/running snapshot
    pause-snapshot PATH           suspend incremental snapshotting
    resume-snapshot PATH          lift a pause (no-op when not paused)
"""

from __future__ import annotations

import argparse
import os
import sys


def _entry():
    """Import the repo-root driver contract regardless of cwd."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __spark_entry__ as entrymod

    return entrymod


def _spark():
    from .session import get_spark

    spark = get_spark("pdc-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="postgres_debezium_clickhouse_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    q.add_argument("-n", "--limit", type=int, default=20)
    o = sub.add_parser("oracle")
    o.add_argument("name")
    d = sub.add_parser("describe-store")
    d.add_argument("path")
    v = sub.add_parser("versions")
    v.add_argument("path")
    sg = sub.add_parser("signals")
    sg.add_argument("path")
    ss = sub.add_parser("signal-snapshot")
    ss.add_argument("path")
    ss.add_argument("--order-col", required=True)
    ss.add_argument("--watermark", required=True, type=int)
    ss.add_argument("--chunks", type=int, default=8)
    ss.add_argument("--type", dest="snapshot_type", default="incremental",
                    choices=("incremental", "blocking"))
    ss.add_argument("--where", dest="additional_condition", default=None)
    ss.add_argument("--channel", default="file", choices=("file", "kafka"))
    ss.add_argument("--topic", default=None,
                    help="signal topic file (required with --channel kafka)")
    pk = sub.add_parser("poll-signals")
    pk.add_argument("path")
    pk.add_argument("--topic", required=True)
    st = sub.add_parser("stop-snapshot")
    st.add_argument("path")
    st.add_argument("signal_id")
    ps = sub.add_parser("pause-snapshot")
    ps.add_argument("path")
    rs = sub.add_parser("resume-snapshot")
    rs.add_argument("path")
    args = ap.parse_args(argv)

    if args.cmd == "list":
        m = _entry()
        oracles = m.oracle_sql()
        for name in m.queries():
            kind = "full-oracle" if name in oracles else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if args.cmd == "oracle":
        m = _entry()
        sql = m.oracle_sql().get(args.name)
        if sql is None:
            print(f"no oracle for {args.name!r}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0
    if args.cmd == "query":
        m = _entry()
        fn = m.queries().get(args.name)
        if fn is None:
            print(f"unknown query {args.name!r} (see `list`)", file=sys.stderr)
            return 1
        df = fn(_spark(), args.sf_dir)
        df.show(args.limit, truncate=False)
        print(f"-- {df.count()} rows total")
        return 0
    if args.cmd == "describe-store":
        from .streaming.pipeline import describe_silver

        describe_silver(_spark(), args.path).orderBy("layout", "bucket").show(
            1000, truncate=False
        )
        return 0
    if args.cmd == "versions":
        from .streaming.pipeline import silver_versions

        print(" ".join(str(v) for v in silver_versions(args.path)))
        return 0
    if args.cmd == "signals":
        from .streaming.snapshot import list_signals

        for sig in list_signals(args.path):
            print(f"{sig['id']}\t{sig['type']}\torder_col={sig['order_col']}"
                  f"\tn_chunks={sig['n_chunks']}"
                  f"\twatermark={sig['watermark_version']}")
        return 0
    if args.cmd == "signal-snapshot":
        if args.channel == "kafka":
            import uuid as _uuid

            from .streaming.snapshot import kafka_signal_topic_append

            if not args.topic:
                print("--channel kafka requires --topic", file=sys.stderr)
                return 1
            sid = _uuid.uuid4().hex[:16]
            off = kafka_signal_topic_append(args.topic, {
                "id": sid,
                "type": "execute-snapshot",
                "data": {
                    "type": args.snapshot_type.upper(),
                    "order_col": args.order_col,
                    "n_chunks": args.chunks,
                    "watermark_version": args.watermark,
                    "additional-conditions": args.additional_condition,
                },
            })
            print(f"{sid}\toffset={off}")
            return 0
        from .streaming.snapshot import signal_snapshot

        sid = signal_snapshot(
            args.path, order_col=args.order_col, n_chunks=args.chunks,
            watermark_version=args.watermark,
            snapshot_type=args.snapshot_type,
            additional_condition=args.additional_condition,
        )
        print(sid)
        return 0
    if args.cmd == "poll-signals":
        from .streaming.snapshot import poll_kafka_signal_channel

        for sid in poll_kafka_signal_channel(args.topic, args.path):
            print(sid)
        return 0
    if args.cmd == "stop-snapshot":
        from .streaming.snapshot import signal_stop_snapshot

        signal_stop_snapshot(args.path, args.signal_id)
        return 0
    if args.cmd == "pause-snapshot":
        from .streaming.snapshot import signal_pause_snapshot

        signal_pause_snapshot(args.path)
        return 0
    if args.cmd == "resume-snapshot":
        from .streaming.snapshot import signal_resume_snapshot

        signal_resume_snapshot(args.path)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
