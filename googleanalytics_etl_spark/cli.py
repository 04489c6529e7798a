"""Console entry point — the reference's CLI surface (SURVEY.md §3.1).

The reference ships a console script: load a YAML config, construct the
ETL object, run ``.sync()`` (EP1), ``--restart``-style full reload
(EP2), or post-load report building (EP3) [REF-UNVERIFIED]. This module
is that surface on Spark:

    python -m googleanalytics_etl_spark.cli sync     --config c.yaml \\
        --source-dir /root/testdata/sf0.001 --target /tmp/out
    python -m googleanalytics_etl_spark.cli backfill --config c.yaml ...
    python -m googleanalytics_etl_spark.cli reports  \\
        --source-dir ... --out /tmp/reports

Config files may be YAML (if pyyaml is importable) or JSON — the schema
is :data:`etl.EXAMPLE_CONFIG`. Omitting ``--config`` uses that example
config (the fixture event log with reference-style derivations).
"""

from __future__ import annotations

import argparse
import json
import sys

from .etl import EXAMPLE_CONFIG, SyncPipeline
from .io import load
from .reports import materialize_reports
from .session import get_spark


def load_config(path: str | None) -> dict:
    """Read a YAML or JSON config; default to the example config."""
    if path is None:
        return EXAMPLE_CONFIG
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - yaml is installed here
            raise SystemExit(
                "pyyaml not available; provide a .json config instead"
            ) from e
        config = yaml.safe_load(text)
    else:
        config = json.loads(text)
    if not isinstance(config, dict):
        raise SystemExit(f"config {path!r} is empty or not a mapping")
    return config


def build_parser() -> argparse.ArgumentParser:
    # Shared options are accepted both before AND after the subcommand.
    # The subparser copies default to SUPPRESS so an omitted post-command
    # option does not clobber a prefix-position value (argparse resolves
    # subparser results last).
    shared = argparse.ArgumentParser(add_help=False)
    shared.add_argument(
        "--config",
        default=argparse.SUPPRESS,
        help="YAML/JSON config (etl.EXAMPLE_CONFIG schema)",
    )
    shared.add_argument(
        "--source-dir",
        default=argparse.SUPPRESS,
        help="directory of source parquet tables",
    )
    shared.add_argument(
        "--cpus", type=int, default=argparse.SUPPRESS, help="local parallelism"
    )

    p = argparse.ArgumentParser(
        prog="googleanalytics-etl-spark",
        description="Config-driven incremental sync engine (Spark).",
        parents=[shared],
    )
    p.set_defaults(config=None, source_dir="/root/testdata/sf0.001", cpus=None)
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser(
        "sync",
        help="incremental sync (EP1: HWM tail + dedup append)",
        parents=[shared],
    )
    s.add_argument("--target", required=True, help="target parquet path")
    s.add_argument(
        "--overlap",
        default="1 hour",
        help="trailing re-extract window for late data (e.g. '1 hour')",
    )

    b = sub.add_parser(
        "backfill", help="full reload (EP2: overwrite target)", parents=[shared]
    )
    b.add_argument("--target", required=True)

    r = sub.add_parser(
        "reports", help="derived report tables (EP3)", parents=[shared]
    )
    r.add_argument("--out", required=True, help="output directory for report tables")

    q = sub.add_parser(
        "query",
        help="run any registered operator by key (registry.py surface)",
        parents=[shared],
    )
    q.add_argument("key", help="operator key, e.g. x_dedup_near (see --list)")
    q.add_argument(
        "--out", default=None, help="write result parquet here instead of stdout"
    )
    q.add_argument(
        "--limit", type=int, default=20, help="stdout row cap (default 20)"
    )

    sub.add_parser("list", help="list every registered operator key")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.command == "list":
        from .registry import queries

        for key in queries():
            print(key)
        return 0

    config = load_config(args.config)
    spark = get_spark("gae-spark-cli", cpus=args.cpus)

    if args.command == "query":
        from .registry import queries

        q = queries()
        if args.key not in q:
            raise SystemExit(
                f"unknown key {args.key!r}; `list` prints all "
                f"{len(q)} registered operators"
            )
        df = q[args.key](spark, args.source_dir)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(
                json.dumps(
                    {"command": "query", "key": args.key, "out": args.out,
                     "rows": spark.read.parquet(args.out).count()}
                )
            )
        else:
            for row in df.limit(args.limit).collect():
                print(json.dumps(row.asDict(), default=str))
        return 0

    if args.command == "reports":
        paths = materialize_reports(
            spark,
            load(spark, args.source_dir, config.get("source_table", "events")),
            args.out,
        )
        print(json.dumps({"command": "reports", "tables": paths}))
        return 0

    source = load(spark, args.source_dir, config["source_table"])
    pipe = SyncPipeline(spark, config, args.target)
    if args.command == "sync":
        n = pipe.sync(source, reextract_overlap=args.overlap)
        print(json.dumps({"command": "sync", "appended": n, "target": args.target}))
    else:
        n = pipe.backfill(source)
        print(
            json.dumps({"command": "backfill", "rows": n, "target": args.target})
        )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
