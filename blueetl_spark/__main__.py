"""CLI: ``python -m blueetl_spark <command>`` — the Spark-first equivalent
of the reference's ``blueetl`` console entry points (``apps/run.py``,
``apps/convert.py``, validate/migrate commands; SURVEY §3.1, §7 phase 6).

Commands:

- ``run CONFIG``: load an analysis config (YAML/JSON), run extraction +
  features against parquet inputs, write every table under ``--output``.
- ``validate-config CONFIG``: structural validation, exit 1 on errors.
- ``convert-spikes CSV OUTPUT_DIR``: build a runnable synthetic campaign
  bundle from a bare spikes CSV.
- ``query SF_DIR NAME``: run one registered query and show N rows
  (debug/demo).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_config(path: str) -> dict:
    text = Path(path).read_text()
    if path.endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


def cmd_run(args: argparse.Namespace) -> int:
    from blueetl_spark.analysis import MultiAnalyzer
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="blueetl_spark.run")
    config = _load_config(args.config)
    nodes = spark.read.parquet(args.nodes)
    events = spark.read.parquet(args.events)
    ma = MultiAnalyzer(
        spark, config, nodes, events, cache_path=args.cache or None
    )
    ma.extract()
    features = ma.calculate_features()
    out = Path(args.output)
    for analysis_name in config.get("analysis", {}):
        a = getattr(ma, analysis_name)
        for table_name in ("simulations", "neurons", "neuron_classes", "windows", "report"):
            df = getattr(a, table_name)
            df.write.mode("overwrite").parquet(
                str(out / analysis_name / "repo" / f"{table_name}.parquet")
            )
        for fname, fdf in features.get(analysis_name, {}).items():
            fdf.write.mode("overwrite").parquet(
                str(out / analysis_name / "features" / f"{fname}.parquet")
            )
    print(f"wrote {out}")
    return 0


def cmd_validate_config(args: argparse.Namespace) -> int:
    config = _load_config(args.config)
    errors: list[str] = []
    analyses = config.get("analysis")
    if not isinstance(analyses, dict) or not analyses:
        errors.append("missing or empty 'analysis' mapping")
    for name, a in (analyses or {}).items():
        ex = a.get("extraction") if isinstance(a, dict) else None
        if not isinstance(ex, dict):
            errors.append(f"analysis {name!r}: missing 'extraction'")
            continue
        windows = ex.get("windows")
        if not isinstance(windows, dict) or not windows:
            errors.append(f"analysis {name!r}: missing 'extraction.windows'")
        else:
            for wname, w in windows.items():
                if isinstance(w, str):
                    continue  # cross-analysis window reference (W3)
                bounds = w.get("bounds")
                if (
                    not isinstance(bounds, (list, tuple))
                    or len(bounds) != 2
                    or bounds[0] > bounds[1]
                ):
                    errors.append(
                        f"analysis {name!r}: window {wname!r} needs bounds [lo, hi]"
                    )
        if not isinstance(ex.get("neuron_classes"), dict):
            errors.append(f"analysis {name!r}: missing 'extraction.neuron_classes'")
        for i, fc in enumerate(a.get("features") or []):
            if "groupby" not in fc:
                errors.append(f"analysis {name!r}: features[{i}] missing 'groupby'")
    for e in errors:
        print(f"ERROR: {e}", file=sys.stderr)
    print("invalid" if errors else "valid")
    return 1 if errors else 0


def cmd_convert_spikes(args: argparse.Namespace) -> int:
    from blueetl_spark.session import get_spark
    from blueetl_spark.sources.convert_spikes import convert_spikes

    spark = get_spark(app_name="blueetl_spark.convert")
    stats = convert_spikes(
        spark, args.csv, args.output_dir, node_population=args.node_population
    )
    print(json.dumps(stats))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from blueetl_spark.queries import QUERIES
    from blueetl_spark.session import get_spark

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; one of {sorted(QUERIES)}", file=sys.stderr)
        return 1
    spark = get_spark(app_name="blueetl_spark.query")
    QUERIES[args.name](spark, args.sf_dir).show(args.rows, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="blueetl_spark")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("run", help="run an analysis config end-to-end")
    r.add_argument("config")
    r.add_argument("--nodes", required=True, help="nodes parquet path")
    r.add_argument("--events", required=True, help="events parquet path")
    r.add_argument("--output", required=True, help="output directory")
    r.add_argument("--cache", default="", help="cache directory (optional)")
    r.set_defaults(fn=cmd_run)

    v = sub.add_parser("validate-config", help="validate an analysis config")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate_config)

    c = sub.add_parser("convert-spikes", help="CSV spikes -> synthetic campaign")
    c.add_argument("csv")
    c.add_argument("output_dir")
    c.add_argument("--node-population", default="synthetic")
    c.set_defaults(fn=cmd_convert_spikes)

    s = sub.add_parser("query", help="run one registered query")
    s.add_argument("sf_dir")
    s.add_argument("name")
    s.add_argument("--rows", type=int, default=20)
    s.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
