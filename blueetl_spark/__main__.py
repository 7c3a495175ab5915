"""CLI: ``python -m blueetl_spark <command>`` — the Spark-first equivalent
of the reference's ``blueetl`` console entry points (``apps/run.py``,
``apps/convert.py``, validate/migrate commands; SURVEY §3.1, §7 phase 6).

Commands:

- ``run CONFIG``: load an analysis config (YAML/JSON), run extraction +
  features against parquet inputs, write every table under ``--output``.
- ``validate-config CONFIG``: jsonschema validation (every violation
  listed with its path) + semantic checks, exit 1 on errors.
- ``migrate-config CONFIG OUTPUT``: upgrade a v1/v2/v3 config to v4
  (reference ``apps/migrate.py``).
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
        spark, config, nodes, events,
        cache_path=args.cache or None,
        clear_cache=args.clear_cache or None,
        readonly_cache=args.readonly_cache or None,
        seed=args.seed,
    )
    if not args.no_extract:
        ma.extract()
    features = {} if args.no_calculate else ma.calculate_features()
    out = Path(args.output)
    for analysis_name in config.get("analysis", {}):
        a = getattr(ma, analysis_name)
        tables_ = () if args.no_extract else (
            "simulations", "neurons", "neuron_classes", "windows", "report"
        )
        for table_name in tables_:
            df = getattr(a, table_name)
            if args.show:
                print(f"== {analysis_name}.{table_name}")
                df.show(10, truncate=False)
            df.write.mode("overwrite").parquet(
                str(out / analysis_name / "repo" / f"{table_name}.parquet")
            )
        for fname, fdf in features.get(analysis_name, {}).items():
            if args.show:
                print(f"== {analysis_name}.features.{fname}")
                fdf.show(10, truncate=False)
            fdf.write.mode("overwrite").parquet(
                str(out / analysis_name / "features" / f"{fname}.parquet")
            )
    print(f"wrote {out}")
    return 0


def cmd_validate_config(args: argparse.Namespace) -> int:
    from blueetl_spark.validation import ValidationError, validate_config

    config = _load_config(args.config)
    errors: list[str] = []
    try:
        validate_config(config)
    except ValidationError as exc:
        errors = exc.errors
    # semantic checks the schema can't express
    for name, a in (config.get("analysis") or {}).items():
        if not isinstance(a, dict) or not isinstance(a.get("extraction"), dict):
            continue
        for wname, w in (a["extraction"].get("windows") or {}).items():
            if isinstance(w, dict):
                bounds = w.get("bounds")
                if isinstance(bounds, (list, tuple)) and len(bounds) == 2 and (
                    bounds[0] > bounds[1]
                ):
                    errors.append(
                        f"analysis {name!r}: window {wname!r} bounds must be [lo, hi]"
                    )
    for e in errors:
        print(f"ERROR: {e}", file=sys.stderr)
    print("invalid" if errors else "valid")
    return 1 if errors else 0


def cmd_migrate_config(args: argparse.Namespace) -> int:
    from blueetl_spark.migrate import migrate_config

    config = _load_config(args.config)
    migrated = migrate_config(config, sort=not args.no_sort)
    out = Path(args.output)
    if args.output.endswith((".yaml", ".yml")):
        import yaml

        out.write_text(yaml.safe_dump(migrated, sort_keys=False))
    else:
        out.write_text(json.dumps(migrated, indent=2))
    print(f"migrated config written to {out}")
    return 0


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


def cmd_curate(args: argparse.Namespace) -> int:
    from blueetl_spark.plans.curate import curate_corpus
    from blueetl_spark.plans.export import export_corpus
    from blueetl_spark.session import get_spark

    config = _load_config(args.config) if args.config else {"steps": []}
    spark = get_spark(app_name="blueetl_spark.curate")
    docs = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    kept, stats = curate_corpus(
        docs, config, eval_df=eval_df, collect_stats=not args.no_stats
    )
    manifest = export_corpus(kept, args.output, n_shards=args.shards)
    print(json.dumps({"steps": stats, "export": manifest}))
    return 0


def cmd_profile(args: argparse.Namespace) -> int:
    from blueetl_spark.operators import profile as prof
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="blueetl_spark.profile")
    df = spark.read.parquet(args.input)
    cols = args.columns.split(",") if args.columns else None
    fn = prof.profile_sketch if args.sketch else prof.profile
    rows = [r.asDict() for r in fn(df, columns=cols).collect()]
    print(json.dumps({"table": args.input, "exact": not args.sketch,
                      "columns": rows}))
    return 0


def cmd_index_purge(args: argparse.Namespace) -> int:
    from blueetl_spark.operators.dedup import purge_minhash_index
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="blueetl_spark.index_purge")
    ids = spark.read.parquet(args.ids)
    n = ids.select(args.id_col).distinct().count()
    purge_minhash_index(
        ids, args.index, id_col=args.id_col,
        storage=args.storage, n_buckets=args.buckets,
    )
    print(json.dumps({"index": args.index, "purged_ids": n}))
    return 0


def cmd_index_compact(args: argparse.Namespace) -> int:
    from blueetl_spark.operators.dedup import compact_minhash_index
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="blueetl_spark.index_compact")
    counts = compact_minhash_index(
        spark, args.index, id_col=args.id_col,
        storage=args.storage, n_buckets=args.buckets,
    )
    print(json.dumps({"index": args.index, "rows": counts}))
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
    r.add_argument("--seed", type=int, default=None, help="extraction seed override")
    r.add_argument("--no-extract", action="store_true", help="skip extraction stage")
    r.add_argument("--no-calculate", action="store_true", help="skip feature stage")
    r.add_argument("--show", action="store_true", help="print each table's head")
    r.add_argument("--clear-cache", action="store_true", help="delete cache first")
    r.add_argument(
        "--readonly-cache", action="store_true",
        help="use existing cache; error on any write",
    )
    r.set_defaults(fn=cmd_run)

    v = sub.add_parser("validate-config", help="validate an analysis config")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate_config)

    m = sub.add_parser(
        "migrate-config", help="upgrade a v1/v2/v3 analysis config to v4"
    )
    m.add_argument("config")
    m.add_argument("output")
    m.add_argument("--no-sort", action="store_true", help="keep root key order")
    m.set_defaults(fn=cmd_migrate_config)

    c = sub.add_parser("convert-spikes", help="CSV spikes -> synthetic campaign")
    c.add_argument("csv")
    c.add_argument("output_dir")
    c.add_argument("--node-population", default="synthetic")
    c.set_defaults(fn=cmd_convert_spikes)

    cu = sub.add_parser(
        "curate", help="dedup/filter/scrub/sample a corpus and export shards"
    )
    cu.add_argument("input", help="input documents parquet")
    cu.add_argument("output", help="output shard directory")
    cu.add_argument("--config", default="", help="curation steps config (json/yaml)")
    cu.add_argument("--eval", default="", help="eval corpus parquet (decontaminate)")
    cu.add_argument("--shards", type=int, default=64)
    cu.add_argument("--no-stats", action="store_true", help="skip per-step counts")
    cu.set_defaults(fn=cmd_curate)

    pr = sub.add_parser(
        "profile", help="per-column stats for a parquet table (JSON line)"
    )
    pr.add_argument("input", help="parquet path")
    pr.add_argument("--columns", help="comma-separated subset (default: all atomic)")
    pr.add_argument(
        "--sketch", action="store_true",
        help="HLL cardinalities instead of exact distinct (wide/huge tables)",
    )
    pr.set_defaults(fn=cmd_profile)

    s = sub.add_parser("query", help="run one registered query")
    s.add_argument("sf_dir")
    s.add_argument("name")
    s.add_argument("--rows", type=int, default=20)
    s.set_defaults(fn=cmd_query)

    ip = sub.add_parser(
        "index-purge",
        help="tombstone ids out of an incremental MinHash/SimHash index (takedown)",
    )
    ip.add_argument("index", help="index path (parquet) or table prefix (bucketed)")
    ip.add_argument("ids", help="parquet of ids to purge")
    ip.add_argument("--id-col", default="doc_id")
    ip.add_argument("--storage", choices=["parquet", "bucketed"], default="parquet")
    ip.add_argument("--buckets", type=int, default=64)
    ip.set_defaults(fn=cmd_index_purge)

    ic = sub.add_parser(
        "index-compact",
        help="fold tombstones into an incremental MinHash/SimHash index (maintenance)",
    )
    ic.add_argument("index", help="index path (parquet) or table prefix (bucketed)")
    ic.add_argument("--id-col", default="doc_id")
    ic.add_argument("--storage", choices=["parquet", "bucketed"], default="parquet")
    ic.add_argument("--buckets", type=int, default=64)
    ic.set_defaults(fn=cmd_index_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
