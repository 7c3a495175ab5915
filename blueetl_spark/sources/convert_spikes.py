"""CSV spikes → synthetic campaign converter (S10).

Reference behavior (``/root/reference/src/blueetl/converters/
convert_spikes.py:288-344``): read a CSV of spike (timestamps, node_ids),
then write a self-contained synthetic bundle — circuit nodes, node sets,
spikes, simulation + campaign + analysis configs — so the full pipeline can
run on a bare spikes file. The reference emits SONATA h5; this engine's
sources are parquet, so the bundle is:

    <output_dir>/
    ├── circuit/nodes.parquet           one row per gid in [0, max_id]
    ├── simulation/spikes.parquet       (time, gid) events
    ├── simulation_campaign_config.json blueetl-layout campaign (1 run)
    └── analysis_config.json            minimal runnable analysis config

The CSV read and both parquet writes are distributed; only the configs and
the scalar stats are driver-side.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def convert_spikes(
    spark: SparkSession,
    input_csv: str | Path,
    output_dir: str | Path,
    node_population: str = "synthetic",
    time_col: str = "timestamps",
    gid_col: str = "node_ids",
) -> dict[str, Any]:
    """Convert a spikes CSV into a runnable synthetic campaign bundle.

    Returns the data stats dict (rows, unique ids, id/time ranges) — the
    same numbers the reference logs as ``DataStats``.
    """
    out = Path(output_dir)
    (out / "circuit").mkdir(parents=True, exist_ok=True)
    (out / "simulation").mkdir(parents=True, exist_ok=True)

    raw = spark.read.option("header", "true").option("inferSchema", "true").csv(
        str(input_csv)
    )
    if time_col not in raw.columns or gid_col not in raw.columns:
        raise ValueError(
            f"CSV must have columns {time_col!r} and {gid_col!r}; "
            f"found {raw.columns}"
        )
    spikes = raw.select(
        F.col(time_col).cast("double").alias("time"),
        F.col(gid_col).cast("bigint").alias("gid"),
    ).filter(F.col("time").isNotNull() & F.col("gid").isNotNull())

    stats_row = spikes.agg(
        F.count("*").alias("rows"),
        F.countDistinct("gid").alias("unique_ids"),
        F.min("gid").alias("min_id"),
        F.max("gid").alias("max_id"),
        F.min("time").alias("min_timestamp"),
        F.max("time").alias("max_timestamp"),
    ).first()
    if stats_row is None or stats_row.rows == 0:
        raise ValueError(f"no valid spike rows in {input_csv}")
    stats = stats_row.asDict()

    spikes.orderBy("time", "gid").write.mode("overwrite").parquet(
        str(out / "simulation" / "spikes.parquet")
    )
    # nodes 0..max_id so gids index densely, like the reference's synthetic
    # circuit of size max_id+1
    spark.range(0, int(stats["max_id"]) + 1).select(
        F.col("id").alias("node_id"),
        F.lit(node_population).alias("population"),
        F.lit(0).cast("smallint").alias("circuit_id"),
    ).write.mode("overwrite").parquet(str(out / "circuit" / "nodes.parquet"))

    t_stop = float(math.ceil(stats["max_timestamp"]))
    campaign = {
        "format": "blueetl",
        "version": 1,
        "name": "synthetic",
        "attrs": {
            "circuit_config": str(out / "circuit" / "nodes.parquet"),
            "node_population": node_population,
        },
        "data": [{"simulation_path": str(out / "simulation")}],
    }
    (out / "simulation_campaign_config.json").write_text(
        json.dumps(campaign, indent=2)
    )
    analysis = {
        "simulation_campaign": str(out / "simulation_campaign_config.json"),
        "analysis": {
            "spikes": {
                "extraction": {
                    "report": {"type": "spikes"},
                    "neuron_classes": {node_population: {"query": {}}},
                    "windows": {"full": {"bounds": [0.0, t_stop]}},
                },
                "features": [],
            }
        },
    }
    (out / "analysis_config.json").write_text(json.dumps(analysis, indent=2))
    return stats
