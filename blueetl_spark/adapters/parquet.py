"""Parquet adapter — the distributed scale path.

Reads ``nodes.parquet`` and ``events.parquet`` from a campaign data
directory; columns pass through untouched except for optional renames to
the analysis contract. At 100 TB this is the format everything should be
in: executors scan it in parallel with predicate pushdown and column
pruning, which no single-file h5 layout offers.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blueetl_spark.adapters.base import AdapterError, BaseAdapter

#: accepted source-column aliases → contract names
_NODE_RENAMES = {"gid": "node_id"}
_EVENT_RENAMES = {"node_id": "gid", "user_id": "gid", "t": "time"}


class ParquetAdapter(BaseAdapter):
    """nodes/events from ``<data_dir>/{nodes,events}.parquet``."""

    def __init__(self, spark: SparkSession, data_dir: str | Path) -> None:
        self.spark = spark
        self.data_dir = Path(data_dir)

    def exists(self) -> bool:
        return (self.data_dir / "nodes.parquet").exists() and (
            self.data_dir / "events.parquet"
        ).exists()

    def _read(self, name: str, renames: dict[str, str]) -> DataFrame:
        path = self.data_dir / f"{name}.parquet"
        if not path.exists():
            raise AdapterError(f"missing {path}")
        df = self.spark.read.parquet(str(path))
        for old, new in renames.items():
            if old in df.columns and new not in df.columns:
                df = df.withColumnRenamed(old, new)
        return df

    def nodes(self) -> DataFrame:
        df = self._read("nodes", _NODE_RENAMES)
        if "circuit_id" not in df.columns:
            df = df.withColumn("circuit_id", F.lit(0).cast("smallint"))
        return df

    def events(self) -> DataFrame:
        df = self._read("events", _EVENT_RENAMES)
        if "simulation_id" not in df.columns:
            df = df.withColumn("simulation_id", F.lit(0).cast("smallint"))
        return df
