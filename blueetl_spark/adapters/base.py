"""Adapter base: the contract between raw simulation data and the engine.

Reference design (``adapters/base.py:16-45`` + ``adapters/interfaces/*``):
an adapter wraps a backend object (bluepysnap circuit, bluepy simulation)
and exposes a narrow interface — nodes, spikes, reports — with
``exists()`` for missing inputs. Here the backend products are Spark
DataFrames in the analysis contract:

- ``nodes``:  (circuit_id smallint, node_id long, <property columns>)
- ``events``: (simulation_id smallint, gid long, time double, [value, …])

so any storage format plugs into :class:`~blueetl_spark.analysis.
MultiAnalyzer` by implementing two methods. Parquet is the scale path
(distributed scan); the SONATA h5 adapter is a driver-side ingest for
users coming from raw SONATA files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class AdapterError(Exception):
    """Adapter input missing or malformed."""


class BaseAdapter:
    """nodes()/events() provider over one campaign data source."""

    def exists(self) -> bool:
        """True when the underlying data source is present."""
        raise NotImplementedError

    def nodes(self) -> DataFrame:
        """Node table: (circuit_id, node_id, properties…)."""
        raise NotImplementedError

    def events(self) -> DataFrame:
        """Event/spike table: (simulation_id, gid, time, …)."""
        raise NotImplementedError
