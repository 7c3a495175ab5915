"""Data adapters: pluggable loaders that produce the ``nodes`` / ``events``
DataFrames the analysis pipeline consumes (reference ``adapters/*`` —
circuit/simulation wrappers over bluepysnap/bluepy; here the seam is
Spark DataFrames instead of pandas objects)."""

from blueetl_spark.adapters.base import AdapterError, BaseAdapter
from blueetl_spark.adapters.parquet import ParquetAdapter
from blueetl_spark.adapters.sonata import SonataAdapter

__all__ = ["AdapterError", "BaseAdapter", "ParquetAdapter", "SonataAdapter"]
