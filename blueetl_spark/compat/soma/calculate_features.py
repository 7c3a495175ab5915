"""Compat shim for ``blueetl.external.soma.calculate_features``
(reference ``/root/reference/src/blueetl/external/soma/
calculate_features.py:4-15``): per-(neuron_class, window) mean/std of a
soma report's ``value`` column, grouped by (simulation_id, circuit_id) —
the one shipped feature for frame (non-spike) reports.

``std`` is the pandas sample standard deviation (ddof=1), exactly the
reference's ``agg(["mean", "std"])``.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

OUTPUT_SCHEMAS = {
    "by_neuron_class": (
        "neuron_class string, window string, mean double, std double"
    ),
}

GROUPBY = ["simulation_id", "circuit_id"]


def calculate_features_by_simulation_circuit(
    repo, key, df: pd.DataFrame, params: dict[str, Any]
):
    """Pandas twin (reference calling convention, reference body shape)."""
    by_neuron_class = (
        df.groupby(["neuron_class", "window"], observed=True)["value"]
        .agg(["mean", "std"])
        .reset_index()
    )
    return {"by_neuron_class": by_neuron_class}


def _spark_builder(report, windows, neuron_counts, params: dict[str, Any]):
    from pyspark.sql import functions as F

    out = report.groupBy(
        "simulation_id", "circuit_id", "neuron_class", "window"
    ).agg(
        F.mean("value").alias("mean"),
        F.stddev_samp("value").alias("std"),
    )
    return {"by_neuron_class": out}


calculate_features_by_simulation_circuit.spark_builder = _spark_builder
calculate_features_by_simulation_circuit.output_schemas = OUTPUT_SCHEMAS
