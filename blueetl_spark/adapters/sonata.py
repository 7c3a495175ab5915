"""SONATA h5 adapter — driver-side ingest for raw SONATA circuits/reports.

Reads the public SONATA layouts (AllenInstitute/sonata spec):

- nodes file: ``/nodes/<population>/<group>/<attribute>`` datasets (one
  column per attribute; the common single-group ``0`` layout), plus the
  per-node ``node_type_id`` dataset for the id range.
- spikes file: ``/spikes/<population>/{timestamps,node_ids}`` (current
  spec) or the legacy flat ``/spikes/{timestamps,gids}`` pair.

Scale position: h5 is a single-file format with no native parallel scan,
pushdown, or pruning. This adapter is therefore an **ingest step**:
:meth:`SonataAdapter.to_parquet` writes the analysis-contract parquet
that the distributed pipeline scans. Both tables have executor-side
chunked readers (:meth:`events_distributed` / :meth:`nodes_distributed`
— the driver opens the file for metadata only, workers range-read
slices), so multi-TB stores never serialize through the driver; the
plain :meth:`nodes`/:meth:`events` driver-side paths remain for
environments without a shared filesystem.

The h5 library is injectable (``h5=``): the default probes for ``h5py``
and raises an actionable error when absent (this runtime image has no h5
library), while tests exercise the full parsing logic with a dict-backed
fake — the same gating pattern as the multimodal codecs.

Reference parity: ``adapters/impl/bluepysnap/*`` wrap a snap circuit into
nodes/spikes interfaces; here the products are DataFrames in the analysis
contract (see ``adapters/base.py``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blueetl_spark.adapters.base import AdapterError, BaseAdapter

_MISSING_H5 = (
    "SONATA adapter requires h5py, which is not installed; either install "
    "h5py, or convert the SONATA files to parquet upstream and use "
    "ParquetAdapter (the distributed scale path)"
)


def _default_h5():
    try:
        import h5py

        return h5py
    except ImportError as exc:  # pragma: no cover - env dependent
        raise AdapterError(_MISSING_H5) from exc


def np_int64(values: Any):
    """Executor-side dataset-slice → int64 ndarray (module-level so the
    mapInPandas closure pickles by reference)."""
    import numpy as np

    return np.asarray(values).astype("int64")


def np_float64(values: Any):
    import numpy as np

    return np.asarray(values).astype("float64")


def _as_column(values: Any) -> Any:
    """h5 string datasets arrive as bytes; decode for Spark."""
    import numpy as np

    arr = np.asarray(values)
    if arr.dtype.kind in ("S", "O"):
        return [v.decode() if isinstance(v, bytes) else v for v in arr]
    return arr


class SonataAdapter(BaseAdapter):
    """nodes/events from SONATA ``nodes.h5`` + spikes ``out.h5`` files."""

    def __init__(
        self,
        spark: SparkSession,
        nodes_path: str | Path | None,
        spikes_path: str | Path | None,
        population: str | None = None,
        h5: Any = None,
    ) -> None:
        self.spark = spark
        self.nodes_path = Path(nodes_path) if nodes_path else None
        self.spikes_path = Path(spikes_path) if spikes_path else None
        self.population = population
        self._h5 = h5

    @property
    def h5(self):
        if self._h5 is None:
            self._h5 = _default_h5()
        return self._h5

    def exists(self) -> bool:
        return bool(
            self.nodes_path
            and self.nodes_path.exists()
            and self.spikes_path
            and self.spikes_path.exists()
        )

    # -- parsing --------------------------------------------------------------
    def _pick_population(self, group) -> str:
        pops = list(group.keys())
        if self.population is not None:
            if self.population not in pops:
                raise AdapterError(
                    f"population {self.population!r} not found; available: {pops}"
                )
            return self.population
        if len(pops) != 1:
            raise AdapterError(
                f"multiple populations {pops}; pass population= to choose one"
            )
        return pops[0]

    def nodes(self) -> DataFrame:
        import pandas as pd

        if self.nodes_path is None or not self.nodes_path.exists():
            raise AdapterError(f"missing nodes file {self.nodes_path}")
        with self.h5.File(str(self.nodes_path), "r") as f:
            if "nodes" not in f.keys():
                raise AdapterError(f"{self.nodes_path}: no /nodes group")
            root = f["nodes"]
            pop = self._pick_population(root)
            g = root[pop]
            n = len(_as_column(g["node_type_id"]))
            cols: dict[str, Any] = {"node_id": range(n)}
            # single-group layout: /nodes/<pop>/0/<attribute>
            if "0" in g.keys():
                grp = g["0"]
                for attr in grp.keys():
                    if attr == "@library":  # enum indirection: not supported
                        continue
                    col = _as_column(grp[attr])
                    if len(col) == n:
                        cols[attr] = col
            pdf = pd.DataFrame(cols)
        df = self.spark.createDataFrame(pdf)
        return df.withColumn("circuit_id", F.lit(0).cast("smallint"))

    def events(self) -> DataFrame:
        import pandas as pd

        if self.spikes_path is None or not self.spikes_path.exists():
            raise AdapterError(f"missing spikes file {self.spikes_path}")
        with self.h5.File(str(self.spikes_path), "r") as f:
            if "spikes" not in f.keys():
                raise AdapterError(f"{self.spikes_path}: no /spikes group")
            g = f["spikes"]
            keys = set(g.keys())
            if {"timestamps", "gids"} <= keys:  # legacy flat layout
                times, gids = g["timestamps"], g["gids"]
            elif {"timestamps", "node_ids"} <= keys:
                times, gids = g["timestamps"], g["node_ids"]
            else:  # per-population group
                pop = self._pick_population(g)
                times, gids = g[pop]["timestamps"], g[pop]["node_ids"]
            pdf = pd.DataFrame(
                {
                    "gid": _as_column(gids).astype("int64"),
                    "time": _as_column(times).astype("float64"),
                }
            )
        df = self.spark.createDataFrame(pdf)
        return df.withColumn("simulation_id", F.lit(0).cast("smallint"))

    # -- distributed ingest ---------------------------------------------------
    def events_distributed(
        self,
        chunk_rows: int = 4_000_000,
        h5_open: Any = None,
    ) -> DataFrame:
        """Spikes read on the **executors**: the driver opens the file once
        for metadata only (layout + dataset length), then ``mapInPandas``
        over a chunk-descriptor table range-reads ``[start, stop)`` slices
        worker-side. Multi-TB spike stores never serialize through the
        driver, and chunks land directly on the executors that shuffle
        them onward.

        ``h5_open`` is the file opener shipped to executors — it must be
        picklable across the worker boundary (a module-level callable
        pickles by reference; ``h5py.File`` in production,
        :class:`blueetl_spark.adapters.h5stub.File` in tests). Defaults
        to this adapter's injected ``h5`` module's ``File`` (the same
        seam :meth:`events` uses), falling back to h5py.
        Requires a shared filesystem (the cluster-HDF5 deployment model;
        reference reads the same paths via bluepysnap on one node).
        """
        import pandas as pd

        if self.spikes_path is None or not self.spikes_path.exists():
            raise AdapterError(f"missing spikes file {self.spikes_path}")
        if h5_open is None:
            h5_open = self.h5.File
        path = str(self.spikes_path)
        # driver: metadata-only probe (group path + row count, no data read)
        with h5_open(path, "r") as f:
            if "spikes" not in f.keys():
                raise AdapterError(f"{self.spikes_path}: no /spikes group")
            g = f["spikes"]
            keys = set(g.keys())
            if {"timestamps", "gids"} <= keys:  # legacy flat layout
                base, gname = "spikes", "gids"
            elif {"timestamps", "node_ids"} <= keys:
                base, gname = "spikes", "node_ids"
            else:
                pop = self._pick_population(g)
                base, gname = f"spikes/{pop}", "node_ids"
            n = len(f[f"{base}/timestamps"])
        bounds = [
            (s, min(s + chunk_rows, n)) for s in range(0, max(n, 1), chunk_rows)
        ]
        desc = self.spark.createDataFrame(
            [(path, base, gname, s, e) for s, e in bounds],
            "path string, base string, gname string, start long, stop long",
        ).repartition(len(bounds))

        def read_chunks(batches):
            for pdf in batches:
                for r in pdf.itertuples():
                    with h5_open(r.path, "r") as f:
                        yield pd.DataFrame(
                            {
                                "gid": np_int64(f[f"{r.base}/{r.gname}"][r.start:r.stop]),
                                "time": np_float64(
                                    f[f"{r.base}/timestamps"][r.start:r.stop]
                                ),
                            }
                        )

        out = desc.mapInPandas(read_chunks, schema="gid long, time double")
        return out.withColumn("simulation_id", F.lit(0).cast("smallint"))

    def nodes_distributed(
        self,
        chunk_rows: int = 4_000_000,
        h5_open: Any = None,
    ) -> DataFrame:
        """Node attributes read on the **executors** — the node-table twin
        of :meth:`events_distributed`, removing the last driver funnel on
        the ingest path.

        Driver opens the file once for metadata only: population, row
        count, attribute names, and each attribute's dtype (probed from a
        one-element slice, never the full dataset). Executors then
        range-read ``[start, stop)`` slices of every attribute;
        ``node_id`` is the implicit SONATA row index, so each chunk
        regenerates it locally as ``arange(start, stop)``.

        Same requirements as :meth:`events_distributed`: picklable
        ``h5_open`` and a shared filesystem.
        """
        import numpy as np
        import pandas as pd

        if self.nodes_path is None or not self.nodes_path.exists():
            raise AdapterError(f"missing nodes file {self.nodes_path}")
        if h5_open is None:
            h5_open = self.h5.File
        path = str(self.nodes_path)
        # driver: metadata-only probe (population, count, attrs + dtypes)
        with h5_open(path, "r") as f:
            if "nodes" not in f.keys():
                raise AdapterError(f"{self.nodes_path}: no /nodes group")
            root = f["nodes"]
            pop = self._pick_population(root)
            g = root[pop]
            n = len(g["node_type_id"])
            attrs: list[tuple[str, str]] = []  # (name, spark type)
            if "0" in g.keys():
                grp = g["0"]
                for attr in grp.keys():
                    if attr == "@library":  # enum indirection: not supported
                        continue
                    ds = grp[attr]
                    if len(ds) != n:
                        continue
                    dt = np.asarray(ds[0:1]).dtype
                    if dt.kind == "u" and dt.itemsize == 8:
                        # uint64 doesn't fit a signed long — astype would
                        # silently wrap values >= 2^63 negative; decimal(20,0)
                        # holds the full range exactly
                        spark_type = "decimal(20,0)"
                    else:
                        spark_type = {
                            "i": "long", "u": "long", "f": "double", "b": "boolean",
                        }.get(dt.kind, "string")
                    attrs.append((attr, spark_type))
        base = f"nodes/{pop}"
        bounds = [
            (s, min(s + chunk_rows, n)) for s in range(0, max(n, 1), chunk_rows)
        ]
        desc = self.spark.createDataFrame(
            [(path, s, e) for s, e in bounds],
            "path string, start long, stop long",
        ).repartition(len(bounds))
        schema = ", ".join(
            ["node_id long"] + [f"`{a}` {t}" for a, t in attrs]
        )

        def read_chunks(batches):
            for pdf in batches:
                for r in pdf.itertuples():
                    with h5_open(r.path, "r") as f:
                        cols: dict[str, Any] = {
                            "node_id": np.arange(r.start, r.stop, dtype="int64")
                        }
                        for attr, t in attrs:
                            raw = _as_column(f[f"{base}/0/{attr}"][r.start:r.stop])
                            if t == "long":
                                raw = np_int64(raw)
                            elif t == "double":
                                raw = np_float64(raw)
                            elif t == "string":
                                raw = [None if v is None else str(v) for v in raw]
                            elif t.startswith("decimal"):
                                from decimal import Decimal

                                raw = [Decimal(int(v)) for v in np.asarray(raw)]
                            cols[attr] = raw
                        yield pd.DataFrame(cols)

        out = desc.mapInPandas(read_chunks, schema=schema)
        return out.withColumn("circuit_id", F.lit(0).cast("smallint"))

    # -- ingest ---------------------------------------------------------------
    def to_parquet(
        self,
        out_dir: str | Path,
        distributed: bool = False,
        chunk_rows: int = 4_000_000,
        h5_open: Any = None,
    ) -> dict[str, int]:
        """One-time SONATA → parquet conversion into the analysis contract;
        returns row counts. The written directory is a valid
        :class:`~blueetl_spark.adapters.parquet.ParquetAdapter` source.

        ``distributed=True`` routes both tables through the executor-side
        chunked readers (requires a picklable ``h5_open`` and a shared
        filesystem); row counts ride on an Observation attached to each
        write, so nothing is scanned twice.
        """
        from pyspark.sql import Observation

        out = Path(out_dir)
        if distributed:
            frames = (
                ("nodes", self.nodes_distributed(chunk_rows, h5_open)),
                ("events", self.events_distributed(chunk_rows, h5_open)),
            )
        else:
            frames = (("nodes", self.nodes()), ("events", self.events()))
        counts = {}
        for name, df in frames:
            obs = Observation(f"ingest_{name}")
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(str(out / f"{name}.parquet"))
            counts[name] = obs.get["n"]
        return counts
